"""NeRF MLP numerical parity vs a torch oracle loaded through the
``ucnerf.tar`` export naming — validates the pretrained-checkpoint path
end-to-end (PE layout, feature slicing, bias-multiply trunk, both heads,
uncertainty blend)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.utils.checkpoint_io import export_nerf_state_dict


class _OracleMLP(nn.Module):
    """Independent torch implementation of the dual-head MLP (spec:
    SURVEY.md §2.1 #11), attribute names matching the reference state dict."""

    def __init__(self, v1: int, W: int = 128, D: int = 6):
        super().__init__()
        self.v1, self.D = v1, D
        self.pts_linears = nn.ModuleList(
            [nn.Linear(63, W)] + [nn.Linear(W, W) for _ in range(3)]
            + [nn.Linear(W, W), nn.Linear(W + 63, W)])
        self.pts_bias_depth_fine = nn.Linear(24 + 4 * v1, W)
        self.pts_bias_confidence = nn.Linear(8 * v1, W)
        self.views_linears = nn.ModuleList([nn.Linear(27 + W, W // 2)])
        self.view_confi_linears = nn.ModuleList([nn.Linear(27 + W, W // 2)])
        self.feature_linear = nn.Linear(W, W)
        self.alpha_linear = nn.Linear(W // 2, 1)
        self.alpha_linear_1 = nn.Linear(W, 1)
        self.rgb_linear = nn.Linear(W // 2, 3)
        self.confi_rgb_linear = nn.Linear(W, 3)

    def forward(self, pe_pts, feats, pe_dirs):
        v1 = self.v1
        mvs_colors = feats[..., :24 + 4 * v1]
        img_feats = feats[..., 24 + 4 * v1:24 + 12 * v1]
        u = 1.0 - feats[..., -1:]
        depth_bias = self.pts_bias_depth_fine(mvs_colors)
        feats_bias = self.pts_bias_confidence(img_feats)
        h = pe_pts
        for i, lin in enumerate(self.pts_linears):
            h = torch.relu(lin(h) * depth_bias)
            if i == 4:
                h = torch.cat([pe_pts, h], dim=-1)
        base_rgb = self.confi_rgb_linear(h)
        base_a = self.alpha_linear_1(h)
        f = self.feature_linear(h * feats_bias)
        h1 = torch.cat([f, pe_dirs], dim=-1)
        adapt_rgb = self.rgb_linear(torch.relu(self.views_linears[0](h1)))
        adapt_a = self.alpha_linear(torch.relu(self.view_confi_linears[0](h1)))
        rgb = torch.sigmoid(base_rgb * (1 - u) + adapt_rgb * u)
        alpha = torch.relu(adapt_a * (1 - u) + base_a * u)
        return torch.cat([rgb, alpha], dim=-1)


def _pe_np(x, K):
    freqs = (2.0 ** np.arange(K)).astype(np.float32)
    scaled = (x[..., None, :] * freqs[:, None]).reshape(*x.shape[:-1], -1)
    return np.concatenate([x, np.sin(scaled), np.cos(scaled)],
                          axis=-1).astype(np.float32)


def test_nerf_mlp_matches_torch_oracle():
    cfg = Config(view_num=5, nerf_dtype="float32")
    nerf, _ = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (32, 64))

    rng = np.random.default_rng(3)
    N, S = 17, 9
    pts = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    dirs = rng.standard_normal((N, 3)).astype(np.float32)
    feats = rng.standard_normal((N, S, cfg.feat_dim)).astype(np.float32)
    feats[..., -1] = rng.uniform(0, 1, (N, S))

    ours = np.asarray(nerf.apply({"params": params["nerf"]},
                                 jnp.asarray(pts), jnp.asarray(dirs),
                                 jnp.asarray(feats)))

    oracle = _OracleMLP(v1=cfg.view_num - 1)
    sd = {k.replace("nerf.", ""): torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_nerf_state_dict(params["nerf"]).items()}
    missing, unexpected = oracle.load_state_dict(sd, strict=True), None
    pe_pts = torch.from_numpy(_pe_np(pts, 10))
    pe_dirs = torch.from_numpy(
        np.broadcast_to(_pe_np(dirs, 4)[:, None, :], (N, S, 27)).copy())
    with torch.no_grad():
        ref = oracle(pe_pts, torch.from_numpy(feats), pe_dirs).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
