"""Whole-cascade numerical parity: our Flax CascadeMVSNet vs a torch oracle.

The oracle is an independent torch implementation of the reference
architecture (written from the behavioral spec in SURVEY.md §2.1 #13 /
``network/mvs_models.py``), with attribute names chosen to match the
reference checkpoint naming so our ``export_casmvsnet_state_dict`` can load
our parameters into it directly.  This validates, with one end-to-end check:
the FPN, the homography warp, the masked variance volume, the 3D U-Net, the
cascade depth-range propagation (both interpolation modes), the softmax
depth regression, the photometric confidence, and the checkpoint-name
mapping that pretrained ``casmvsnet.ckpt`` loading relies on.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.utils.checkpoint_io import export_casmvsnet_state_dict


# ---------------------------------------------------------------- torch oracle
class _CBR(nn.Module):
    """conv + BN + relu wrapper named like the reference blocks."""

    def __init__(self, cin, cout, k=3, s=1, p=1, conv3d=False):
        super().__init__()
        conv_cls = nn.Conv3d if conv3d else nn.Conv2d
        bn_cls = nn.BatchNorm3d if conv3d else nn.BatchNorm2d
        self.conv = conv_cls(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = bn_cls(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _DCBR3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=1,
                                       output_padding=1, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _FPN(nn.Module):
    def __init__(self, bc=8):
        super().__init__()
        self.conv0 = nn.Sequential(_CBR(3, bc), _CBR(bc, bc))
        self.conv1 = nn.Sequential(_CBR(bc, 2 * bc, 5, 2, 2),
                                   _CBR(2 * bc, 2 * bc), _CBR(2 * bc, 2 * bc))
        self.conv2 = nn.Sequential(_CBR(2 * bc, 4 * bc, 5, 2, 2),
                                   _CBR(4 * bc, 4 * bc), _CBR(4 * bc, 4 * bc))
        self.out1 = nn.Conv2d(4 * bc, 4 * bc, 1, bias=False)
        self.inner1 = nn.Conv2d(2 * bc, 4 * bc, 1, bias=True)
        self.inner2 = nn.Conv2d(bc, 4 * bc, 1, bias=True)
        self.out2 = nn.Conv2d(4 * bc, 2 * bc, 3, padding=1, bias=False)
        self.out3 = nn.Conv2d(4 * bc, bc, 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        out = {"stage1": self.out1(c2)}
        intra = F.interpolate(c2, scale_factor=2,
                              mode="nearest") + self.inner1(c1)
        out["stage2"] = self.out2(intra)
        intra = F.interpolate(intra, scale_factor=2,
                              mode="nearest") + self.inner2(c0)
        out["stage3"] = self.out3(intra)
        return out


class _CostReg(nn.Module):
    def __init__(self, cin, bc=8):
        super().__init__()
        self.conv0 = _CBR(cin, bc, conv3d=True)
        self.conv1 = _CBR(bc, 2 * bc, s=2, conv3d=True)
        self.conv2 = _CBR(2 * bc, 2 * bc, conv3d=True)
        self.conv3 = _CBR(2 * bc, 4 * bc, s=2, conv3d=True)
        self.conv4 = _CBR(4 * bc, 4 * bc, conv3d=True)
        self.conv5 = _CBR(4 * bc, 8 * bc, s=2, conv3d=True)
        self.conv6 = _CBR(8 * bc, 8 * bc, conv3d=True)
        self.conv7 = _DCBR3(8 * bc, 4 * bc)
        self.conv9 = _DCBR3(4 * bc, 2 * bc)
        self.conv11 = _DCBR3(2 * bc, bc)
        self.prob = nn.Conv3d(bc, 1, 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        b = self.conv6(self.conv5(c4))
        b = c4 + self.conv7(b)
        b = c2 + self.conv9(b)
        cost = c0 + self.conv11(b)
        return cost, self.prob(cost)


def _warp_nearest(feat, proj, depth_values):
    """nearest/border/align_corners=True plane sweep (one view)."""
    B, C, H, W = feat.shape
    D = depth_values.shape[1]
    R, T = proj[:, :, :3], proj[:, :, 3:]
    ys, xs = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32),
                            indexing="ij")
    grid = torch.stack([xs, ys, torch.ones_like(xs)], dim=0).reshape(1, 3, -1)
    grid_d = grid.repeat(1, 1, D)
    src = R @ grid_d + T / depth_values.reshape(B, 1, -1)
    g = src[:, :2] / src[:, 2:]
    gx = g[:, 0] / ((W - 1) / 2) - 1
    gy = g[:, 1] / ((H - 1) / 2) - 1
    gg = torch.stack([gx, gy], dim=-1).view(B, D, H * W, 2)
    warped = F.grid_sample(feat, gg, mode="nearest", padding_mode="border",
                           align_corners=True).view(B, C, D, H, W)
    mask = ((gg > -1) & (gg < 1)).all(-1).float().view(B, 1, D, H, W)
    return warped, mask


class _OracleCascade(nn.Module):
    def __init__(self):
        super().__init__()
        self.feature = _FPN(8)
        self.cost_regularization = nn.ModuleList(
            [_CostReg(c, 8) for c in (32, 16, 8)])

    def forward(self, imgs, affine, affine_inv, near, far):
        V1, _, H, W = imgs.shape
        feats = [self.feature(imgs[v:v + 1]) for v in range(V1)]
        D0 = 48
        t = torch.linspace(0, 1, D0)
        dv_init = (near * (1 - t) + far * t)[None]
        interval = (far - near) / D0
        out = {}
        depth = None
        for si, (nd, ratio) in enumerate(zip((48, 32, 8), (4, 2, 1))):
            scale = 2 ** (2 - si)
            h, w = H // scale, W // scale
            if depth is None:
                drs = dv_init[:, :, None, None].expand(1, D0, H, W)
            else:
                cur = F.interpolate(depth.detach()[:, None], (H, W),
                                    mode="bilinear",
                                    align_corners=False)[:, 0]
                dmin = (cur - nd / 2 * ratio * interval).clamp(min=near)
                dmax = (cur + nd / 2 * ratio * interval).clamp(max=far)
                step = (dmax - dmin) / (nd - 1)
                drs = dmin[:, None] + torch.arange(nd).view(1, -1, 1, 1) \
                    * step[:, None]
            dv = F.interpolate(drs[:, None], (nd, h, w), mode="trilinear",
                               align_corners=False)[:, 0]
            proj_ref_inv = affine_inv[0:1, si]
            vsum, vsq = 0.0, 0.0
            msum = torch.ones(1, 1, nd, h, w)
            for v in range(V1):
                proj = (affine[v + 1:v + 2, si] @ proj_ref_inv)[:, :3]
                wf, m = _warp_nearest(feats[v][f"stage{si + 1}"], proj, dv)
                vsum = vsum + wf
                vsq = vsq + wf * wf
                msum = msum + m
            count = 1.0 / msum
            var = vsq * count - (vsum * count) ** 2
            cost, prob_logits = self.cost_regularization[si](var)
            prob = F.softmax(prob_logits.squeeze(1), dim=1)
            depth = (prob * dv).sum(1)
            sum4 = 4 * F.avg_pool3d(F.pad(prob[:, None], (0, 0, 0, 0, 1, 2)),
                                    (4, 1, 1), stride=1).squeeze(1)
            didx = (prob * torch.arange(nd, dtype=torch.float32)
                    .view(1, -1, 1, 1)).sum(1).long().clamp(0, nd - 1)
            conf = torch.gather(sum4, 1, didx[:, None]).squeeze(1).clamp(0, 1)
            out[f"stage{si + 1}"] = dict(depth=depth[0], conf=conf[0],
                                         cost=cost[0], dv=dv[0], prob=prob[0])
        return out


@pytest.mark.parametrize("seed", [0])
def test_cascade_matches_torch_oracle(seed):
    cfg = Config(view_num=4, mvs_dtype="float32")
    H, W = 32, 64
    key = jax.random.PRNGKey(seed)
    _, mvs = create_models(cfg)
    params = init_params(cfg, key, (H, W))

    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((3, H, W, 3)).astype(np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    affs, affs_inv = [], []
    for v in range(4):
        per, per_i = [], []
        th = 0.03 * v
        Rm = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = Rm
        w2c[0, 3] = 0.05 * v
        for s in range(3):
            Ks = K.copy()
            Ks[:2] /= 2 ** (2 - s)
            m = np.eye(4, dtype=np.float32)
            m[:3] = Ks @ w2c[:3]
            per.append(m)
            per_i.append(np.linalg.inv(m))
        affs.append(per)
        affs_inv.append(per_i)
    affine = np.stack(affs)
    affine_inv = np.stack(affs_inv)
    near, far = 0.8, 2.5

    ours = mvs.apply({"params": params["mvs"]}, jnp.asarray(imgs),
                     jnp.asarray(affine), jnp.asarray(affine_inv), near, far)

    oracle = _OracleCascade()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_casmvsnet_state_dict(params["mvs"]).items()}
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches" in m or "running_" in m for m in missing), \
        missing
    oracle.train()
    with torch.no_grad():
        ref = oracle(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                     torch.from_numpy(affine), torch.from_numpy(affine_inv),
                     near, far)

    for k in (1, 2, 3):
        d_ours = np.asarray(ours[f"stage{k}"]["depth"])
        d_ref = ref[f"stage{k}"]["depth"].numpy()
        np.testing.assert_allclose(d_ours, d_ref, rtol=5e-3, atol=2e-3,
                                   err_msg=f"stage{k} depth")
        c_ours = np.asarray(ours[f"stage{k}"]["photometric_confidence"])
        c_ref = ref[f"stage{k}"]["conf"].numpy()
        assert np.abs(c_ours - c_ref).mean() < 2e-3, f"stage{k} confidence"
        v_ours = np.asarray(ours[f"stage{k}"]["volume_feature"])
        v_ref = ref[f"stage{k}"]["cost"].numpy().transpose(1, 2, 3, 0)
        np.testing.assert_allclose(v_ours, v_ref, rtol=1e-2, atol=5e-3,
                                   err_msg=f"stage{k} cost volume")
        dv_ours = np.asarray(ours[f"stage{k}"]["depth_values"])
        np.testing.assert_allclose(dv_ours,
                                   ref[f"stage{k}"]["dv"].numpy(),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"stage{k} depth_values")
