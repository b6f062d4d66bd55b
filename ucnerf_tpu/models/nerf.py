"""The conditional dual-head (base/adaptive) uncertainty-blended NeRF MLP.

Behavioral port of reference ``BaseAdapt_Renderer``
(``network/models.py:74-184``), feature split per ``:138-151``:

  input x = [pe(pts) 63 | feats 97 | pe(dirs) 27]       (V=7 operating point)
  feats  = [mvs 24 | warped colors 4*(V-1) | img feats 8*(V-1) | confidence 1]

  depth_bias = Linear(24+4(V-1) -> W)([mvs, colors])      (:89,150)
  feats_bias = Linear(8(V-1) -> W)(img_feats)             (:91,151)
  uncertainty u = 1 - confidence                          (:149)

  trunk: h = relu(linear_i(h) * depth_bias); skip-concat pts after layer 4
                                                          (:153-157)
  base heads (trunk):   base_rgb = Linear(W->3)(h); base_a = Linear(W->1)(h)
  adaptive branch:      f = Linear(W->W)(h * feats_bias); h1 = [f, pe(dirs)]
                        adapt_rgb = Linear(W/2->3)(relu(Linear(h1)))
                        adapt_a   = Linear(W/2->1)(relu(Linear(h1)))
  uncertainty-aware blend (note the deliberate asymmetry, :177-178):
        rgb   = sigmoid(base_rgb*(1-u) + adapt_rgb*u)
        alpha = relu  (adapt_a  *(1-u) + base_a  *u)

Init parity: ``weights_init`` (kaiming-normal W, zero b) is applied to every
layer except ``pts_bias_confidence`` and ``alpha_linear_1``, which keep torch
defaults (reference ``:107-118`` — an upstream oversight we reproduce so
from-scratch training matches).  The reference's dead ``forward_alpha``
(crashes on missing ``self.pts_bias``, ``:127``) is not ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ucnerf_tpu.models.layers import TorchDense
from ucnerf_tpu.ops.pe import positional_encoding, pe_dim


class BaseAdaptRenderer(nn.Module):
    depth: int = 6            # D
    width: int = 128          # W
    in_ch_pts: int = 63
    in_ch_views: int = 27
    view_num: int = 7         # V (source views = V - 1)
    skips: tuple = (4,)
    dtype: object = None      # matmul compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, pts, feats, views):
        """pts [...,63], feats [...,feat_dim], views [...,27] -> [...,4]."""
        v1 = self.view_num - 1
        mvs = feats[..., :24]
        colors = feats[..., 24:24 + 4 * v1]
        img_feats = feats[..., 24 + 4 * v1:24 + 12 * v1]
        uncertainty = 1.0 - feats[..., -1:]

        depth_bias = TorchDense(self.width, dtype=self.dtype, name="pts_bias_depth_fine")(
            jnp.concatenate([mvs, colors], axis=-1))
        feats_bias = TorchDense(self.width, kaiming=False, dtype=self.dtype,
                                name="pts_bias_confidence")(img_feats)

        h = pts
        for i in range(self.depth):
            h = TorchDense(self.width, dtype=self.dtype, name=f"pts_linears_{i}")(h) * depth_bias
            h = jax.nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)

        base_rgb = TorchDense(3, dtype=self.dtype, name="confi_rgb_linear")(h)
        base_alpha = TorchDense(1, kaiming=False, dtype=self.dtype, name="alpha_linear_1")(h)

        feature = TorchDense(self.width, dtype=self.dtype, name="feature_linear")(h * feats_bias)
        h1 = jnp.concatenate([feature, views], axis=-1)
        adapt_rgb = TorchDense(3, dtype=self.dtype, name="rgb_linear")(
            jax.nn.relu(TorchDense(self.width // 2, dtype=self.dtype, name="views_linears_0")(h1)))
        adapt_alpha = TorchDense(1, dtype=self.dtype, name="alpha_linear")(
            jax.nn.relu(TorchDense(self.width // 2, dtype=self.dtype,
                                   name="view_confi_linears_0")(h1)))

        rgb = jax.nn.sigmoid((base_rgb * (1.0 - uncertainty)
                              + adapt_rgb * uncertainty)
                             .astype(jnp.float32))
        alpha = jax.nn.relu((adapt_alpha * (1.0 - uncertainty)
                             + base_alpha * uncertainty)
                            .astype(jnp.float32))
        return jnp.concatenate([rgb, alpha], axis=-1)


class UCNeRFMLP(nn.Module):
    """Wrapper applying positional encodings then the dual-head MLP
    (reference ``UCNeRF`` ``network/models.py:187-207`` +
    ``run_network_mvs`` ``network/renderer.py:78-106``).

    The reference's python ``netchunk`` loop (``renderer.py:57-75``) is a GPU
    memory valve; under XLA the full batch is one fused matmul chain, so no
    chunking exists here.
    """
    depth: int = 6
    width: int = 128
    multires: int = 10
    multires_views: int = 4
    view_num: int = 7
    skips: tuple = (4,)
    dtype: object = None

    @nn.compact
    def __call__(self, pts, viewdirs, feats):
        """pts [N, S, 3] (NDC), viewdirs [N, 3], feats [N, S, feat_dim]."""
        pe_pts = positional_encoding(pts, self.multires)
        pe_dirs = positional_encoding(viewdirs, self.multires_views)
        pe_dirs = jnp.broadcast_to(pe_dirs[:, None, :],
                                   (*pts.shape[:2], pe_dirs.shape[-1]))
        return BaseAdaptRenderer(
            depth=self.depth, width=self.width,
            in_ch_pts=pe_dim(self.multires),
            in_ch_views=pe_dim(self.multires_views),
            view_num=self.view_num, skips=self.skips, dtype=self.dtype,
            name="nerf")(pe_pts, feats, pe_dirs)

    @staticmethod
    def forward_uncertainty(confidence):
        """confidence -> uncertainty (reference ``network/models.py:202-203``)."""
        return 1.0 - confidence
