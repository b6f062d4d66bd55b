"""Fused UC-NeRF MLP as a Pallas TPU kernel.

The dual-head MLP (``models/nerf.py``) is a chain of [*, 128]-wide matmuls.
Under plain XLA every layer's activation round-trips HBM (~380 MB per layer
at eval batch sizes), which costs ~10x the matmul FLOP time.  This kernel
keeps the whole chain — positional encodings, bias-multiply trunk, both
heads, and the uncertainty blend — in VMEM per tile of points, with all
weights resident (≈300 KB bf16).

Matches ``UCNeRFMLP`` numerically at bf16 matmul precision (same compute
dtype as the XLA path).  Used for the forward pass; training wraps it in a
``jax.custom_vjp`` whose backward re-runs the pure-JAX formulation (exact
same math) under XLA autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# Weight packing order (must match models/nerf.py BaseAdaptRenderer)
_LAYER_NAMES = ["pts_bias_depth_fine", "pts_bias_confidence",
                "pts_linears_0", "pts_linears_1", "pts_linears_2",
                "pts_linears_3", "pts_linears_4", "pts_linears_5",
                "confi_rgb_linear", "alpha_linear_1", "feature_linear",
                "views_linears_0", "rgb_linear", "view_confi_linears_0",
                "alpha_linear"]


def pack_mlp_weights(params, dtype=jnp.bfloat16):
    """Full params tree (or its 'nerf' subtree) -> flat (kernels..., biases...)
    arrays list in kernel order."""
    p = params
    while "nerf" in p and "pts_linears_0" not in p:
        p = p["nerf"]
    ws, bs = [], []
    for name in _LAYER_NAMES:
        d = p[name]["Dense_0"]
        ws.append(jnp.asarray(d["kernel"], dtype))
        bs.append(jnp.asarray(d["bias"], jnp.float32))
    return ws + bs


def _pe(x, multires: int):
    """Frequency encoding, freq-major blocks (matches ops/pe.py)."""
    outs = [x]
    for fn in (jnp.sin, jnp.cos):
        for k in range(multires):
            outs.append(fn(x * (2.0 ** k)))
    return jnp.concatenate(outs, axis=-1)


def _mlp_kernel(pts_ref, dirs_ref, feats_ref, *wb_refs,
                multires: int, multires_views: int, view_num: int,
                depth: int, skips: Tuple[int, ...]):
    out_ref = wb_refs[-1]
    n_layers = len(_LAYER_NAMES)
    ws = [wb_refs[i][:] for i in range(n_layers)]
    bs = [wb_refs[n_layers + i][:] for i in range(n_layers)]
    (w_db, w_fb, *w_pts), (b_db, b_fb, *b_pts) = ws[:8], bs[:8]
    w_crgb, w_a1, w_feat, w_v0, w_rgb, w_vc0, w_al = ws[8:]
    b_crgb, b_a1, b_feat, b_v0, b_rgb, b_vc0, b_al = bs[8:]

    cdt = w_db.dtype
    v1 = view_num - 1
    feats = feats_ref[:]
    pe_pts = _pe(pts_ref[:], multires).astype(cdt)
    pe_dirs = _pe(dirs_ref[:], multires_views).astype(cdt)

    mvs_colors = feats[:, :24 + 4 * v1].astype(cdt)
    img_feats = feats[:, 24 + 4 * v1:24 + 12 * v1].astype(cdt)
    u = (1.0 - feats[:, -1:])

    def dense(x, w, b):
        return (jnp.dot(x, w, preferred_element_type=jnp.float32)
                + b).astype(cdt)

    depth_bias = dense(mvs_colors, w_db, b_db)
    feats_bias = dense(img_feats, w_fb, b_fb)

    h = pe_pts
    for i in range(depth):
        h = jnp.maximum(dense(h, w_pts[i], b_pts[i]) * depth_bias, 0.0)
        if i in skips:
            h = jnp.concatenate([pe_pts, h], axis=-1)

    base_rgb = dense(h, w_crgb, b_crgb).astype(jnp.float32)
    base_a = dense(h, w_a1, b_a1).astype(jnp.float32)

    feature = dense(h * feats_bias, w_feat, b_feat)
    h1 = jnp.concatenate([feature, pe_dirs], axis=-1)
    adapt_rgb = dense(jnp.maximum(dense(h1, w_v0, b_v0), 0.0),
                      w_rgb, b_rgb).astype(jnp.float32)
    adapt_a = dense(jnp.maximum(dense(h1, w_vc0, b_vc0), 0.0),
                    w_al, b_al).astype(jnp.float32)

    u32 = u.astype(jnp.float32)
    rgb = jax.nn.sigmoid(base_rgb * (1.0 - u32) + adapt_rgb * u32)
    alpha = jnp.maximum(adapt_a * (1.0 - u32) + base_a * u32, 0.0)
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)


def fused_nerf_mlp(pts, dirs, feats, packed_weights, *, multires: int = 10,
                   multires_views: int = 4, view_num: int = 7,
                   depth: int = 6, skips: Tuple[int, ...] = (4,),
                   tile: int = 512, interpret: bool = False):
    """pts [N, S, 3], dirs [N, 3], feats [N, S, F] -> raw [N, S, 4].

    Drop-in for ``UCNeRFMLP.apply`` given ``pack_mlp_weights(params)``.
    """
    N, S = pts.shape[:2]
    P = N * S
    pts_f = pts.reshape(P, 3)
    dirs_f = jnp.broadcast_to(dirs[:, None, :], (N, S, 3)).reshape(P, 3)
    feats_f = feats.reshape(P, -1)

    P_pad = (P + tile - 1) // tile * tile
    if P_pad != P:
        pad = ((0, P_pad - P), (0, 0))
        pts_f = jnp.pad(pts_f, pad)
        dirs_f = jnp.pad(dirs_f, pad)
        feats_f = jnp.pad(feats_f, pad)

    n_w = len(_LAYER_NAMES)
    kernel = functools.partial(
        _mlp_kernel, multires=multires, multires_views=multires_views,
        view_num=view_num, depth=depth, skips=tuple(skips))

    grid = (P_pad // tile,)
    point_spec = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_w)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P_pad, 4), jnp.float32),
        grid=grid,
        in_specs=[point_spec(3), point_spec(3),
                  point_spec(feats_f.shape[-1])] + w_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts_f, dirs_f, feats_f, *packed_weights)
    return out[:P].reshape(N, S, 4)
