"""Grid sampling with exact torch ``F.grid_sample`` semantics, in pure JAX.

The reference leans on ``F.grid_sample`` in three hot spots:
- plane-sweep homography warp, nearest + border + align_corners=True
  (reference ``utils/utils.py:1163-1167``),
- cost-volume trilinear gather, bilinear + border + align_corners=False
  (reference ``utils/utils.py:859-890``),
- source-view color/feature reprojection, bilinear + border +
  align_corners=True (reference ``utils/utils.py:776-789``).

These are implemented as flat gathers over the last axis so XLA lowers them to
single fused gathers; the channel axis rides along contiguously (TPU lane
friendly).  All functions are channel-last: images ``[H, W, C]``, volumes
``[D, H, W, C]``, grids ``[..., 2]`` / ``[..., 3]`` holding (x, y) / (x, y, z)
in [-1, 1] like torch.  Batch via ``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1,1] -> pixel index space (torch GridSampler.h semantics)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _border_clamp(ix, size: int):
    return jnp.clip(ix, 0.0, size - 1)


def _gather_2d(img, iy, ix):
    """img [H,W,C]; iy/ix int arrays [...]; returns [..., C]."""
    H, W = img.shape[:2]
    flat = img.reshape(H * W, -1)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def grid_sample_2d(img, grid, mode: str = "bilinear",
                   padding_mode: str = "border", align_corners: bool = False):
    """Sample ``img [H,W,C]`` at ``grid [...,2]`` of (x,y) in [-1,1].

    Returns ``[..., C]``.  Matches torch ``F.grid_sample`` bit-for-bit on the
    (mode, padding_mode, align_corners) combinations the reference uses.
    """
    H, W = img.shape[:2]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        # torch uses std::nearbyint (round half to even) == jnp.round
        ix = jnp.round(x)
        iy = jnp.round(y)
        if padding_mode == "border":
            ix = _border_clamp(ix, W)
            iy = _border_clamp(iy, H)
            return _gather_2d(img, iy.astype(jnp.int32), ix.astype(jnp.int32))
        # zeros padding
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        out = _gather_2d(img, iyc, ixc)
        return jnp.where(valid[..., None], out, 0.0)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode}")

    if padding_mode == "border":
        x = _border_clamp(x, W)
        y = _border_clamp(y, H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "border":
        x0c = jnp.clip(x0i, 0, W - 1)
        x1c = jnp.clip(x1i, 0, W - 1)
        y0c = jnp.clip(y0i, 0, H - 1)
        y1c = jnp.clip(y1i, 0, H - 1)
        v00 = _gather_2d(img, y0c, x0c)
        v01 = _gather_2d(img, y0c, x1c)
        v10 = _gather_2d(img, y1c, x0c)
        v11 = _gather_2d(img, y1c, x1c)
    else:  # zeros
        def masked(iy, ix):
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            v = _gather_2d(img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))
            return jnp.where(valid[..., None], v, 0.0)
        v00 = masked(y0i, x0i)
        v01 = masked(y0i, x1i)
        v10 = masked(y1i, x0i)
        v11 = masked(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_3d(vol, grid, mode: str = "bilinear",
                   padding_mode: str = "border", align_corners: bool = False):
    """Sample ``vol [D,H,W,C]`` at ``grid [...,3]`` of (x,y,z) in [-1,1].

    x indexes W, y indexes H, z indexes D (torch convention).  Returns
    ``[..., C]``.  Only the (bilinear, border) path the reference exercises
    (``utils/utils.py:859-890``) plus zeros padding are implemented.
    """
    D, H, W = vol.shape[:3]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode}")

    if padding_mode == "border":
        x = _border_clamp(x, W)
        y = _border_clamp(y, H)
        z = _border_clamp(z, D)

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    flat = vol.reshape(D * H * W, -1)

    def gather(zi, yi, xi):
        if padding_mode == "border":
            zi = jnp.clip(zi, 0, D - 1)
            yi = jnp.clip(yi, 0, H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            return jnp.take(flat, (zi * H + yi) * W + xi, axis=0)
        valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                 & (zi >= 0) & (zi <= D - 1))
        zi = jnp.clip(zi, 0, D - 1)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        v = jnp.take(flat, (zi * H + yi) * W + xi, axis=0)
        return jnp.where(valid[..., None], v, 0.0)

    v000 = gather(z0i, y0i, x0i)
    v001 = gather(z0i, y0i, x0i + 1)
    v010 = gather(z0i, y0i + 1, x0i)
    v011 = gather(z0i, y0i + 1, x0i + 1)
    v100 = gather(z0i + 1, y0i, x0i)
    v101 = gather(z0i + 1, y0i, x0i + 1)
    v110 = gather(z0i + 1, y0i + 1, x0i)
    v111 = gather(z0i + 1, y0i + 1, x0i + 1)

    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
