"""Resize ops matching torch ``F.interpolate`` semantics (align_corners=False).

The reference resizes in four places, all align_corners=False
(``Align_Corners_Range = False``, reference ``network/mvs_models.py:583``):
- FPN lateral upsample, nearest x2           (``mvs_models.py:397,401``)
- source images to stage resolution, bilinear (``mvs_models.py:600``)
- previous-stage depth to full res, bilinear  (``mvs_models.py:720-722``)
- depth-range volume to stage res, trilinear  (``mvs_models.py:741-746``)

Implemented as explicit separable gathers so the coordinate rule matches
torch exactly: ``src = max(0, scale * (dst + 0.5) - 0.5)``, lerp between
``floor(src)`` and ``min(floor(src)+1, in-1)``.  (torch legacy 'nearest' uses
``src = floor(dst * in / out)``.)

Channel-last layout; leading batch dims via vmap or broadcasting.
"""

from __future__ import annotations

import jax.numpy as jnp


def _linear_weights(in_size: int, out_size: int):
    """Return (idx0, idx1, w1) for one axis, torch align_corners=False rule."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = jnp.maximum(0.0, scale * (dst + 0.5) - 0.5)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _resize_axis_linear(x, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = _linear_weights(in_size, out_size)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    return a * (1.0 - w1) + b * w1


def resize_bilinear(x, out_hw, h_axis: int = -3, w_axis: int = -2):
    """Bilinear resize of ``x [..., H, W, C]`` to ``out_hw=(H', W')``."""
    nd = x.ndim
    h_axis %= nd
    w_axis %= nd
    x = _resize_axis_linear(x, h_axis, out_hw[0])
    x = _resize_axis_linear(x, w_axis, out_hw[1])
    return x


def resize_trilinear(x, out_dhw):
    """Trilinear resize of ``x [..., D, H, W, C]`` to ``out_dhw=(D',H',W')``."""
    nd = x.ndim
    x = _resize_axis_linear(x, nd - 4, out_dhw[0])
    x = _resize_axis_linear(x, nd - 3, out_dhw[1])
    x = _resize_axis_linear(x, nd - 2, out_dhw[2])
    return x


def resize_nearest(x, out_hw, h_axis: int = -3, w_axis: int = -2):
    """torch legacy-'nearest' resize: ``src = floor(dst * in / out)``."""
    nd = x.ndim
    h_axis %= nd
    w_axis %= nd
    for axis, out_size in ((h_axis, out_hw[0]), (w_axis, out_hw[1])):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size))
        idx = jnp.minimum(idx.astype(jnp.int32), in_size - 1)
        x = jnp.take(x, idx, axis=axis)
    return x


def _cubic_weight_matrix(in_size: int, out_size: int, a: float = -0.75):
    """Dense [out, in] resampling matrix for Keys cubic convolution.

    a=-0.75 is the kernel both torch ``interpolate(mode='bicubic',
    align_corners=False)`` and cv2 ``INTER_CUBIC`` use (jax.image.resize's
    'cubic' uses a=-0.5 — different pixels).  Half-pixel source rule,
    edge-replicated taps.  Built in numpy at trace time: static shapes, and
    the resize itself becomes one matmul per axis (MXU) instead of gathers.
    """
    import numpy as np
    scale = in_size / out_size
    src = scale * (np.arange(out_size, dtype=np.float64) + 0.5) - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    W = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    for k in range(-1, 3):
        x = np.abs(t - k)
        w = np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2, a * (x ** 3 - 5 * x ** 2 + 8 * x - 4), 0.0))
        np.add.at(W, (rows, np.clip(i0 + k, 0, in_size - 1)), w)
    return W


def _resize_axis_cubic(x, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    W = jnp.asarray(_cubic_weight_matrix(in_size, out_size))
    x = jnp.moveaxis(x, axis, -1)
    x = x @ W.T
    return jnp.moveaxis(x, -1, axis)


def resize_bicubic(x, out_hw, h_axis: int = -3, w_axis: int = -2):
    """Bicubic (a=-0.75) resize matching torch bicubic / cv2 INTER_CUBIC
    (align_corners=False, no antialias).  Default axes fit ``[..., H, W, C]``;
    pass ``h_axis=-2, w_axis=-1`` for ``[..., H, W]`` maps."""
    nd = x.ndim
    x = _resize_axis_cubic(x, h_axis % nd, out_hw[0])
    x = _resize_axis_cubic(x, w_axis % nd, out_hw[1])
    return x


def upsample2x_nearest(x, h_axis: int = -3, w_axis: int = -2):
    """Nearest x2 upsample == repeat-2 along H and W (torch scale_factor=2)."""
    nd = x.ndim
    x = jnp.repeat(x, 2, axis=h_axis % nd)
    x = jnp.repeat(x, 2, axis=w_axis % nd)
    return x
