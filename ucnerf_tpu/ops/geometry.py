"""Geometry helpers (reference component #24, ``utils/common.py``).

so(3)/SE(3) exponential maps (``Exp``/``make_c2w`` ``utils/common.py:290-310``
with the Taylor-series coefficients at ``:467-490``), pixel<->world
transforms (``transform_to_world:112-160``, ``project_to_cam:436-457``,
``reprojection:405-435``).  Pure jnp; differentiable (usable for pose
refinement, a latent capability of the reference).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1)], axis=-2)


def _taylor_A(x, eps=1e-8):   # sin(x)/x
    return jnp.where(jnp.abs(x) < eps, 1.0 - x * x / 6.0,
                     jnp.sin(x) / jnp.where(jnp.abs(x) < eps, 1.0, x))


def _taylor_B(x, eps=1e-8):   # (1-cos(x))/x^2
    x2 = x * x
    return jnp.where(jnp.abs(x) < eps, 0.5 - x2 / 24.0,
                     (1.0 - jnp.cos(x)) / jnp.where(jnp.abs(x) < eps, 1.0,
                                                    x2))


def _taylor_C(x, eps=1e-8):   # (x-sin(x))/x^3
    x2 = x * x
    return jnp.where(jnp.abs(x) < eps, 1.0 / 6.0 - x2 / 120.0,
                     (x - jnp.sin(x)) / jnp.where(jnp.abs(x) < eps, 1.0,
                                                  x2 * x))


def so3_exp(w):
    """so(3) exponential: [..., 3] -> [..., 3, 3] (Rodrigues)."""
    theta = jnp.linalg.norm(w, axis=-1)
    W = skew(w)
    W2 = W @ W
    A = _taylor_A(theta)[..., None, None]
    B = _taylor_B(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def se3_exp(wu):
    """se(3) exponential: [..., 6] (w, u) -> [..., 3, 4] c2w
    (reference ``make_c2w``, ``utils/common.py:301-310``)."""
    w, u = wu[..., :3], wu[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    W = skew(w)
    W2 = W @ W
    A = _taylor_A(theta)[..., None, None]
    B = _taylor_B(theta)[..., None, None]
    C = _taylor_C(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=wu.dtype), W.shape)
    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    t = (V @ u[..., None])[..., 0]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def transform_to_world(pixels, depth, intrinsic, c2w):
    """Pixel coords [..., 2] + depth [...] -> world points [..., 3]
    (reference ``transform_to_world``, ``utils/common.py:112-160``)."""
    ones = jnp.ones_like(pixels[..., :1])
    pix_h = jnp.concatenate([pixels, ones], axis=-1)
    cam = (pix_h @ jnp.linalg.inv(intrinsic).T) * depth[..., None]
    return cam @ c2w[:3, :3].T + c2w[:3, 3]


def project_to_cam(points, intrinsic, w2c):
    """World points [..., 3] -> (pixel [..., 2], z [...])
    (reference ``project_to_cam``, ``utils/common.py:436-457``)."""
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    pix = cam @ intrinsic.T
    return pix[..., :2] / jnp.maximum(pix[..., 2:], 1e-8), cam[..., 2]


def reproject(pixels, depth, intrinsic, c2w_src, w2c_dst):
    """Lift pixels in src view and project into dst view
    (reference ``reprojection``, ``utils/common.py:405-435``)."""
    world = transform_to_world(pixels, depth, intrinsic, c2w_src)
    return project_to_cam(world, intrinsic, w2c_dst)
