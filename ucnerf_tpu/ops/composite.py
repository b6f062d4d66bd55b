"""Alpha compositing (volume integration).

Behavioral spec from reference ``network/renderer.py``:
- ``depth2dist`` (:6-15): dists = diff(z) with a 1e10 tail, scaled by cos.
- ``raw2alpha`` (:25-36): **alpha = 1 - exp(-sigma)** — the ``dists`` argument
  is deliberately ignored by opacity (a reference quirk we keep for parity,
  made explicit here).  Transmittance T = cumprod([1, 1-alpha+1e-10])[:-1].
- ``raw2outputs`` (:109-140): rgb_map = sum(w * rgb), depth_map = sum(w * z),
  optional white background.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth2dist(z_vals, cos_angle):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    tail = jnp.full_like(dists[..., :1], 1e10)
    dists = jnp.concatenate([dists, tail], axis=-1)
    return dists * cos_angle[..., None]


def raw2alpha(sigma):
    """sigma [N_rays, N_samples] -> (alpha, weights).

    NOTE: intentionally distance-free (alpha = 1 - exp(-sigma)), matching
    reference ``renderer.py:29`` where `dist` is unused.
    """
    alpha = 1.0 - jnp.exp(-sigma)
    ones = jnp.ones_like(alpha[..., :1])
    t = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1),
                    axis=-1)[..., :-1]
    return alpha, alpha * t


def raw2outputs(raw, z_vals, white_bkgd: bool = False):
    """raw [N_rays, N_samples, 4] -> (rgb_map, depth_map, acc_map, weights)."""
    rgb = raw[..., :3]
    sigma = raw[..., 3]
    _, weights = raw2alpha(sigma)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, depth_map, acc_map, weights
