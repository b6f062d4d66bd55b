"""Depth-candidate sampling along rays.

Behavioral spec from reference ``build_rays`` (``utils/utils.py:521-570``) and
``build_rays_test`` (:666-706): per ray, for each cascade stage k, read the
per-pixel [near_k, far_k] from that stage's ``depth_values`` planes, draw
``N_samples//3`` uniformly-spaced depths in each range, concatenate, sort,
then stratified-jitter within the sorted intervals.  Plus the classic NeRF
inverse-CDF ``sample_pdf`` (reference ``data/ray_utils.py:98-141``) as latent
capability (hierarchical resampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_points_uniform(near, far, num_samples: int):
    """near/far [..., 1] -> [..., num_samples] linearly spaced depths.

    Mirrors reference ``sample_points_uniform`` (``utils/utils.py:393-397``).
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=near.dtype)
    return near * (1.0 - t) + far * t


def stratified_jitter(depth_sorted, key):
    """Jitter sorted depths within their midpoint intervals
    (reference ``utils/utils.py:565-570``)."""
    mids = 0.5 * (depth_sorted[..., 1:] + depth_sorted[..., :-1])
    upper = jnp.concatenate([mids, depth_sorted[..., -1:]], axis=-1)
    lower = jnp.concatenate([depth_sorted[..., :1], mids], axis=-1)
    t = jax.random.uniform(key, depth_sorted.shape, dtype=depth_sorted.dtype)
    return lower + (upper - lower) * t


def stage_depth_candidates(stage_near_far, n_samples: int, key=None):
    """Build per-ray depth candidates from 3 cascade stages.

    Args:
      stage_near_far: dict with 'near_k'/'far_k' [N_rays, 1] for k in 1..3.
      n_samples: total candidate count (divided //3 per stage).
      key: PRNG key for stratified jitter; None -> deterministic (no jitter),
        which the reference never does (even eval jitters,
        ``utils/utils.py:705-706``) but is useful for tests.

    Returns [N_rays, 3 * (n_samples // 3)] sorted (jittered) depths.
    """
    avg = n_samples // 3
    per_stage = [
        sample_points_uniform(stage_near_far[f"near_{k}"],
                              stage_near_far[f"far_{k}"], avg)
        for k in (1, 2, 3)
    ]
    depth = jnp.sort(jnp.concatenate(per_stage, axis=-1), axis=-1)
    if key is not None:
        depth = stratified_jitter(depth, key)
    return depth


def sample_pdf(bins, weights, n_samples: int, key=None, det: bool = False):
    """Inverse-CDF resampling (reference ``data/ray_utils.py:98-141``).

    bins [N, B], weights [N, B-1] -> samples [N, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples),
                               dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples))
    inds = inds.reshape(*cdf.shape[:-1], n_samples)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
