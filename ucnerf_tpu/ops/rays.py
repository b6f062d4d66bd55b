"""Ray generation: the reference's 3-population ray mix, static-shaped.

Reference behavior (``utils/utils.py:400-597``), per train step:
  (a) ``patch_num//2`` patches of ``patch_size**2`` pixels, patch centers drawn
      by multinomial on MVS confidence (``get_rays_with_random_patches``,
      ``utils/utils.py:169-215``),
  (b) same count drawn on (1 - confidence),
  (c) ``N_rays - (a) - (b)`` uniformly random pixels (``get_rays_mvs``,
      ``utils/utils.py:217-271``),
  (d) all sparse-COLMAP-depth pixels appended (``get_rays_mvs_coord``,
      ``utils/utils.py:274-320``; capped at 1024 by ``data/scared.py:503``).

Per ray, depth candidates come from the 3 cascade stages' per-pixel
[near_k, far_k] planes, 30 uniform samples each, concat+sort+stratified jitter
(``utils/utils.py:521-570``).

TPU-first changes (behavior-preserving):
- multinomial-without-replacement -> Gumbel top-k (identical distribution),
- population (d) is a fixed 1024-slot buffer with a validity mask instead of a
  dynamic count,
- everything is a pure function of a PRNG key with static output shapes, so
  the whole ray builder lives inside one jit.

Ray-direction convention (``utils/utils.py:259-261``):
  dirs = [(x - cx)/fx, (y - cy)/fy, 1] @ c2w[:3,:3]^T ;  origin = c2w[:3,3].
Pixel coordinates are stored (y, x) like the reference ("row col").
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ucnerf_tpu.ops.ndc import world_to_ref_ndc
from ucnerf_tpu.ops.sampling import stage_depth_candidates


def gumbel_topk_sample(key, weights, k: int):
    """Sample k indices without replacement ∝ weights (Gumbel top-k).

    Equivalent in distribution to ``torch.multinomial(weights, k)``
    (replacement=False).  Zero weights are never selected unless fewer than k
    positive entries exist.
    """
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)),
                     -jnp.inf)
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logw + g, k)
    return idx


def ray_dirs_from_pixels(xs, ys, intrinsic, c2w):
    """Pixel coords -> world-space ray directions and origin."""
    dirs = jnp.stack([(xs - intrinsic[0, 2]) / intrinsic[0, 0],
                      (ys - intrinsic[1, 2]) / intrinsic[1, 1],
                      jnp.ones_like(xs)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def _patch_pixels(key, confidence, patch_size: int, num_patches: int):
    """Confidence-guided patch pixel coords.

    Mirrors ``get_rays_with_random_patches(random=False)``
    (``utils/utils.py:176-199``): multinomial pixel draw -> patch cell
    (clamped to H//ps - 2) -> random in-cell shift -> ps x ps block,
    row-major flattening.
    Returns (ys, xs) each [num_patches * patch_size**2].
    """
    H, W = confidence.shape
    ps = patch_size
    k_sel, k_shift = jax.random.split(key)
    sel = gumbel_topk_sample(k_sel, confidence.reshape(-1), num_patches)
    xs_c = sel % W
    ys_c = sel // W
    pi = jnp.clip(ys_c // ps, 0, H // ps - 2)
    pj = jnp.clip(xs_c // ps, 0, W // ps - 2)
    shifts = jax.random.randint(k_shift, (2, num_patches), 0, ps)
    row0 = pi * ps + shifts[0]
    col0 = pj * ps + shifts[1]
    rr = jnp.arange(ps)
    # [num_patches, ps, ps] row-major within each patch
    ys = jnp.broadcast_to(row0[:, None, None] + rr[None, :, None],
                          (num_patches, ps, ps))
    xs = jnp.broadcast_to(col0[:, None, None] + rr[None, None, :],
                          (num_patches, ps, ps))
    return ys.reshape(-1), xs.reshape(-1)


def _stage_near_far(stage_planes, ys, xs, near_ref, far_ref):
    """Per-ray [near_k, far_k] from each stage's first/last depth plane.

    Mirrors reference ``utils/utils.py:524-541`` (pixel coords integer-divided
    by the stage scale 4/2/1).
    """
    out = {"near": near_ref, "far": far_ref}
    for k, scale in ((1, 4), (2, 2), (3, 1)):
        near_p, far_p = stage_planes[k]
        yy = ys // scale
        xx = xs // scale
        out[f"near_{k}"] = near_p[yy, xx][:, None]
        out[f"far_{k}"] = far_p[yy, xx][:, None]
    return out


def _assemble(key_depth, ys, xs, intrinsic, c2w, w2c_ref, intrinsic_ref,
              inv_scale, stage_planes, near_ref, far_ref, n_samples: int,
              jitter: bool, analytic_ndc: bool = True):
    ysf = ys.astype(jnp.float32)
    xsf = xs.astype(jnp.float32)
    rays_o, rays_d = ray_dirs_from_pixels(xsf, ysf, intrinsic, c2w)
    nf = _stage_near_far(stage_planes, ys, xs, near_ref, far_ref)
    depth = stage_depth_candidates(nf, n_samples,
                                   key_depth if jitter else None)
    points = rays_o[:, None, :] + depth[..., None] * rays_d[:, None, :]
    if analytic_ndc:
        # The NDC reference view IS the view the rays are cast from
        # (reference train.py:147-149): a point at parameter t on the ray
        # through pixel (x, y) projects back to exactly (x, y), and its
        # camera z equals t (ray dirs have z=1 in the camera frame,
        # utils/utils.py:259-261).  So the reference's per-point projection
        # (get_ndc_coordinate, utils/utils.py:323-373) collapses to
        # closed form — no [N, S, 3] matmul, no divisions.
        S = depth.shape[-1]
        xy = jnp.broadcast_to(
            (jnp.stack([xsf, ysf], axis=-1) / inv_scale)[:, None, :],
            (depth.shape[0], S, 2))
        ndc = {}
        for k in (1, 2, 3):
            zk = ((depth - nf[f"near_{k}"]) /
                  (nf[f"far_{k}"] - nf[f"near_{k}"]))[..., None]
            ndc[f"stage{k}"] = jnp.concatenate([xy, zk], axis=-1)
        z = ((depth - near_ref) / (far_ref - near_ref))[..., None]
        ndc["ndc"] = jnp.concatenate([xy, z], axis=-1)
    else:
        ndc = world_to_ref_ndc(points, w2c_ref, intrinsic_ref, inv_scale, nf)
    return dict(rays_o=rays_o, rays_d=rays_d, pixel_coords=jnp.stack(
        [ys, xs], axis=-1), depth_candidates=depth, points_world=points,
        ndc=ndc, stage_near_far=nf)


def build_train_rays(key, *, image_tgt, confidence, sparse_coords, sparse_mask,
                     intrinsic, c2w, w2c_ref, intrinsic_ref, near_ref, far_ref,
                     stage_planes: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]],
                     patch_size: int, patch_num: int, n_uniform: int,
                     n_samples: int, jitter: bool = True):
    """Build the full static train-ray batch.

    Args:
      image_tgt: [H, W, 3] un-normalized target image (ray colors).
      confidence: [H, W] MVS photometric confidence.
      sparse_coords: [n_depth_rays, 2] int (y, x) sparse-depth pixels, padded.
      sparse_mask: [n_depth_rays] float validity of each slot.
      stage_planes: {k: (near_plane, far_plane)} at stage resolution.

    Returns a dict with rays ordered [conf patches | (1-conf) patches |
    uniform | sparse-depth] exactly like the reference concat order
    (``utils/utils.py:479-480``), plus ``depth_ray_mask``.
    """
    H, W = confidence.shape
    k1, k2, k3, kd = jax.random.split(key, 4)

    ys_p1, xs_p1 = _patch_pixels(k1, confidence, patch_size, patch_num // 2)
    ys_p2, xs_p2 = _patch_pixels(k2, 1.0 - confidence, patch_size,
                                 patch_num // 2)
    ku_x, ku_y = jax.random.split(k3)
    xs_u = jax.random.randint(ku_x, (n_uniform,), 0, W)
    ys_u = jax.random.randint(ku_y, (n_uniform,), 0, H)
    ys_d = sparse_coords[:, 0]
    xs_d = sparse_coords[:, 1]

    ys = jnp.concatenate([ys_p1, ys_p2, ys_u, ys_d]).astype(jnp.int32)
    xs = jnp.concatenate([xs_p1, xs_p2, xs_u, xs_d]).astype(jnp.int32)

    inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
    out = _assemble(kd, ys, xs, intrinsic, c2w, w2c_ref, intrinsic_ref,
                    inv_scale, stage_planes, near_ref, far_ref, n_samples,
                    jitter)
    out["colors"] = image_tgt[ys, xs]
    n_fixed = ys_p1.shape[0] + ys_p2.shape[0] + n_uniform
    out["depth_ray_mask"] = jnp.concatenate(
        [jnp.ones((n_fixed,), jnp.float32), sparse_mask])
    return out


def build_test_rays(pixel_idx, *, H: int, W: int, intrinsic, c2w, w2c_ref,
                    intrinsic_ref, near_ref, far_ref, stage_planes,
                    n_samples: int, key=None):
    """Raster-order eval rays for one chunk of flat pixel indices.

    Mirrors ``build_rays_test`` (``utils/utils.py:600-739``): same 3-stage
    depth-candidate scheme, no patches / sparse-depth rays.  The reference
    stratified-jitters even at eval (``utils/utils.py:705-706``); pass a key
    to reproduce that, or None for deterministic midpoints.
    """
    ys = (pixel_idx // W).astype(jnp.int32)
    xs = (pixel_idx % W).astype(jnp.int32)
    inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
    return _assemble(key, ys, xs, intrinsic, c2w, w2c_ref, intrinsic_ref,
                     inv_scale, stage_planes, near_ref, far_ref, n_samples,
                     jitter=key is not None)


# ----------------------------------------------------------- latent ray APIs
# (reference data/ray_utils.py — kept for API completeness; the live UC-NeRF
# pipeline uses the stage-based builders above.)

def get_ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Shift rays to the near plane and project into NeRF's NDC cube
    (reference ``get_ndc_rays``, ``data/ray_utils.py:56-94``)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (W / (2.0 * focal[0])) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal[1])) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal[0])) * (rays_d[..., 0] / rays_d[..., 2]
                                          - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal[1])) * (rays_d[..., 1] / rays_d[..., 2]
                                          - oy_oz)
    d2 = 1.0 - o2
    return (jnp.stack([o0, o1, o2], axis=-1),
            jnp.stack([d0, d1, d2], axis=-1))


def ray_aabb(rays_o, rays_d, bbox):
    """Slab-method ray/AABB intersection -> (t_min, t_max)
    (reference ``dda``, ``data/ray_utils.py:143-150``)."""
    inv_d = 1.0 / (rays_d + 1e-6)
    t0 = (bbox[0] - rays_o) * inv_d
    t1 = (bbox[1] - rays_o) * inv_d
    t = jnp.stack([t0, t1])
    t_min = jnp.max(jnp.min(t, axis=0), axis=-1, keepdims=True)
    t_max = jnp.min(jnp.max(t, axis=0), axis=-1, keepdims=True)
    return t_min, t_max


def ray_marcher(rays, n_samples: int = 64, lindisp: bool = False,
                perturb: float = 0.0, key=None):
    """Uniform / disparity-space stratified marcher (reference
    ``ray_marcher``, ``data/ray_utils.py:152-197``).

    rays [N, 8] = [o(3), d(3), near, far] -> (points [N, S, 3], o, d, z_vals).
    """
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    steps = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - steps) + 1.0 / far * steps)
    else:
        z_vals = near * (1.0 - steps) + far * steps
    if perturb > 0 and key is not None:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * perturb * jax.random.uniform(
            key, z_vals.shape, dtype=z_vals.dtype)
    points = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return points, rays_o, rays_d, z_vals


def ray_marcher_fine(rays, z_vals, weights, n_importance: int = 64,
                     key=None):
    """Importance resampling of additional depths from the coarse weights,
    merged + sorted (reference ``ray_marcher_fine``,
    ``data/ray_utils.py:199-224``, minus its dead density-volume lookup)."""
    from ucnerf_tpu.ops.sampling import sample_pdf
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    z_samples = jax.lax.stop_gradient(
        sample_pdf(z_mid, weights[:, 1:-1], n_importance, key=key))
    z_vals = jnp.sort(jnp.concatenate([z_samples, z_vals], axis=-1), axis=-1)
    points = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return points, rays_o, rays_d, z_vals
