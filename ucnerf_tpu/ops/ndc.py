"""Reference-view NDC coordinates for cost-volume featurization.

Behavioral spec from reference ``get_ndc_coordinate``
(``utils/utils.py:323-373``): world points -> reference camera frame ->
pixel coordinates via K; xy normalized by (W-1, H-1) to ~[0,1]; z normalized
per cascade stage by that ray's per-stage [near_k, far_k].  Points with
|z_cam| < 1e-4 are clamped to +1e-4 (``utils/utils.py:341-342``).
"""

from __future__ import annotations

import jax.numpy as jnp


def project_to_pixel(points, w2c, intrinsic, inv_scale, clamp_z: bool = True):
    """World points -> (x/(W-1), y/(H-1), z_cam).

    Args:
      points: [..., 3] world coordinates.
      w2c: [4, 4] (or [3,4]) world-to-camera of the reference view; pass None
        if points are already in the camera frame.
      intrinsic: [3, 3].
      inv_scale: [2] = (W-1, H-1).
    Returns [..., 3].
    """
    if w2c is not None:
        R = w2c[:3, :3]
        T = w2c[:3, 3]
        points = points @ R.T + T
    if clamp_z:
        z = points[..., 2:]
        z = jnp.where(jnp.abs(z) < 1e-4, 1e-4, z)
        points = jnp.concatenate([points[..., :2], z], axis=-1)
    pix = points @ intrinsic.T
    xy = pix[..., :2] / pix[..., 2:] / inv_scale
    return jnp.concatenate([xy, pix[..., 2:]], axis=-1)


def world_to_ref_ndc(points, w2c, intrinsic, inv_scale, stage_near_far):
    """Per-stage NDC dict for cost-volume lookups.

    Args:
      points: [N_rays, N_samples, 3] world sample points.
      stage_near_far: dict with 'near_1'..'far_3' of shape [N_rays, 1]
        (per-ray stage depth ranges) and scalars 'near', 'far'.

    Returns dict {'stage1','stage2','stage3','ndc'} of [N_rays, N_samples, 3],
    mirroring reference ``utils/utils.py:349-367``.
    """
    pix = project_to_pixel(points, w2c, intrinsic, inv_scale)
    xy = pix[..., :2]
    z = pix[..., 2:]

    out = {}
    for k in (1, 2, 3):
        near = stage_near_far[f"near_{k}"][..., None]   # [N_rays, 1, 1]
        far = stage_near_far[f"far_{k}"][..., None]
        zk = (z - near) / (far - near)
        out[f"stage{k}"] = jnp.concatenate([xy, zk], axis=-1)
    z_ndc = (z - stage_near_far["near"]) / (stage_near_far["far"]
                                            - stage_near_far["near"])
    out["ndc"] = jnp.concatenate([xy, z_ndc], axis=-1)
    return out
