"""Volume rendering: point featurization + MLP query + compositing.

Behavioral port of reference ``network/renderer.py`` + the featurization
helpers in ``utils/utils.py``:

- ``gen_dir_feature`` (renderer.py:163-174): unit ray dirs rotated into the
  reference-view frame.
- ``index_point_feature`` (utils/utils.py:833-893): trilinear gather of the 3
  per-stage cost volumes at per-stage NDC (8ch each -> 24) + photometric
  confidence bilinearly sampled at the stage-3 xy.
- ``build_color_volume`` (utils/utils.py:742-799): reproject every sample
  point into each *source* view; bilinear-sample RGB + strict in-bounds mask
  (4ch/view) and the stage-3 FPN image features (8ch/view), colors-block
  first then features-block (matching the reference's channel layout that the
  MLP slices, ``network/models.py:143-147``).
- ``rendering`` (renderer.py:215-255): feature assembly -> MLP -> distance
  computation (kept, though opacity ignores it) -> alpha compositing.

The reference's ``netchunk``/``chunk`` python loops are replaced by full-batch
XLA ops; full-image eval uses ``lax.scan(unroll=k)`` over fixed-size ray tiles to
bound VMEM/HBM while staying on-device.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ucnerf_tpu.ops.composite import depth2dist, raw2outputs
from ucnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from ucnerf_tpu.ops.ndc import project_to_pixel


def gen_dir_feature(w2c_ref, rays_dir_unit):
    """Rotate unit ray directions into the reference-camera frame."""
    return rays_dir_unit @ w2c_ref[:3, :3].T


def index_point_feature(stage_volumes, confidence, ndc):
    """Trilinear gather of the 3 cost volumes + confidence.

    Args:
      stage_volumes: {1,2,3: [D, h, w, 8]} CostRegNet cost features.
      confidence: [H, W] photometric confidence.
      ndc: dict of per-stage NDC [N, S, 3] in [0, 1].
    Returns (ray_feats [N, S, 24], conf_sampled [N, S]).
    """
    feats = []
    for k in (1, 2, 3):
        grid = ndc[f"stage{k}"] * 2.0 - 1.0
        feats.append(grid_sample_3d(stage_volumes[k], grid,
                                    padding_mode="border",
                                    align_corners=False))
    ray_feats = jnp.concatenate(feats, axis=-1)
    # confidence: a [1,1,1,H,W] volume in the reference -> plain 2D bilinear
    # at the stage-3 xy (the z lookup collapses to the single plane).
    conf = grid_sample_2d(confidence[..., None],
                          ndc["stage3"][..., :2] * 2.0 - 1.0,
                          padding_mode="border", align_corners=False)[..., 0]
    return ray_feats, conf


def build_color_volume(points, src_w2cs, src_intrinsics, imgs_src, img_feats):
    """Reprojected per-view colors+mask and image features.

    Args:
      points: [N, S, 3] world sample points.
      src_w2cs: [V-1, 4, 4]; src_intrinsics: [V-1, 3, 3].
      imgs_src: [V-1, H, W, 3] un-normalized source images.
      img_feats: [V-1, H, W, C_f] stage-3 FPN features.
    Returns [N, S, (V-1)*4 + (V-1)*C_f].
    """
    H, W = imgs_src.shape[1:3]
    inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)

    def per_view(w2c, K, img, feat):
        pix = project_to_pixel(points, w2c, K, inv_scale)
        grid = pix[..., :2] * 2.0 - 1.0
        data = grid_sample_2d(img, grid, padding_mode="border",
                              align_corners=True)
        mask = ((grid[..., 0] > -1.0) & (grid[..., 0] < 1.0)
                & (grid[..., 1] > -1.0) & (grid[..., 1] < 1.0))
        f = grid_sample_2d(feat, grid, padding_mode="border",
                           align_corners=True)
        return jnp.concatenate([data, mask[..., None].astype(data.dtype)],
                               axis=-1), f

    colors, feats = jax.vmap(per_view)(src_w2cs, src_intrinsics, imgs_src,
                                       img_feats)
    # [V-1, N, S, c] -> [N, S, (V-1)*c]; colors-block first, then features
    V1 = colors.shape[0]
    colors = jnp.moveaxis(colors, 0, -2).reshape(*points.shape[:2], -1)
    feats = jnp.moveaxis(feats, 0, -2).reshape(*points.shape[:2], -1)
    return jnp.concatenate([colors, feats], axis=-1)


def gen_pts_feats(rays, mvs_out, confidence, imgs_src, src_w2cs,
                  src_intrinsics):
    """Assemble the [N, S, feat_dim] conditioning tensor
    (reference ``gen_pts_feats``, ``renderer.py:177-212``)."""
    stage_volumes = {k: mvs_out[f"stage{k}"]["volume_feature"]
                     for k in (1, 2, 3)}
    ray_feats, conf = index_point_feature(stage_volumes, confidence,
                                          rays["ndc"])
    color_feats = build_color_volume(rays["points_world"], src_w2cs,
                                     src_intrinsics, imgs_src,
                                     mvs_out["img_feats"])
    return jnp.concatenate([ray_feats, color_feats, conf[..., None]], axis=-1)


def make_feat_ctx(mvs_out, confidence, imgs_src, src_w2cs, src_intrinsics,
                  color_volume=None):
    """Precompute the per-frame featurization context (cost-volume column
    layouts + 2x2-quad-packed source views) once; reuse across ray tiles.

    ``color_volume``: optional (c2w_tgt, K_tgt, near, far, n_depths) —
    builds per-view plane-sweep color volumes once (the reference's
    ``--use_color_volume`` option) so each (ray, view) costs one column
    gather instead of S quad gathers.
    """
    from ucnerf_tpu.render.fast_feats import pack_quads, build_color_volumes
    H, W = imgs_src.shape[1:3]
    quads = pack_quads(jnp.concatenate(
        [imgs_src, mvs_out["img_feats"]], axis=-1))
    ctx = dict(
        stage_volumes={k: mvs_out[f"stage{k}"]["volume_feature"]
                       for k in (1, 2, 3)},
        quad_views=quads, confidence=confidence, src_w2cs=src_w2cs,
        src_intrinsics=src_intrinsics, img_hw=(H, W),
        color_volumes=None, near=None, far=None)
    if color_volume is not None:
        c2w_tgt, k_tgt, near, far, n_depths = color_volume
        ctx["color_volumes"] = build_color_volumes(
            quads, src_w2cs, src_intrinsics, c2w_tgt, k_tgt, near, far,
            (H, W), n_depths)
        ctx["near"], ctx["far"] = near, far
    return ctx


def render_rays(nerf_apply, rays, mvs_out, confidence, imgs_src, src_w2cs,
                src_intrinsics, w2c_ref, white_bkgd: bool = False,
                fast: bool = True, feat_ctx=None):
    """Render one static batch of rays -> (rgb [N,3], depth [N]).

    Mirrors reference ``rendering`` (``renderer.py:215-255``): note the ref
    view is popped from the pose set before color reprojection
    (renderer.py:241-243) — pass source-view poses only.

    ``fast=True`` uses the per-ray column-gather featurization
    (``render.fast_feats``; equal up to fp round-off, ~100x fewer TPU
    gathers); ``fast=False`` keeps the literal reference formulation.
    Pass ``feat_ctx`` (from ``make_feat_ctx``) to amortize the quad packing
    across tiles of the same frame.
    """
    cos_angle = jnp.linalg.norm(rays["rays_d"], axis=-1)
    dirs = gen_dir_feature(w2c_ref, rays["rays_d"] / cos_angle[..., None])

    if fast:
        from ucnerf_tpu.render.fast_feats import gen_pts_feats_fast
        ctx = feat_ctx if feat_ctx is not None else make_feat_ctx(
            mvs_out, confidence, imgs_src, src_w2cs, src_intrinsics)
        input_feat = gen_pts_feats_fast(rays, ctx["stage_volumes"],
                                        ctx["confidence"],
                                        ctx["quad_views"], ctx["src_w2cs"],
                                        ctx["src_intrinsics"],
                                        ctx["img_hw"],
                                        color_volumes=ctx.get("color_volumes"),
                                        near=ctx.get("near"),
                                        far=ctx.get("far"))
    else:
        input_feat = gen_pts_feats(rays, mvs_out, confidence, imgs_src,
                                   src_w2cs, src_intrinsics)
    raw = nerf_apply(rays["ndc"]["ndc"], dirs, input_feat)
    # dists computed for parity; opacity ignores them (renderer.py:25-36)
    _ = depth2dist(rays["depth_candidates"], cos_angle)
    rgb_map, depth_map, _, _ = raw2outputs(raw, rays["depth_candidates"],
                                           white_bkgd)
    return rgb_map, depth_map


def render_image_chunked(build_chunk_rays, render_chunk, H: int, W: int,
                         chunk: int, unroll: int = 1):
    """Full-image render via a scanned loop over fixed-size pixel tiles.

    ``build_chunk_rays(pixel_idx)`` -> rays pytree;
    ``render_chunk(rays)`` -> (rgb, depth).
    The pixel count is padded up to a tile multiple and cropped after
    (replaces the reference's python chunk loop, ``train.py:251-256``).

    ``unroll=k`` issues k tile bodies per scan iteration so the scheduler
    can overlap tile i+1's featurization gathers (issue-bound, not
    bandwidth-bound) with tile i's MLP matmuls.  Swept on v5e at 320x256
    (80 tiles of 1024): 348/337/330/318/317 ms at k=1/2/4/8/16, plateau
    from k=8 (BASELINE.md round-3).  ``lax.scan`` handles k that does not
    divide the tile count, so no extra padding is needed.
    """
    n = H * W
    n_tiles = (n + chunk - 1) // chunk
    idx = jnp.arange(n_tiles * chunk) % n
    tiles = idx.reshape(-1, chunk)

    def body(carry, pix):
        rays = build_chunk_rays(pix)
        return carry, render_chunk(rays)

    _, (rgb, depth) = jax.lax.scan(body, None, tiles, unroll=unroll)
    rgb = rgb.reshape(-1, 3)[:n].reshape(H, W, 3)
    depth = depth.reshape(-1)[:n].reshape(H, W)
    return rgb, depth
