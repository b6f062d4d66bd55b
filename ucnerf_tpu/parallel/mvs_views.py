"""View-sharded CascadeMVSNet forward — a TPU-only parallelism axis with no
reference analogue (reference ``train.py:433`` is single-GPU).

Why it exists: in ray-DP training (``--parallel_mode rays``, the reference's
1-scene/step regime) the MVS cascade is the replicated prefix — every device
runs the identical forward+backward (the bulk of the step) while only the
render phase shards over rays, Amdahl-capping multi-chip scaling.  But the
cascade's dominant per-view work decomposes exactly over the V-1 source
views:

- **FeatureNet** is applied one view at a time with per-view BatchNorm
  statistics (reference ``mvs_models.py:701-704``), so view shards are
  independent by construction.
- The **variance cost volume** (reference ``mvs_models.py:608-625``) is
  assembled from three per-view-summed accumulators — sum(f), sum(f^2), and
  the in-bounds count — so per-device partial sums + one ``psum`` over the
  view axis reproduce the replicated volume (only the float summation order
  changes).  The plane-sweep warp and its scatter-add backward (the
  measured issue-bound floor of the step, BASELINE.md round-3 notes) shard
  with the views.

Views pad up to a multiple of the mesh axis with zero images and a zero
``valid`` mask — masked out of all three accumulators exactly like the
reference's in-bounds count handles pixels no view sees.  Padded views
reuse view 0's projection so the warp stays finite (``homo_warp`` divides
by the warped z; a zero projection would emit NaNs that the mask multiply
cannot kill).

Everything downstream of the psum (CostRegNet, depth regression,
confidence) stays OUTSIDE the shard_maps in the enclosing jit: replicated
compute inside a shard_map would n-fold-count its parameter gradients in
the psum transpose, while under jit XLA's SPMD partitioner keeps it
replicated for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ucnerf_tpu.models.mvs import (CostRegNet, FeatureNet, stage_depth_vals,
                                   stage_head, warp_pack_factor)
from ucnerf_tpu.ops.warp import homo_warp


def make_view_sharded_cascade(mvs, mesh: Mesh, axis: str = "data"):
    """Build a view-sharded drop-in for ``mvs.apply`` (CascadeMVSNet).

    Returns ``fn(params_mvs, imgs_src, affine_mats, affine_mats_inv, near,
    far, pad)`` producing the same outputs pytree as
    ``mvs.apply({"params": params_mvs}, ...)`` (equal up to float summation
    order across the view axis; tested).  ``mvs`` supplies the architecture
    fields; its parameter tree is reused unchanged.
    """
    n_dev = mesh.shape[axis]

    def apply_fn(params_mvs, imgs_src, affine_mats, affine_mats_inv, near,
                 far, pad: int = 0):
        V, H, W = imgs_src.shape[:3]
        v_pad = -(-V // n_dev) * n_dev
        v_local = v_pad // n_dev
        valid = (jnp.arange(v_pad) < V).astype(imgs_src.dtype)   # [v_pad]
        imgs_p = (imgs_src if v_pad == V else jnp.concatenate(
            [imgs_src, jnp.zeros((v_pad - V, H, W, 3), imgs_src.dtype)]))

        featnet = FeatureNet(mvs.base_channels, mvs.dtype,
                             mvs.folded_featnet)

        def featnet_local(params, imgs_local):
            # static per-view loop (a vmapped featnet would also work but
            # the per-view form matches the replicated path's BN semantics
            # structure and v_local is tiny)
            outs = [featnet.apply({"params": params}, imgs_local[i])
                    for i in range(v_local)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        feats = jax.shard_map(featnet_local, mesh=mesh,
                              in_specs=(P(), P(axis)),
                              out_specs=P(axis))(params_mvs["feature"],
                                                 imgs_p)

        D0 = mvs.ndepths[0]
        t = jnp.linspace(0.0, 1.0, D0, dtype=imgs_src.dtype)
        depth_values_init = near * (1.0 - t) + far * t
        depth_interval = (far - near) / D0
        n_stages = len(mvs.ndepths)

        outputs = {}
        depth_prev = None
        for si in range(n_stages):
            stage = si + 1
            scale = 2 ** (2 - si)                                # 4, 2, 1
            ndepth = mvs.ndepths[si]
            h, w = H // scale, W // scale
            stage_pad = pad if si == n_stages - 1 else 0
            depth_vals = stage_depth_vals(
                depth_prev, ndepth,
                mvs.depth_intervals_ratio[si] * depth_interval, near, far,
                H, W, h, w, stage_pad, depth_values_init)

            aff = affine_mats[:, si]                             # [V, 4, 4]
            projs = jnp.einsum("vij,jk->vik", aff[1:],
                               affine_mats_inv[0, si])[:, :3]    # [V-1,3,4]
            if v_pad > V:  # finite dummy projection; masked out below
                projs = jnp.concatenate(
                    [projs, jnp.broadcast_to(projs[:1],
                                             (v_pad - V, 3, 4))])

            feats_stage = feats[f"stage{stage}"]             # [v_pad,h,w,C]
            C = feats_stage.shape[-1]
            pack = warp_pack_factor(C, w)

            def warp_local(feats_local, projs_local, valid_local, dv,
                           stage_pad=stage_pad, pack=pack):
                vol_sum, vol_sq_sum, mask_sum = 0.0, 0.0, 0.0
                for i in range(v_local):
                    warped, mask = homo_warp(feats_local[i], projs_local[i],
                                             dv, pad=stage_pad, pack=pack)
                    vi = valid_local[i]
                    vol_sum = vol_sum + warped * vi
                    vol_sq_sum = vol_sq_sum + (warped * warped) * vi
                    mask_sum = mask_sum + mask * vi
                return (jax.lax.psum(vol_sum, axis),
                        jax.lax.psum(vol_sq_sum, axis),
                        jax.lax.psum(mask_sum, axis))

            vol_sum, vol_sq_sum, mask_sum = jax.shard_map(
                warp_local, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P()),
                out_specs=(P(), P(), P()))(
                feats_stage, projs, valid, depth_vals)
            # the reference's extra +1 mask slice (mvs_models.py:610,621)
            count = (1.0 / (1.0 + mask_sum))[..., None]
            variance = vol_sq_sum * count - (vol_sum * count) ** 2

            cost_feat, prob_logits = CostRegNet(
                mvs.cr_base_chs[si], mvs.dtype, mvs.folded_convs).apply(
                {"params": params_mvs[f"cost_reg_{si}"]}, variance)
            prob, depth_out, confidence = stage_head(
                prob_logits, depth_vals, ndepth, stage_pad, h, w)

            outputs[f"stage{stage}"] = {
                "depth": depth_out,
                "photometric_confidence": confidence,
                "volume_feature": cost_feat,
                "depth_values": depth_vals,
                "prob_volume": jax.lax.stop_gradient(prob),
            }
            depth_prev = depth_out

        outputs["img_feats"] = feats["stage3"][:V]           # [V-1, H, W, 8]
        return outputs

    return apply_fn
