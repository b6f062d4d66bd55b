"""CascadeMVSNet — the "Consistency Learner" — in Flax, channel-last.

Behavioral port of reference ``network/mvs_models.py:309-762``:
- ``FeatureNet`` (fpn): 3-scale FPN, base_channels=8, per-stage output
  channels [32, 16, 8] (reference :309-410).  Applied per view with shared
  weights via ``nn.vmap`` — this also reproduces the reference's per-view
  BatchNorm statistics (it calls ``self.feature(img)`` one view at a time,
  :701-704).
- ``CostRegNet``: 3D U-Net, stride-2 down x3, deconv up x3 with skip adds,
  returns (cost_feature, prob_logits) (reference :412-443).
- ``DepthNet``: plane-sweep homography warp of source-view features into the
  target frustum over D depth hypotheses, masked variance cost volume with
  the reference's (n_valid + 1) count (:608-625), 3D regularization ->
  softmax prob volume -> expectation depth (:632-633), photometric
  confidence = 4-bin sliding prob mass at the winner index (:635-642).
- cascade depth-range propagation with detached previous depth,
  bilinear-upsample to full res, clamped linspace re-centering, trilinear
  resize to stage res (:715-746, ``get_depth_range_samples`` :554-573).

Deliberately dropped dead compute (documented): the reference also
homography-warps the source *images* into ``img_feat_no_ref``
(:600,614,618) but never uses the result — we skip those V warps.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ucnerf_tpu.models.layers import (ConvBNReLU, ConvParams,
                                      ConvTransposeBNReLU, Folded,
                                      ParamHolder, SpaceFolded,
                                      _depth_taps_conv, _fold_kernel,
                                      _space_fold_kernel, _space_taps,
                                      fold_volume, space_fold, space_unfold,
                                      unfold_volume)
from ucnerf_tpu.models.layers import torch_kaiming_uniform_conv
from ucnerf_tpu.ops.interpolate import (resize_bilinear, resize_trilinear,
                                        upsample2x_nearest)
from ucnerf_tpu.ops.warp import homo_warp


def _sf_conv(sf: SpaceFolded, w, b, k: int, s: int, p: int) -> SpaceFolded:
    """Apply a fine (k, s, p) conv to a space-folded map (see
    ``layers.SpaceFolded``); ``w`` is the FINE kernel (params stay in the
    nn.Conv layout so converters/checkpoints are unchanged)."""
    T, pf = _space_taps(sf.f, k, s, p)
    big = _space_fold_kernel(w, T, T)
    kf = T.shape[1]
    y = jax.lax.conv_general_dilated(
        sf.x[None], big, window_strides=(1, 1),
        padding=[(pf, kf - 1 - pf)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    f_out = sf.f // s
    if b is not None:
        y = y + jnp.tile(b, f_out * f_out)   # phase-major: b repeats per phase
    return SpaceFolded(y, f_out)


def _sf_up2(sf: SpaceFolded) -> SpaceFolded:
    """Nearest 2x upsample in folded space: pure phase-channel fan-out
    (out fine pixel (2i+a) reads in fine pixel i, i.e. out phase (ay, ax)
    at block I reads in phase (ay//2, ax//2) at the SAME block)."""
    hb, wb = sf.x.shape[:2]
    c = sf.channels
    if sf.f == 1:
        return SpaceFolded(jnp.tile(sf.x, (1, 1, 4)), 2)
    xr = sf.x.reshape(hb, wb, sf.f, sf.f, c)
    xr = jnp.repeat(jnp.repeat(xr, 2, axis=2), 2, axis=3)
    return SpaceFolded(xr.reshape(hb, wb, 4 * sf.f * sf.f * c), 2 * sf.f)


class FeatureNet(nn.Module):
    """FPN feature extractor for one view [H, W, 3] -> 3 stage maps.

    With ``space_folded=True``, every conv runs space-to-depth folded at
    the coarsest (stage-1) resolution with f^2-wider channels (fold 4 at
    full res, 2 at half res — see ``layers.SpaceFolded``): the same math
    and the same parameter tree as the plain path, but MXU-lane-efficient
    where the C=3..32 2D convs are latency-bound on TPU.
    """
    base_channels: int = 8
    dtype: object = None
    space_folded: bool = False

    @nn.compact
    def __call__(self, x):
        if self.space_folded and x.shape[0] % 4 == 0 and x.shape[1] % 4 == 0:
            return self._folded_fpn(x)
        bc = self.base_channels
        dt = self.dtype
        conv0 = ConvBNReLU(bc, 3, 1, 1, dtype=dt)(x)
        conv0 = ConvBNReLU(bc, 3, 1, 1, dtype=dt)(conv0)
        conv1 = ConvBNReLU(bc * 2, 5, 2, 2, dtype=dt)(conv0)
        conv1 = ConvBNReLU(bc * 2, 3, 1, 1, dtype=dt)(conv1)
        conv1 = ConvBNReLU(bc * 2, 3, 1, 1, dtype=dt)(conv1)
        conv2 = ConvBNReLU(bc * 4, 5, 2, 2, dtype=dt)(conv1)
        conv2 = ConvBNReLU(bc * 4, 3, 1, 1, dtype=dt)(conv2)
        conv2 = ConvBNReLU(bc * 4, 3, 1, 1, dtype=dt)(conv2)

        intra = conv2
        out1 = nn.Conv(bc * 4, (1, 1), use_bias=False,
                       kernel_init=torch_kaiming_uniform_conv)(intra)
        # FPN top-down (reference mvs_models.py:395-403)
        inner1 = nn.Conv(bc * 4, (1, 1), use_bias=True,
                         kernel_init=torch_kaiming_uniform_conv)(conv1)
        intra = upsample2x_nearest(intra) + inner1
        out2 = nn.Conv(bc * 2, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=False,
                       kernel_init=torch_kaiming_uniform_conv)(intra)
        inner2 = nn.Conv(bc * 4, (1, 1), use_bias=True,
                         kernel_init=torch_kaiming_uniform_conv)(conv0)
        intra = upsample2x_nearest(intra) + inner2
        out3 = nn.Conv(bc, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                       kernel_init=torch_kaiming_uniform_conv)(intra)
        return {"stage1": out1, "stage2": out2, "stage3": out3}

    def _folded_fpn(self, x):
        """Space-folded twin of ``__call__`` — same module/param creation
        order (ConvBNReLU_0..7, Conv_0..4), same math (tested)."""
        bc = self.base_channels
        dt = self.dtype
        sf = space_fold(x, 4)
        conv0 = ConvBNReLU(bc, 3, 1, 1, dtype=dt)(sf)
        conv0 = ConvBNReLU(bc, 3, 1, 1, dtype=dt)(conv0)          # f=4
        conv1 = ConvBNReLU(bc * 2, 5, 2, 2, dtype=dt)(conv0)      # f=2
        conv1 = ConvBNReLU(bc * 2, 3, 1, 1, dtype=dt)(conv1)
        conv1 = ConvBNReLU(bc * 2, 3, 1, 1, dtype=dt)(conv1)
        conv2 = ConvBNReLU(bc * 4, 5, 2, 2, dtype=dt)(conv1)      # f=1
        conv2 = ConvBNReLU(bc * 4, 3, 1, 1, dtype=dt)(conv2)
        conv2 = ConvBNReLU(bc * 4, 3, 1, 1, dtype=dt)(conv2)

        intra = conv2                                             # f=1
        # the FPN lateral/output convs run f32 like the nn.Conv path
        # (which takes no compute dtype)
        w, _ = ConvParams((1, 1, bc * 4, bc * 4), name="Conv_0")()
        out1 = _sf_conv(intra, w, None, 1, 1, 0)
        w, b = ConvParams((1, 1, bc * 2, bc * 4), bias=True,
                          name="Conv_1")()
        intra = _sf_up2(intra) + _sf_conv(conv1, w, b, 1, 1, 0)   # f=2
        w, _ = ConvParams((3, 3, bc * 4, bc * 2), name="Conv_2")()
        out2 = _sf_conv(intra, w, None, 3, 1, 1)
        w, b = ConvParams((1, 1, bc, bc * 4), bias=True, name="Conv_3")()
        intra = _sf_up2(intra) + _sf_conv(conv0, w, b, 1, 1, 0)   # f=4
        w, _ = ConvParams((3, 3, bc * 4, bc), name="Conv_4")()
        out3 = _sf_conv(intra, w, None, 3, 1, 1)
        return {"stage1": space_unfold(out1), "stage2": space_unfold(out2),
                "stage3": space_unfold(out3)}


class CostRegNet(nn.Module):
    """3D U-Net cost regularizer [D, H, W, C] -> (cost [.,.,.,bc], prob[...,1])
    (reference ``mvs_models.py:412-443``).

    With ``folded=True`` (the default), every 3D conv runs depth-folded as a
    2D conv with D*C channels (see ``layers.Folded``) — the same math and the
    same parameter tree, but MXU-lane-efficient where the direct C=8..64
    3D convs are latency-bound on TPU.
    """
    base_channels: int = 8
    dtype: object = None
    folded: bool = True

    @nn.compact
    def __call__(self, x):
        bc = self.base_channels
        dt = self.dtype
        if self.folded:
            x = fold_volume(x)
        conv0 = ConvBNReLU(bc, 3, 1, 1, dtype=dt)(x)
        conv2 = ConvBNReLU(bc * 2, 3, 2, 1, dtype=dt)(conv0)
        conv2 = ConvBNReLU(bc * 2, 3, 1, 1, dtype=dt)(conv2)
        conv4 = ConvBNReLU(bc * 4, 3, 2, 1, dtype=dt)(conv2)
        conv4 = ConvBNReLU(bc * 4, 3, 1, 1, dtype=dt)(conv4)
        x = ConvBNReLU(bc * 8, 3, 2, 1, dtype=dt)(conv4)
        x = ConvBNReLU(bc * 8, 3, 1, 1, dtype=dt)(x)
        x = conv4 + ConvTransposeBNReLU(bc * 4, dtype=dt)(x)
        x = conv2 + ConvTransposeBNReLU(bc * 2, dtype=dt)(x)
        cost = conv0 + ConvTransposeBNReLU(bc, dtype=dt)(x)
        if self.folded:
            # f32 like the unfolded nn.Conv (which takes no compute dtype)
            w = ParamHolder((3, 3, 3, bc, 1), name="Conv_0")()
            big = _fold_kernel(w, _depth_taps_conv(cost.d, 3, 1, 1))
            prob = jax.lax.conv_general_dilated(
                cost.x[None], big, window_strides=(1, 1),
                padding=[(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            return unfold_volume(cost), unfold_volume(Folded(prob, cost.d))
        prob = nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                       kernel_init=torch_kaiming_uniform_conv)(cost)
        return cost, prob


def _variance_cost_volume(src_feats, projs, depth_values, pad: int):
    """Masked variance volume over source views.

    src_feats [V, H, W, C]; projs [V, 3, 4]; depth_values [D, H_pad, W_pad].
    Returns variance [D, H_pad, W_pad, C] (reference ``mvs_models.py:608-625``).

    The warp gathers use pack-4 rows for narrow channels (C=8, i.e. stage
    3): 4x fewer issue-bound gather/scatter rows, bit-identical result —
    measured 1.5x faster fwd+bwd at stage 3, a loss at C>=16 (ops/warp.py).
    """
    V, _, W, C = src_feats.shape
    pack = warp_pack_factor(C, W)
    vol_sum = 0.0
    vol_sq_sum = 0.0
    mask_sum = jnp.ones_like(depth_values)  # the reference's extra +1 slice
    for i in range(V):
        warped, mask = homo_warp(src_feats[i], projs[i], depth_values,
                                 pad=pad, pack=pack)
        vol_sum = vol_sum + warped
        vol_sq_sum = vol_sq_sum + warped * warped
        mask_sum = mask_sum + mask
    count = (1.0 / mask_sum)[..., None]
    return vol_sq_sum * count - (vol_sum * count) ** 2


def _sliding_prob_mass4(prob):
    """4-bin sliding sum along depth with (1, 2) zero padding, the
    reference's ``4 * avg_pool3d(pad(prob, (...,1,2)), (4,1,1))``
    (``mvs_models.py:635-636``).  prob [D, H, W] -> [D, H, W]."""
    D = prob.shape[0]
    p = jnp.pad(prob, ((1, 2), (0, 0), (0, 0)))
    cs = jnp.cumsum(p, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    return cs[4:4 + D] - cs[0:D]


def _depth_range_samples(cur_depth_hw, ndepth: int, interval, near, far):
    """Re-center depth hypotheses around an upsampled previous depth
    (reference ``get_cur_depth_range_samples``, ``mvs_models.py:536-551``)."""
    dmin = jnp.clip(cur_depth_hw - ndepth / 2 * interval, min=near)
    dmax = jnp.clip(cur_depth_hw + ndepth / 2 * interval, max=far)
    new_interval = (dmax - dmin) / (ndepth - 1)
    steps = jnp.arange(ndepth, dtype=cur_depth_hw.dtype)[:, None, None]
    return dmin[None] + steps * new_interval[None]


def stage_depth_vals(depth_prev, ndepth: int, interval, near, far,
                     H: int, W: int, h: int, w: int, stage_pad: int,
                     depth_values_init):
    """Depth hypotheses for one cascade stage at stage resolution (+pad):
    the depth-range propagation block of the stage loop (reference
    ``mvs_models.py:694-699,715-746``).  ``depth_prev`` is the previous
    stage's full-precision depth map (None for stage 1).  Shared by
    ``CascadeMVSNet.__call__`` and the view-sharded forward
    (``parallel.mvs_views``)."""
    if depth_prev is None:
        D0 = depth_values_init.shape[0]
        drs = jnp.broadcast_to(depth_values_init[:, None, None], (D0, H, W))
    else:
        cur = resize_bilinear(
            jax.lax.stop_gradient(depth_prev)[..., None], (H, W))[..., 0]
        drs = _depth_range_samples(cur, ndepth, interval, near, far)
    # trilinear to stage resolution (mvs_models.py:741-746)
    depth_vals = resize_trilinear(drs[..., None], (ndepth, h, w))[..., 0]
    if stage_pad > 0:
        depth_vals = jnp.pad(
            depth_vals,
            ((0, 0), (stage_pad, stage_pad), (stage_pad, stage_pad)),
            mode="edge")
    return depth_vals


def stage_head(prob_logits, depth_vals, ndepth: int, stage_pad: int,
               h: int, w: int):
    """Softmax prob volume -> expectation depth + photometric confidence +
    pad crop (reference ``mvs_models.py:632-642,735-740``).  Returns
    ``(prob, depth_out, confidence)``.  Shared by ``CascadeMVSNet.__call__``
    and the view-sharded forward (``parallel.mvs_views``)."""
    prob = jax.nn.softmax(prob_logits[..., 0], axis=0)       # [D, h, w]
    depth = jnp.sum(prob * depth_vals, axis=0)
    # confidence stays differentiable w.r.t. prob (the reference computes
    # it under set_grad_enabled(True), mvs_models.py:634); only the integer
    # winner index is non-differentiable.
    sum4 = _sliding_prob_mass4(prob)
    idx = jnp.sum(jax.lax.stop_gradient(prob)
                  * jnp.arange(ndepth, dtype=prob.dtype)[:, None, None],
                  axis=0)
    idx = jnp.clip(idx.astype(jnp.int32), 0, ndepth - 1)
    confidence = jnp.clip(
        jnp.take_along_axis(sum4, idx[None], axis=0)[0], 0.0, 1.0)
    if stage_pad > 0:
        depth_out = depth[stage_pad:h + stage_pad, stage_pad:w + stage_pad]
        confidence = confidence[stage_pad:h + stage_pad,
                                stage_pad:w + stage_pad]
    else:
        depth_out = depth
    return prob, depth_out, confidence


def warp_pack_factor(C: int, W: int) -> int:
    """The measured-optimal pack factor for the plane-sweep warp gathers
    (see ``_variance_cost_volume`` and ``ops/warp.py``): pack-4 for narrow
    channels only."""
    return 4 if (C <= 8 and W % 4 == 0) else 1


class CascadeMVSNet(nn.Module):
    """Full 3-stage cascade (reference ``mvs_models.py:648-762``).

    __call__(imgs_src, affine_mats, affine_mats_inv, near, far, pad)
      imgs_src: [V-1, H, W, 3] ImageNet-normalized source views.
      affine_mats / _inv: [V, 3, 4, 4] per-view per-stage K@w2c (view 0 is
        the target/reference view, reference ``DepthNet`` :602-603).
    Returns per-stage dict with depth / photometric_confidence /
    volume_feature / depth_values / prob_volume, plus stage3 img_feats.
    """
    ndepths: Sequence[int] = (48, 32, 8)
    depth_intervals_ratio: Sequence[int] = (4, 2, 1)
    base_channels: int = 8
    cr_base_chs: Sequence[int] = (8, 8, 8)
    dtype: object = None           # conv compute dtype (bf16 on TPU)
    folded_convs: bool = True      # depth-folded CostRegNet (layers.Folded)
    folded_featnet: bool = False   # space-folded FeatureNet (SpaceFolded)

    def setup(self):
        # setattr keeps the compact-era param names ("feature",
        # "cost_reg_{i}") so converters / oracles / the view-sharded
        # cascade (parallel/mvs_views.py) see an unchanged tree.
        per_view_featnet = nn.vmap(
            FeatureNet, in_axes=0, out_axes=0,
            variable_axes={"params": None}, split_rngs={"params": False})
        self.feature = per_view_featnet(self.base_channels, self.dtype,
                                        self.folded_featnet)
        for si in range(len(self.ndepths)):
            setattr(self, f"cost_reg_{si}",
                    CostRegNet(self.cr_base_chs[si], self.dtype,
                               self.folded_convs))

    def features(self, imgs_src):
        """Per-source-view FPN features — target-independent, so a serving
        loop over a fixed source set (render_path.py) computes this ONCE
        and reruns only ``from_features`` per target pose."""
        return self.feature(imgs_src)

    def from_features(self, feats, affine_mats, affine_mats_inv, near, far,
                      pad: int = 0):
        """Cascade given precomputed ``features`` output (the target-view-
        dependent remainder: plane-sweep warp, variance, CostRegNet,
        depth/confidence heads)."""
        H, W = feats["stage3"].shape[1:3]
        n_stages = len(self.ndepths)

        D0 = self.ndepths[0]
        # reference computes depth hypotheses in the (f32) input dtype;
        # derive from near/far, not feats (which may be bf16 compute dtype)
        t = jnp.linspace(0.0, 1.0, D0, dtype=jnp.asarray(near).dtype)
        depth_values_init = near * (1.0 - t) + far * t          # [D0]
        depth_interval = (far - near) / D0

        outputs = {}
        depth_prev = None
        for si in range(n_stages):
            stage = si + 1
            scale = 2 ** (2 - si)                                # 4, 2, 1
            ndepth = self.ndepths[si]
            h, w = H // scale, W // scale

            stage_pad = pad if si == n_stages - 1 else 0
            depth_vals = stage_depth_vals(
                depth_prev, ndepth,
                self.depth_intervals_ratio[si] * depth_interval, near, far,
                H, W, h, w, stage_pad, depth_values_init)

            aff = affine_mats[:, si]                             # [V, 4, 4]
            aff_inv_ref = affine_mats_inv[0, si]                 # target view
            projs = jnp.einsum("vij,jk->vik", aff[1:], aff_inv_ref)[:, :3]

            feats_stage = feats[f"stage{stage}"]                 # [V-1,h,w,C]
            variance = _variance_cost_volume(feats_stage, projs, depth_vals,
                                             stage_pad)
            cost_feat, prob_logits = getattr(
                self, f"cost_reg_{si}")(variance)
            prob, depth_out, confidence = stage_head(
                prob_logits, depth_vals, ndepth, stage_pad, h, w)

            outputs[f"stage{stage}"] = {
                "depth": depth_out,
                "photometric_confidence": confidence,
                "volume_feature": cost_feat,                 # [D,h,w,bc]
                "depth_values": depth_vals,                  # [D,h(+2p),w(+2p)]
                "prob_volume": jax.lax.stop_gradient(prob),
            }
            depth_prev = depth_out

        outputs["img_feats"] = feats["stage3"]               # [V-1, H, W, 8]
        return outputs

    def __call__(self, imgs_src, affine_mats, affine_mats_inv, near, far,
                 pad: int = 0):
        return self.from_features(self.features(imgs_src), affine_mats,
                                  affine_mats_inv, near, far, pad)
