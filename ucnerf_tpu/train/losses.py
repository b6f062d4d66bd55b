"""The 5-term UC-NeRF training loss.

Total (reference ``train.py:185-188``):
    0.05*nerf_depth + 0.05*mvs + 0.05*smooth + 0.008*scaleinv + 5*img_mse

- img2mse on all rays (``utils/loss.py:3``).
- NeRF depth: weighted MSE at the sparse-depth rays (``train.py:179-180``);
  here with an explicit validity mask (our sparse-ray buffer is padded).
- cas_mvsnet_loss (``network/mvs_models.py:512-533``): per-stage smooth-L1 on
  MVS depth vs splatted sparse COLMAP depth, masked depth_gt > 0, point
  weights, stage weights [0.5, 1.0, 2.0].  The reference does fancy-indexed
  ``depth_est[mask]`` — equivalently we weight by the mask and divide by its
  count (static shapes).
  NOTE reference quirk kept: the element-wise product pairs
  ``smooth_l1[mask]`` with ``weight[weight > 0]`` — two *different* boolean
  selections that only line up because sparse depth and weight are splatted
  at the same pixels; with mask==weight-support they coincide, which is what
  our masked form computes.
- edge-preserving smoothness (``mvs_models.py:491-509``): 4-direction
  bilateral-weighted depth TV on the confidence-sampled patch half vs DPT.
- gradient scale-invariant loss (``utils/loss.py:54-112``): closed-form
  scale/shift alignment then gradient-difference on the other patch half.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def img2mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def cas_mvsnet_loss(mvs_out: Dict, sparse_depth_ms: Dict, weight_ms: Dict,
                    stage_weights=(0.5, 1.0, 2.0)):
    total = 0.0
    for k in (1, 2, 3):
        est = mvs_out[f"stage{k}"]["depth"]
        gt = sparse_depth_ms[f"stage{k}"]
        w = weight_ms[f"stage{k}"]
        mask = (gt > 0).astype(est.dtype)
        per_px = smooth_l1(est, gt) * w * mask
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        total = total + stage_weights[k - 1] * jnp.sum(per_px) / denom
    return total


def edge_preserving_smoothness(depth_patches, dpt_patches, gamma: float = 0.1):
    """depth_patches [P, ps, ps], dpt_patches [P, ps, ps, 1]
    (reference ``EdgePreservingSmoothnessLoss``, ``mvs_models.py:491-509``)."""
    def bilateral(x):
        return jnp.exp(-jnp.abs(x).sum(-1) / gamma)

    w = dpt_patches
    d = depth_patches
    w1 = bilateral(w[:, :, :-1] - w[:, :, 1:])
    w2 = bilateral(w[:, :-1, :] - w[:, 1:, :])
    w3 = bilateral(w[:, :-1, :-1] - w[:, 1:, 1:])
    w4 = bilateral(w[:, 1:, :-1] - w[:, :-1, 1:])
    l1 = jnp.mean(jnp.abs(w1 * (d[:, :, :-1] - d[:, :, 1:])))
    l2 = jnp.mean(jnp.abs(w2 * (d[:, :-1, :] - d[:, 1:, :])))
    l3 = jnp.mean(jnp.abs(w3 * (d[:, :-1, :-1] - d[:, 1:, 1:])))
    l4 = jnp.mean(jnp.abs(w4 * (d[:, 1:, :-1] - d[:, :-1, 1:])))
    return (l1 + l2 + l3 + l4) / 4.0


def _compute_scale_and_shift(pred, target, mask):
    """Closed-form least-squares (s, t) minimizing ||s*pred + t - target||²
    over mask (reference ``utils/loss.py:54-74``).  [P, ps, ps] inputs."""
    a00 = jnp.sum(mask * pred * pred, axis=(1, 2))
    a01 = jnp.sum(mask * pred, axis=(1, 2))
    a11 = jnp.sum(mask, axis=(1, 2))
    b0 = jnp.sum(mask * pred * target, axis=(1, 2))
    b1 = jnp.sum(mask * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    safe = jnp.where(det == 0, 1.0, det)
    s = jnp.where(det == 0, 0.0, (a11 * b0 - a01 * b1) / safe)
    t = jnp.where(det == 0, 0.0, (-a01 * b0 + a00 * b1) / safe)
    return s, t


def gradient_scaleinv_loss(pred_patches, target_patches, mask=None):
    """Scale/shift-aligned gradient-difference loss (reference
    ``GradientLoss``, ``utils/loss.py:95-112``)."""
    if mask is None:
        mask = jnp.ones_like(pred_patches)
    s, t = _compute_scale_and_shift(pred_patches, target_patches, mask)
    pred_ssi = s[:, None, None] * pred_patches + t[:, None, None]
    diff = pred_ssi - target_patches
    gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1])
    gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :])
    per_img = jnp.sum(gx, axis=(1, 2)) + jnp.sum(gy, axis=(1, 2))
    return jnp.sum(per_img) / pred_patches.shape[0]


def total_loss(cfg, *, rgb, target_rgb, depth_pred, mvs_out, sparse_depth_ms,
               weight_ms, target_depths, target_weights, depth_ray_mask,
               dpt_patches, n_rays_fixed: int):
    """Assemble the reference's total loss (``train.py:164-188``).

    depth_pred [N_total]; rays laid out [patches | uniform | sparse-depth].
    ``dpt_patches`` [patch_num, ps, ps] DPT prior at the patch pixels.
    """
    patch_pts = cfg.patch_num * cfg.patch_size * cfg.patch_size
    half = cfg.patch_num // 2

    loss_img = img2mse(rgb, target_rgb)

    dmask = depth_ray_mask[n_rays_fixed:]
    d = depth_pred[n_rays_fixed:]
    num = jnp.sum(((d - target_depths) ** 2) * target_weights * dmask)
    # reference takes a plain mean over its (dynamic) sparse-ray count
    # (train.py:179-180); our buffer is padded, so divide by the valid count.
    loss_nerf_depth = num / jnp.maximum(jnp.sum(dmask), 1.0)

    loss_mvs = cas_mvsnet_loss(mvs_out, sparse_depth_ms, weight_ms)

    patch_depth = depth_pred[:patch_pts].reshape(-1, cfg.patch_size,
                                                 cfg.patch_size)
    loss_smooth = edge_preserving_smoothness(patch_depth[:half],
                                             dpt_patches[:half][..., None])
    loss_scaleinv = gradient_scaleinv_loss(patch_depth[half:],
                                           dpt_patches[half:])

    loss = (cfg.w_nerf_depth * loss_nerf_depth + cfg.w_mvs * loss_mvs
            + cfg.w_smooth * loss_smooth + cfg.w_scaleinv * loss_scaleinv
            + cfg.w_img * loss_img)
    return loss, {
        "loss": loss, "img_mse": loss_img, "psnr": mse2psnr(loss_img),
        "nerf_depth": loss_nerf_depth, "mvs": loss_mvs,
        "smooth": loss_smooth, "scaleinv": loss_scaleinv,
    }


# ------------------------------------------------------------- latent APIs
# (defined-but-unused in the reference's live step; kept for API parity)

def sl1_loss(depth_pred, depth_gt, mask=None):
    """Smooth-L1 depth loss scaled by 2**(1-2) (reference ``SL1Loss``,
    ``utils/loss.py:11-27``; instantiated at train.py:41 but unused)."""
    per = smooth_l1(depth_pred, depth_gt)
    if mask is not None:
        m = mask.astype(per.dtype)
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0) * 0.5
    return jnp.mean(per) * 0.5


def compute_depth_loss(pred_depth, gt_depth):
    """Median/MAD-normalized squared depth difference (reference
    ``compute_depth_loss``, ``utils/loss.py:29-41``)."""
    t_p = jnp.median(pred_depth)
    s_p = jnp.mean(jnp.abs(pred_depth - t_p))
    t_g = jnp.median(gt_depth)
    s_g = jnp.mean(jnp.abs(gt_depth - t_g))
    return jnp.mean(((pred_depth - t_p) / s_p - (gt_depth - t_g) / s_g) ** 2)


def con_cal(pred, gt):
    """Min-max-normalized negative per-row MSE "confidence" (reference
    ``con_cal``, ``utils/loss.py:7-9``)."""
    c = -jnp.mean((pred - gt) ** 2, axis=1)
    return (c - c.min()) / (c.max() - c.min())
