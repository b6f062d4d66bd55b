"""Analytic FLOP / gather-row accounting (utils/accounting.py) — the
denominators behind bench.py's MFU and floor_bound_frac fields."""

import numpy as np

from ucnerf_tpu.config import Config
from ucnerf_tpu.utils import accounting as acc


CFG = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
             patch_size=6, patch_num=50, n_depth_rays=1024, N_samples=90)
H, W = 256, 320


def test_warp_rows_match_hand_count():
    """Stage row counts at the SCARED operating point: (V-1)*D*Hs*Ws/pack
    with pack-4 only at stage 3 (C=8) — the same counts BASELINE.md's
    round-3 floor analysis used (stage-2: 3.93M rows -> 45.6 ms floor vs
    46.4 ms measured)."""
    s1 = 6 * 48 * 64 * 80
    s2 = 6 * 32 * 128 * 160
    s3 = 6 * 8 * 256 * 320 / 4
    assert acc.warp_rows(CFG, H, W) == s1 + s2 + s3
    # stage-2 floor reproduces the measured-at-floor number from BASELINE
    floor_ms_s2 = s2 * (acc.GATHER_NS_PER_ROW + acc.SCATTER_NS_PER_ROW) / 1e6
    assert 40 < floor_ms_s2 < 50


def test_feat_rows_match_quad_count():
    """Eval frame: one quad row per (point, view) — the 44M figure from
    BASELINE.md round-2 (81920 rays x 90 samples x 6 views)."""
    rows = acc.feat_rows(CFG, H * W)
    assert abs(rows - (81920 * 90 * 6 + 81920 * 3)) < 1
    assert rows / 1e6 == np.float64(rows) / 1e6


def test_flops_scale_and_structure():
    fpn = acc.featurenet_flops(H, W)
    assert fpn > 0
    # FPN work is dominated by full/half-res convs: quartering the image
    # quarters it (to within the rounding of odd dims)
    assert abs(acc.featurenet_flops(H // 2, W // 2) - fpn / 4) / fpn < 0.01

    n = acc.nerf_mlp_flops(CFG, 1000)
    assert abs(acc.nerf_mlp_flops(CFG, 2000) - 2 * n) < 1e-6
    # per-point cost: dominated by the 6-layer 128-wide trunk
    per_pt = n / 1000
    assert 1e5 < per_pt < 1e6, per_pt

    fwd = acc.mvs_forward_flops(CFG, H, W) + acc.nerf_mlp_flops(
        CFG, CFG.n_train_rays * CFG.N_samples)
    assert acc.train_step_flops(CFG, H, W) == 3.0 * fwd


def test_perf_accounting_fields():
    """bench.py extra fields: present, finite, fractions sane for the
    round-3 measured times (193 ms step / 317 ms frame)."""
    out = acc.perf_accounting(CFG, H, W, 0.1935, 0.3175)
    for k in ("train_mfu", "render_mfu", "train_floor_bound_frac",
              "render_floor_bound_frac", "train_tflops_per_step",
              "render_tflops_per_frame", "train_achieved_tflops",
              "render_achieved_tflops", "peak_tflops", "train_bw_ms",
              "render_bw_ms", "train_bw_bound_frac", "render_bw_bound_frac",
              "train_matmul_ms", "render_matmul_ms", "train_residual_ms",
              "render_residual_ms", "peak_hbm_gbps"):
        assert k in out and np.isfinite(out[k]), k
    assert 0 < out["train_mfu"] < 1
    assert 0 < out["render_mfu"] < 1
    # the step is measurably gather-bound: a large minority-to-majority
    # fraction of wall time is issue-floor rows (lower bound — BASELINE's
    # stage-level measurements put warp+variance alone at ~62%)
    assert 0.2 < out["train_floor_bound_frac"] < 1.0, out
    assert 0.2 < out["render_floor_bound_frac"] < 1.0, out
    # eval floor: 44M quad rows at 2.9 ns ~ 130 ms of the 317 ms frame
    assert 100 < out["render_floor_ms"] < 180, out
    # the three denominators explain MOST of the wall time: the residual
    # must be a small fraction (positive or negative — families overlap)
    assert abs(out["train_residual_ms"]) < 0.5 * 193.5, out
    assert abs(out["render_residual_ms"]) < 0.5 * 317.5, out
    # bandwidth term: nonzero but not claiming the whole step
    assert 0 < out["train_bw_bound_frac"] < 0.8, out


def test_bytes_model_scales():
    """HBM-byte counts scale linearly in resolution and views."""
    b1 = acc.mvs_forward_bytes(CFG, H, W)
    assert b1 > 0
    b_half = acc.mvs_forward_bytes(CFG, H // 2, W // 2)
    assert 0.2 < b_half / b1 < 0.3          # ~4x fewer pixels everywhere
    cfg5 = CFG.replace(view_num=5)
    assert acc.mvs_forward_bytes(cfg5, H, W) < b1
    assert acc.train_step_bytes(CFG, H, W) == 3.0 * b1
    # sanity scale: the volumes at this operating point are tens-of-MB
    # class objects touched a handful of times -> a few GB per step,
    # i.e. an HBM term of single-digit ms at the 819 GB/s peak (a LOWER
    # bound — the denominator's role, like floor_ms for the gathers)
    assert 1e9 < acc.train_step_bytes(CFG, H, W) < 2e10


def test_achieved_ns_per_row_fields():
    """Measured-probe plumbing: achieved ns/row + overlap efficiency."""
    rows_w = acc.warp_rows(CFG, H, W)
    floor_s = rows_w * (acc.GATHER_NS_PER_ROW + acc.SCATTER_NS_PER_ROW) * 1e-9
    out = acc.perf_accounting(CFG, H, W, 0.1935, 0.3175,
                              warp_fwd_bwd_s=floor_s * 1.25,
                              feat_fwd_s=0.2)
    a = out["achieved_ns_per_row"]
    assert abs(a["warp_overlap_eff"] - 0.8) < 0.01
    assert a["warp_fwd_bwd"] > acc.GATHER_NS_PER_ROW
    assert a["featurization_fwd"] > 0
    assert 0 < a["featurization_overlap_eff"] <= 1.5
