"""Analytic FLOP / gather-row accounting for MFU and floor-utilization.

bench.py's ``vs_baseline`` is round-over-round; these denominators make the
absolute claims auditable (VERDICT round-3 items 2/10):

- **MFU** = achieved model FLOP/s over the chip's peak matmul rate.  FLOPs
  are counted analytically over the matmul/conv work ONLY (cascade convs +
  NeRF MLP matmuls, 2*K*Cin*Cout*N each; backward = 2x forward for the
  dgrad+wgrad pair, so a train step is 3x its forward) — the standard
  "model FLOPs" MFU convention; elementwise/softmax/normalization work is
  deliberately excluded.  Peak defaults to the v5e bf16 MXU rate
  (197 TFLOP/s); the cascade runs f32 by default, whose true ceiling is
  lower (the MXU is a bf16 engine; f32 runs as multi-pass), so reported
  MFU is a conservative lower bound on utilization of the achievable rate.
- **floor_bound_frac** = the fraction of the measured wall time accounted
  for by gather/scatter rows priced at the MEASURED issue floors
  (BASELINE.md round-3, parallel-issue marginal cost: gathers 2.9 ns/row,
  scatter-adds 8.7 ns/row).  The warp+variance phase is measured AT this
  floor, so a step with floor_bound_frac f cannot be sped up more than
  (1-f)x by reformulating the non-gather phases — recorded so future
  rounds stop re-litigating formulation wins that are measured impossible.

Row counts per phase:
- plane-sweep warp (``models/mvs.py::_variance_cost_volume``): one gather
  row per (source view, depth plane, output pixel) / pack; the backward is
  the same count of scatter-add rows into the source map.
- featurization (``render/fast_feats.py``): one 2x2-quad-packed row per
  (sample point, source view) covering the 11 packed channels (3 rgb +
  8 img_feat); cost-volume column gathers are one row per (ray, stage) —
  negligible next to the per-point rows but counted.
"""

from __future__ import annotations

import os
from typing import Dict

# measured on v5e, BASELINE.md round-3 (parallel-issue marginal cost)
GATHER_NS_PER_ROW = 2.9
SCATTER_NS_PER_ROW = 8.7

# v5e peak bf16 MXU rate; override for other chips via UCNERF_PEAK_TFLOPS
PEAK_TFLOPS = float(os.environ.get("UCNERF_PEAK_TFLOPS", 197.0))


def _conv2d(cin: int, cout: int, k: int, n_px: int, kw: int = None) -> float:
    return 2.0 * k * (kw if kw is not None else k) * cin * cout * n_px


def _conv3d(cin: int, cout: int, k: int, n_vox: int) -> float:
    return 2.0 * k ** 3 * cin * cout * n_vox


def _dense(cin: int, cout: int, n: int) -> float:
    return 2.0 * cin * cout * n


def featurenet_flops(H: int, W: int, bc: int = 8) -> float:
    """FPN forward for ONE view (``models/mvs.py::FeatureNet``)."""
    full, half, quart = H * W, (H // 2) * (W // 2), (H // 4) * (W // 4)
    f = 0.0
    f += _conv2d(3, bc, 3, full) + _conv2d(bc, bc, 3, full)
    f += _conv2d(bc, 2 * bc, 5, half) + 2 * _conv2d(2 * bc, 2 * bc, 3, half)
    f += (_conv2d(2 * bc, 4 * bc, 5, quart)
          + 2 * _conv2d(4 * bc, 4 * bc, 3, quart))
    f += _conv2d(4 * bc, 4 * bc, 1, quart)          # out1
    f += _conv2d(2 * bc, 4 * bc, 1, half)           # inner1
    f += _conv2d(4 * bc, 2 * bc, 3, half)           # out2
    f += _conv2d(bc, 4 * bc, 1, full)               # inner2
    f += _conv2d(4 * bc, bc, 3, full)               # out3
    return f


def costreg_flops(D: int, H: int, W: int, cin: int, bc: int = 8) -> float:
    """3D U-Net forward for one stage volume [D, H, W, cin]
    (``models/mvs.py::CostRegNet``; depth-folding changes the lowering,
    not the mathematical FLOPs)."""
    n = D * H * W
    n2, n4, n8 = n // 8, n // 64, n // 512
    f = _conv3d(cin, bc, 3, n)
    f += _conv3d(bc, 2 * bc, 3, n2) + _conv3d(2 * bc, 2 * bc, 3, n2)
    f += _conv3d(2 * bc, 4 * bc, 3, n4) + _conv3d(4 * bc, 4 * bc, 3, n4)
    f += _conv3d(4 * bc, 8 * bc, 3, n8) + _conv3d(8 * bc, 8 * bc, 3, n8)
    f += _conv3d(8 * bc, 4 * bc, 3, n4)             # deconvs: priced at
    f += _conv3d(4 * bc, 2 * bc, 3, n2)             # output voxel count
    f += _conv3d(2 * bc, bc, 3, n)
    f += _conv3d(bc, 1, 3, n)                       # prob head
    return f


def _stage_dims(cfg, H: int, W: int):
    """(D, H_s, W_s, C_feat) per cascade stage (scales 4/2/1, channels
    32/16/8 — ``models/mvs.py:360-362``, ``mvs_models.py:649``)."""
    chans = (32, 16, 8)
    out = []
    for si, D in enumerate(cfg.ndepths):
        scale = 2 ** (len(cfg.ndepths) - 1 - si)
        hs, ws = H // scale, W // scale
        if si == len(cfg.ndepths) - 1 and cfg.pad:
            hs, ws = hs + 2 * cfg.pad, ws + 2 * cfg.pad
        out.append((D, hs, ws, chans[si]))
    return out


def mvs_forward_flops(cfg, H: int, W: int) -> float:
    """Cascade forward: (V-1) FPN views + 3 CostRegNets."""
    f = (cfg.view_num - 1) * featurenet_flops(H, W)
    for (D, hs, ws, C) in _stage_dims(cfg, H, W):
        f += costreg_flops(D, hs, ws, C)
    return f


def nerf_mlp_flops(cfg, n_pts: int) -> float:
    """UC-NeRF MLP forward for n_pts sample points
    (``models/nerf.py``; dims from the reference ``network/models.py:87-91``)."""
    Wd = 128
    v1 = cfg.view_num - 1
    pts_ch = 3 + 3 * 2 * cfg.multires            # 63
    dir_ch = 3 + 3 * 2 * cfg.multires_views      # 27
    f = _dense(24 + 4 * v1, Wd, n_pts)           # pts_bias_depth_fine
    f += _dense(8 * v1, Wd, n_pts)               # pts_bias_confidence
    f += _dense(pts_ch, Wd, n_pts)               # trunk layer 0
    for i in range(1, cfg.netdepth):
        cin = Wd + (pts_ch if (i - 1) in cfg.skips else 0)
        f += _dense(cin, Wd, n_pts)
    f += _dense(Wd, 3, n_pts) + _dense(Wd, 1, n_pts)   # base heads
    f += _dense(Wd, Wd, n_pts)                   # feature_linear
    h1 = Wd + dir_ch
    f += 2 * (_dense(h1, Wd // 2, n_pts))        # views / view_confi
    f += _dense(Wd // 2, 3, n_pts) + _dense(Wd // 2, 1, n_pts)
    return f


def train_step_flops(cfg, H: int, W: int) -> float:
    """One train step's matmul/conv FLOPs: forward + backward (2x)."""
    fwd = (mvs_forward_flops(cfg, H, W)
           + nerf_mlp_flops(cfg, cfg.n_train_rays * cfg.N_samples))
    return 3.0 * fwd


def eval_frame_flops(cfg, H: int, W: int) -> float:
    """Full-frame eval render: cascade forward + MLP over H*W rays."""
    return (mvs_forward_flops(cfg, H, W)
            + nerf_mlp_flops(cfg, H * W * cfg.N_samples))


def warp_rows(cfg, H: int, W: int) -> float:
    """Plane-sweep warp gather rows for one cascade forward."""
    from ucnerf_tpu.models.mvs import warp_pack_factor
    rows = 0.0
    for (D, hs, ws, C) in _stage_dims(cfg, H, W):
        rows += (cfg.view_num - 1) * D * hs * ws / warp_pack_factor(C, ws)
    return rows


def feat_rows(cfg, n_rays: int) -> float:
    """Featurization gather rows: one quad row per (point, view) + one
    cost-volume column row per (ray, stage)."""
    return (n_rays * cfg.N_samples * (cfg.view_num - 1)
            + n_rays * len(cfg.ndepths))


def train_floor_seconds(cfg, H: int, W: int) -> float:
    """Issue-floor seconds of the train step's gather/scatter phases:
    warp + featurization rows forward (gathers) and backward
    (scatter-adds into the source maps)."""
    rows = warp_rows(cfg, H, W) + feat_rows(cfg, cfg.n_train_rays)
    return rows * (GATHER_NS_PER_ROW + SCATTER_NS_PER_ROW) * 1e-9


def eval_floor_seconds(cfg, H: int, W: int) -> float:
    """Issue-floor seconds of the eval frame (forward only)."""
    rows = warp_rows(cfg, H, W) + feat_rows(cfg, H * W)
    return rows * GATHER_NS_PER_ROW * 1e-9


def perf_accounting(cfg, H: int, W: int, train_step_s: float,
                    eval_frame_s: float) -> Dict:
    """The bench.py 'extra' fields backing MFU / floor claims."""
    t_fl = train_step_flops(cfg, H, W)
    e_fl = eval_frame_flops(cfg, H, W)
    t_floor = train_floor_seconds(cfg, H, W)
    e_floor = eval_floor_seconds(cfg, H, W)
    return {
        "train_tflops_per_step": round(t_fl / 1e12, 4),
        "train_achieved_tflops": round(t_fl / train_step_s / 1e12, 2),
        "train_mfu": round(t_fl / train_step_s / (PEAK_TFLOPS * 1e12), 4),
        "train_floor_ms": round(t_floor * 1e3, 1),
        "train_floor_bound_frac": round(t_floor / train_step_s, 3),
        "render_tflops_per_frame": round(e_fl / 1e12, 4),
        "render_achieved_tflops": round(e_fl / eval_frame_s / 1e12, 2),
        "render_mfu": round(e_fl / eval_frame_s / (PEAK_TFLOPS * 1e12), 4),
        "render_floor_ms": round(e_floor * 1e3, 1),
        "render_floor_bound_frac": round(e_floor / eval_frame_s, 3),
        "peak_tflops": PEAK_TFLOPS,
        "floor_ns_per_row": [GATHER_NS_PER_ROW, SCATTER_NS_PER_ROW],
    }
