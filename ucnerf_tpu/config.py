"""Configuration for ucnerf_tpu.

Mirrors the reference's configargparse surface (reference ``opt.py:3-113``) as a
frozen dataclass so the whole config is hashable and can be closed over by
``jax.jit``.  Derived fields that the reference injects post-parse
(``feat_dim`` at ``train.py:31``) are computed properties here.

Deliberate fixes vs the reference (documented, not replicated):
- ``dataset_name='finetune'`` actually resolves to a registered dataset
  (reference declares the choice at ``opt.py:33`` but never registers it in
  ``data/__init__.py:4-6`` -> KeyError).
- ``use_viewdirs`` is a real bool (reference parses it as a truthy string,
  ``opt.py:86``).

Static ray-budget fields replace the reference's dynamic ray mix
(``utils/utils.py:450-480``): patches + uniform + a fixed sparse-depth budget
with a validity mask, so every shape under jit is static.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # experiment / IO
    expname: str = "scared"
    basedir: str = "./logs/"
    datadir: str = "../../Datasets/"
    log: bool = False
    seed: int = 123456

    # data  (reference opt.py:16-22, data/scared.py:164-167)
    dataset_name: str = "scared"      # scared | hamlyn | finetune | synthetic
    # image-scale overrides.  The reference parses these (opt.py:18-19) but
    # both its datasets HARDCODE their downsample (data/scared.py:164,
    # data/hamlyn.py:220) — a dead flag.  Here None means the dataset's
    # native scale (scared 0.25, hamlyn 1.0); a float actually applies.
    imgScale_train: Optional[float] = None
    imgScale_test: Optional[float] = None
    img_wh: Tuple[int, ...] = ()      # synthetic-dataset render size (W H);
                                      # empty = the dataset default (64 32).
                                      # Lets CLI flows (train/render_path/
                                      # bench) run the procedural scene at an
                                      # arbitrary operating point.
    img_downscale: float = 1.0
    pad: int = 0
    view_num: int = 5                 # V: 1 target + (V-1) source views
    n_scans: int = 1                  # synthetic dataset only: number of
                                      # decorrelated procedural scenes —
                                      # exercises the multi-scene regime
                                      # (metas spanning scans, per-scan val
                                      # metrics, store view padding) with
                                      # no external data

    # ray budget (reference opt.py:20-24, 80; utils/utils.py:434,450-480)
    samples_per_scene: int = 200      # train metas per scene per epoch
                                      # (reference data/scared.py:255)
    batch_size: int = 2000            # N_rays: patch + uniform rays per step
    patch_size: int = 6
    patch_num: int = 50
    n_depth_rays: int = 1024          # static budget for sparse-COLMAP-depth rays
                                      # (reference caps rays_depth at 1024,
                                      # data/scared.py:503)
    N_samples: int = 90               # depth samples/ray; 3 cascade stages x 30

    # MLP (reference opt.py:40-51, 88-93)
    netdepth: int = 6
    netwidth: int = 128
    multires: int = 10
    multires_views: int = 4
    skips: Tuple[int, ...] = (4,)
    net_type: str = "v0"

    # MVS cascade (reference network/mvs_models.py:649-650)
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: Tuple[int, ...] = (4, 2, 1)

    # training (reference opt.py:52-68, train.py:85-92)
    lrate: float = 6e-4
    num_epochs: int = 100
    lr_scheduler: str = "cosine"      # cosine | steplr | poly
    decay_step: Tuple[int, ...] = (8000, 18000, 25000)
    decay_gamma: float = 0.5
    warmup_epochs: int = 0
    chunk: int = 1024                 # eval render rays per tile (static);
                                      # swept on v5e: 1024 is the optimum
                                      # (225k rays/s vs 149k at 8192) — and
                                      # happens to match the reference default
    eval_unroll: int = 16             # tile-loop unroll (lax.scan unroll=k):
                                      # k>1 lets XLA interleave tile i+1's
                                      # gather storm with tile i's MLP
                                      # matmuls; two v5e sweeps: 348 (k=1)
                                      # -> ~320 (k=8) -> ~317 ms (k=16),
                                      # flat beyond (BASELINE.md round-3)
    finetune: Optional[str] = None    # scene name -> freeze MVS net
                                      # (reference network/models.py:249-250)
    mvs_only: bool = False            # pretrain the Consistency Learner from
                                      # scratch: optimize cas_mvsnet_loss
                                      # alone (reference
                                      # network/mvs_models.py:512-533), no
                                      # rays/NeRF/render.  Replaces the
                                      # reference's only unresolvable
                                      # external dependency — its hardcoded
                                      # casmvsnet.ckpt download
                                      # (network/models.py:240-248) — with an
                                      # in-tree bootstrap; resume the full
                                      # objective from the resulting
                                      # checkpoint via --ckpt.
    ckpt: Optional[str] = None
    ckpt_params_only: bool = False    # load ONLY the parameters from an
                                      # orbax --ckpt dir (fresh optimizer,
                                      # step 0) — the cross-OBJECTIVE seed
                                      # for phase hand-offs: an --mvs_only
                                      # boot checkpoint seeding a full run,
                                      # or a full checkpoint seeding a
                                      # --finetune refine.  Without it an
                                      # orbax --ckpt is a full resume
                                      # (step + Adam state restored), which
                                      # fast-positions past the restored
                                      # step count — wrong across a phase
                                      # boundary (with equal epoch budgets
                                      # the new phase would train 0 steps).
                                      # No effect on .tar/.ckpt/.npz seeds
                                      # (those are always params-only).
    keep_ckpts: int = 0               # prune to the newest N step_* dirs
                                      # (0 = keep all, like the reference's
                                      # 5000-step .tar dumps, train.py:404)
    eval: bool = False
    stop_after_steps: int = 0         # halt cleanly once global_step reaches
                                      # this (0 = never): saves a checkpoint
                                      # and exits WITHOUT final validation —
                                      # simulates a mid-run kill at a
                                      # dispatch boundary (kill/resume
                                      # testing; resume with --ckpt)

    # rendering (reference opt.py:34, 73-95)
    use_color_volume: bool = False    # reference --use_color_volume: project
                                      # colors into a target-frustum volume
                                      # once per frame (approximate colors,
                                      # far fewer gathers)
    color_volume_depths: int = 48
    encode_a: bool = False            # appearance embedding (NeRF-A); the
                                      # reference creates+optimizes it but the
                                      # live render path does not consume it
                                      # (network/models.py:237-239) — same here
    N_vocab: int = 100
    N_a: int = 48
    perturb: float = 1.0
    # accepted-but-inert in the REFERENCE's live path too (parity): the MLP
    # hard-codes use_viewdirs=True (network/models.py:197) and rendering()
    # never reads the use_viewdirs/raw_noise_std render_kwargs it is handed
    # (network/models.py:274-276) — kept for CLI compatibility only.
    use_viewdirs: bool = True
    raw_noise_std: float = 0.0
    white_bkgd: bool = False

    # loss weights (reference train.py:185-188)
    w_nerf_depth: float = 0.05
    w_mvs: float = 0.05
    w_smooth: float = 0.05
    w_scaleinv: float = 0.008
    w_img: float = 5.0

    # parallelism (no reference equivalent; reference is single-GPU,
    # train.py:433).  With --mesh_shape N > 1 training runs data-parallel
    # over an N-device mesh; --parallel_mode picks the semantics:
    # - "rays" (default): ONE scene per step, its [patches|uniform|sparse]
    #   ray batch sharded over the mesh after a replicated MVS forward,
    #   gradients psum'd.  Preserves the reference's 1-scene/step training
    #   regime exactly (same batch, same objective) — N chips accelerate
    #   the reference workload.
    # - "scenes": N scenes per step, one per device, mean-reduced gradients.
    #   This is an N-fold EFFECTIVE BATCH INCREASE vs the reference (fewer
    #   optimizer steps per epoch at lower gradient variance); consider
    #   scaling --lrate up (linear-scaling rule) and note that checkpoints
    #   at "step K" have seen N*K scenes.  Highest throughput when scenes
    #   are plentiful.
    # - "grid": the two composed on a 2D mesh — `--mesh_shape S R
    #   --mesh_axes data rays` trains S scenes/step with each scene's rays
    #   sharded R-way, a middle point between the S=N effective batch of
    #   "scenes" and the S=1 of "rays" on large meshes.  Same
    #   effective-batch/LR note as "scenes" with N = S = mesh_shape[0].
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    parallel_mode: str = "rays"   # rays | scenes | grid (see mesh_shape note)

    # with --parallel_mode rays, also shard the MVS cascade's per-view work
    # (FeatureNet + plane-sweep warp/variance partial sums, psum-reduced)
    # over the same mesh axis instead of replicating the whole cascade on
    # every device (parallel/mvs_views.py).  Semantics-preserving like ray
    # mode itself (equal up to float summation order; tested).  Off by
    # default: on a SINGLE device it only adds masked padding work; turn on
    # for real multi-chip ray-DP training, where the replicated cascade is
    # the Amdahl bottleneck (it dominates the single-chip step profile).
    shard_mvs_views: bool = False

    # single-device training steps executed per host dispatch (lax.scan
    # inside one jit).  The axon/TPU tunnel costs ~32 ms per synced call;
    # K amortizes it (v5e sweeps: 228 ms/step at K=1, 202 at K=4, 196 at
    # K=8, 193 at K=16) with identical training semantics (tested
    # scan==sequential).  K=16 confirmed fastest in two independent
    # sweeps, the second interleaving K=8/16 in one process so tunnel
    # drift hits both equally (196.7 vs 193.9 ms — see
    # scripts/sweep_steps_per_dispatch.py); the host stages K stacked
    # scene samples per dispatch, so larger K buys staging memory for
    # <1%.  The epoch tail that doesn't fill a group runs with a K=1
    # step.  Set 1 to dispatch every step.
    steps_per_dispatch: int = 16

    # validation cadence: every N epochs.  Deviation from the reference,
    # which validates every epoch via Lightning (train.py:444-447) — set 1
    # for exact parity; 2 halves eval cost with no training effect.
    val_every_epochs: int = 2

    # validation panel images (the reference writes a matplotlib 2x2 panel
    # per val view EVERY validation, train.py:294-316 — hundreds of ms of
    # host IO per view on a 1-core host).  "final": panels only at the
    # final validation of the run (and under --eval) — the deliberate
    # default, since mid-run panels mostly go unlooked-at while their IO
    # dominates validation wall time; "all": reference parity; "none":
    # never.  Panel writes run on a worker thread either way, overlapping
    # the metric computation + device fetches.
    val_panels: str = "final"         # all | final | none

    # stratified-jitter the eval-time depth candidates, like the reference
    # does even at eval (utils/utils.py:705-706).  Default off (deterministic
    # midpoint renders are reproducible); turn on for reference-parity runs.
    eval_jitter: bool = False

    # Device-resident scene store (data/device_store.py): each scan's
    # arrays upload ONCE and the jitted step gathers samples by index —
    # per step the host ships ~10 KB instead of ~35 MB.  Bit-exact vs
    # host loading (tested).  Measured end-to-end (round-4 soak): host
    # loading sustains only ~380 ms/step against the 193 ms synced step;
    # the store closes that gap.  Feeds EVERY mode: serial, ray-DP
    # (store replicated over the mesh), scene-DP and grid (S index
    # payloads per dispatch, gathered + scene-sharded inside the jit).
    # Costs HBM (full SCARED scene set: a few hundred MB, replicated
    # per device under multi-chip; the store prints its size at
    # startup) — turn off if the scene set outgrows the chip.
    device_dataset: bool = True

    # featurization path: True = per-ray column-gather fast path
    # (render/fast_feats.py, fp-equal to the literal formulation, tested);
    # False = the literal reference formulation (render/renderer.py).
    # Exists mainly so convergence A/B tests can pin either path.
    fast_featurization: bool = True

    # space-folded FeatureNet FPN (models/layers.py::SpaceFolded): every 2D
    # conv runs space-to-depth folded at stage-1 resolution with f^2-wider
    # channels — same math + param tree (tested), MXU-lane-efficient where
    # the C=3..32 convs are latency-bound on TPU.  Measured (BASELINE.md):
    # 3.2x/4.7x faster standalone (fwd / fwd+bwd) but neutral-to-slower
    # inside the train step / eval frame / finetune step, where XLA hides
    # the plain featnet under warp+MLP phases — hence default OFF; useful
    # where featnet runs alone (e.g. serving feature-cache precompute).
    # (The depth-folded CostRegNet analogue is always on; no config knob.)
    folded_featnet: bool = False

    # precision
    mvs_dtype: str = "float32"        # compute dtype for the MVS cascade
    nerf_dtype: str = "bfloat16"      # NeRF MLP matmul dtype (params f32);
                                      # set float32 for bit-level parity work
    use_pallas: bool = False          # fused Pallas MLP kernel in the eval
                                      # render. 5.5x vs XLA when the feature
                                      # tensor is already materialized, but
                                      # SLOWER inside the fused frame (the
                                      # kernel boundary forces [N,S,97] to
                                      # HBM that XLA otherwise fuses away) —
                                      # measured 551 -> 951 ms/frame. Kept
                                      # for standalone-MLP workloads.

    # observability (SURVEY.md §5.1-5.2; no reference equivalent)
    profile_dir: Optional[str] = None  # write a jax.profiler trace here
    debug_nans: bool = False           # jax debug_nans (reference's always-on
                                       # anomaly mode, made opt-in)

    # ------------------------------------------------------------------ derived
    @property
    def feat_dim(self) -> int:
        """Point-feature channel count (reference train.py:31):
        24 cost-volume ch + (V-1)*(4 color+mask + 8 img-feat) + 1 confidence."""
        return 24 + (self.view_num - 1) * (4 + 8) + 1

    @property
    def n_patch_rays(self) -> int:
        return self.patch_num * self.patch_size * self.patch_size

    @property
    def n_uniform_rays(self) -> int:
        return self.batch_size - self.n_patch_rays

    @property
    def n_train_rays(self) -> int:
        """Total rays per train step: batch_size + sparse-depth budget."""
        return self.batch_size + self.n_depth_rays

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------- presets
# Mirror the reference's shell scripts (scripts/train_scared.sh,
# scripts/train_hamlyn.sh, scripts/eval.sh).
PRESETS = {
    "train_scared": dict(dataset_name="scared", view_num=7, lrate=2e-4,
                         num_epochs=30, patch_size=6, patch_num=50),
    "train_hamlyn": dict(dataset_name="hamlyn", view_num=7, lrate=2e-4,
                         num_epochs=30, patch_size=4, patch_num=50),
    "eval_scared": dict(dataset_name="scared", view_num=7, eval=True),
    "eval_hamlyn": dict(dataset_name="hamlyn", view_num=7, eval=True),
}


def _add_args(parser: argparse.ArgumentParser) -> None:
    # default=SUPPRESS so only flags the user actually typed land in the
    # namespace — an explicit flag equal to the dataclass default must still
    # override a preset.
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = f.default
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(name, action="store_true",
                                default=argparse.SUPPRESS)
        elif isinstance(default, tuple):
            parser.add_argument(name, nargs="+",
                                type=type(default[0]) if default else int,
                                default=argparse.SUPPRESS)
        elif default is None:
            parser.add_argument(name, type=str, default=argparse.SUPPRESS)
        else:
            parser.add_argument(name, type=type(default),
                                default=argparse.SUPPRESS)


def parse_config(argv=None) -> Config:
    """CLI → Config.  Supports ``--preset`` and ``--config <json>`` overrides."""
    parser = argparse.ArgumentParser("ucnerf_tpu")
    parser.add_argument("--preset", type=str, default=None,
                        choices=sorted(PRESETS.keys()))
    parser.add_argument("--config", type=str, default=None,
                        help="JSON file with config overrides")
    _add_args(parser)
    ns = parser.parse_args(argv)

    overrides = {}
    if ns.config:
        with open(ns.config) as fh:
            overrides.update(json.load(fh))
    if ns.preset:
        overrides.update(PRESETS[ns.preset])

    cli = {k: (tuple(v) if isinstance(v, list) else v)
           for k, v in vars(ns).items() if k not in ("preset", "config")}
    overrides.update(cli)  # explicit CLI wins over preset/json
    return Config(**overrides)
