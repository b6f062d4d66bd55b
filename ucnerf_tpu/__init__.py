"""ucnerf_tpu — a TPU-native JAX framework with the capabilities of UC-NeRF.

Rebuilds wrld/UC-NeRF (uncertainty-aware conditional NeRF from sparse endoscopic
views, TMI 2024) as an idiomatic jit/pjit/Pallas pipeline:

- ``ops``      — pure geometry / sampling / resampling kernels (ray generation,
                 plane-sweep homography warp, trilinear cost-volume gather, NDC,
                 stratified + inverse-CDF depth sampling, alpha compositing).
- ``models``   — Flax modules: CascadeMVSNet consistency learner and the
                 dual-head (base/adaptive) uncertainty-blended NeRF MLP.
- ``render``   — volume rendering: point featurization + MLP query + compositing.
- ``train``    — jitted train step, the 5-term loss, optax Adam + cosine LR,
                 orbax checkpointing.
- ``data``     — COLMAP ingestion, LLFF pose pipeline, SCARED/Hamlyn/finetune
                 datasets behind one registry, synthetic scenes for tests/bench.
- ``parallel`` — jax.sharding meshes; scene-data-parallel train step and
                 ray-sharded eval rendering.
- ``eval``     — PSNR/SSIM/LPIPS + median-scaled depth metrics.
- ``pallas``   — fused TPU kernels for the hot paths.

Reference behavior citations use ``file:line`` into the upstream repo
(mounted read-only); see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
