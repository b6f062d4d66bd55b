"""Measure the finetune-mode train step (frozen Consistency Learner).

``--finetune`` freezes the MVS cascade (reference ``network/models.py:
249-250``); since the loss stop-gradients the MVS tree (train/loop.py::
scene_inputs), XLA prunes the entire cascade backward at trace time —
this script measures what that buys at the full SCARED operating point
vs the standard (MVS-trainable) step, both in the same process with the
K-steps-per-dispatch production path.

Run from the repo root on the TPU:  python scripts/bench_finetune.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()
enable_compile_cache()

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step_scan, to_device_batch)

H, W = 256, 320
WARMUP, ITERS = 4, 8


def measure(cfg, label):
    from ucnerf_tpu.data.synthetic import SyntheticDataset
    ds = SyntheticDataset("", split="train", n_views=cfg.view_num,
                          img_wh=(W, H), n_depth_rays=cfg.n_depth_rays,
                          n_sparse=1024, n_images=16)
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
    tx = make_optimizer(cfg, steps_per_epoch=200)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    K = cfg.steps_per_dispatch
    sstep = make_train_step_scan(cfg, nerf, mvs, tx)
    batch = to_device_batch(ds[0])
    batches = jax.tree.map(lambda x: jnp.stack([x] * K), batch)
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = sstep(state, batches, jax.random.split(sub, K))
        float(metrics["loss"])          # value-fetch sync (BASELINE.md)
    times = []
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = sstep(state, batches, jax.random.split(sub, K))
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    print(f"{label}: {dt * 1e3:.1f} ms/step "
          f"({cfg.n_train_rays / dt:,.0f} rays/s)  K={K}")
    return dt


def main():
    base = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                  patch_size=6, patch_num=50, n_depth_rays=1024,
                  N_samples=90, num_epochs=30, chunk=1024)
    dt_std = measure(base, "standard (MVS trainable)")
    dt_ft = measure(base.replace(finetune="scan0"),
                    "finetune (MVS frozen, backward pruned)")
    print(f"finetune speedup: {dt_std / dt_ft:.2f}x")


if __name__ == "__main__":
    main()
