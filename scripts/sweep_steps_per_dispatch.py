"""steps_per_dispatch 8 vs 16 on the real chip, one process, interleaved.

Round-3 TPU-pending item (docs/ROADMAP.md): the single round-3 sweep read
196.1 (K=8) vs 193.5 ms/step (K=16) in separate dispatch groups; this
interleaves the two K values so tunnel drift hits both equally.  Flip the
config default only if K=16 wins here reproducibly.

Usage: python scripts/sweep_steps_per_dispatch.py   (on the TPU)
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from ucnerf_tpu.config import Config
from ucnerf_tpu.data.synthetic import SyntheticDataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step_scan, to_device_batch)

H, W = 256, 320
cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
             patch_size=6, patch_num=50, n_depth_rays=1024, N_samples=90,
             num_epochs=30, chunk=1024)
ds = SyntheticDataset("", split="train", n_views=7, img_wh=(W, H),
                      n_depth_rays=1024, n_sparse=1024, n_images=16)
nerf, mvs = create_models(cfg)
params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
tx = make_optimizer(cfg, steps_per_epoch=200)
batch = to_device_batch(ds[0])
key = jax.random.PRNGKey(1)

steps = {}
for K in (8, 16):
    sstep = make_train_step_scan(cfg, nerf, mvs, tx)
    batches = jax.tree.map(lambda x: jnp.stack([x] * K), batch)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, m = sstep(state, batches, jax.random.split(sub, K))
        float(m["loss"])
    steps[K] = (sstep, batches, state)

# interleave measurements so tunnel drift hits both K equally
times = {8: [], 16: []}
for rep in range(10):
    for K in (8, 16):
        sstep, batches, state = steps[K]
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = sstep(state, batches, jax.random.split(sub, K))
        float(m["loss"])
        times[K].append((time.perf_counter() - t0) / K)
        steps[K] = (sstep, batches, state)
for K in (8, 16):
    print(f"K={K}: {np.median(times[K]) * 1e3:.1f} ms/step "
          f"(n={len(times[K])})", flush=True)
