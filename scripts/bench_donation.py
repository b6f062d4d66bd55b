"""A/B: buffer donation of the train state (params+opt_state) in the
K-step scan dispatch.

``jax.jit(..., donate_argnums=0)`` lets XLA alias the input state buffers
into the outputs, saving one params+opt-state HBM copy per dispatch and
halving the state's peak footprint.  At this model size (~10s of MB) the
copy is sub-millisecond at HBM bandwidth, so the expected speed effect is
small — this measures whether it is real on the axon v5e before adopting
it in production (the caller contract change — the input state is dead
after the call — is only worth it for a measured win or for models big
enough that the footprint matters).

Both arms come from the SAME factory (``make_train_step_scan(donate=...)``)
so the A/B always measures the production scan body.  Methodology per
BASELINE.md: value-fetch sync, interleaved A/B, medians; the [K] key
batches are precomputed outside the timed region so ms/step reflects only
the scan dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()
enable_compile_cache()

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step_scan, to_device_batch)

H, W = 256, 320
WARMUP = 6
ITERS = 12


def main():
    cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                 patch_size=6, patch_num=50, n_depth_rays=1024, N_samples=90,
                 num_epochs=30, chunk=1024)
    from ucnerf_tpu.data.synthetic import SyntheticDataset
    ds = SyntheticDataset("", split="train", n_views=cfg.view_num,
                          img_wh=(W, H), n_depth_rays=cfg.n_depth_rays,
                          n_sparse=1024, n_images=16)
    nerf, mvs = create_models(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=200)
    K = cfg.steps_per_dispatch
    batch = to_device_batch(ds[0])
    batches = jax.tree.map(lambda x: jnp.stack([x] * K), batch)

    fns = {"plain": make_train_step_scan(cfg, nerf, mvs, tx),
           "donated": make_train_step_scan(cfg, nerf, mvs, tx, donate=True)}

    def fresh_state():
        params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    states = {name: fresh_state() for name in fns}
    # precompute every [K] key batch so the split's host/device dispatch
    # cost never lands inside a timed region (ADVICE round-3)
    key = jax.random.PRNGKey(1)
    key_batches = []
    for _ in range(WARMUP + ITERS):
        key, sub = jax.random.split(key)
        key_batches.append(jax.block_until_ready(jax.random.split(sub, K)))

    for keys in key_batches[:WARMUP]:
        for name in fns:
            states[name], m = fns[name](states[name], batches, keys)
            float(m["loss"])

    times = {name: [] for name in fns}
    for keys in key_batches[WARMUP:]:  # interleaved (axon settling window)
        for name in fns:
            t0 = time.perf_counter()
            states[name], m = fns[name](states[name], batches, keys)
            float(m["loss"])
            times[name].append(time.perf_counter() - t0)

    for name in fns:
        ms = np.median(times[name]) * 1e3 / K
        print(f"{name:8s}: {ms:7.2f} ms/step (K={K} amortized)")


if __name__ == "__main__":
    main()
