"""A/B: end-to-end production train loop with host-loaded samples vs the
device-resident scene store (``data/device_store.py``).

bench.py measures the SYNCED step (193 ms at round 3); the production loop
sustains only ~380 ms/step (round-4 soak) because each step ships a ~35 MB
host-assembled sample over the tunnel (~600 MB per K=16 dispatch) from a
1-core host.  This measures the loop the way train.py actually runs it:
ThreadPrefetcher(depth=2) feeding K-step scan dispatches, NO per-dispatch
sync, a metrics value-fetch every 50 steps — then times a fixed window of
steps from first dispatch to final fetch.
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
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.data.device_store import (build_store, sample_indices,
                                          store_nbytes)
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step_scan,
                                   make_train_step_scan_store,
                                   to_device_batch)
from ucnerf_tpu.utils.prefetch import ThreadPrefetcher

H, W = 256, 320
WARM_DISPATCHES = 3
TIMED_DISPATCHES = 12


def run_arm(name, make_loader, dispatch):
    # warmup (compile + tunnel settling)
    for payload in make_loader(WARM_DISPATCHES):
        m = dispatch(payload)
    float(m["loss"])
    t0 = time.perf_counter()
    for payload in make_loader(TIMED_DISPATCHES):
        m = dispatch(payload)
    float(m["loss"])                      # one sync at the window end,
    dt = time.perf_counter() - t0         # like train.py's 50-step fetch
    K = Config().steps_per_dispatch
    ms = dt * 1e3 / (TIMED_DISPATCHES * K)
    print(f"{name:6s}: {ms:7.2f} ms/step end-to-end "
          f"({TIMED_DISPATCHES * K} steps, K={K} pipelined)")
    return ms


def main():
    cfg = Config(dataset_name="synthetic", img_wh=(W, H), view_num=7,
                 batch_size=2000, patch_size=6, patch_num=50,
                 n_depth_rays=1024, N_samples=90, num_epochs=30,
                 lrate=2e-4, chunk=1024)
    ds = build_dataset(cfg.replace(datadir=""), "train")
    nerf, mvs = create_models(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    K = cfg.steps_per_dispatch
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))

    store = build_store(ds)
    print(f"store: {store_nbytes(store) / 1e6:.0f} MB device-resident")

    def host_loader(n):
        def load(i):
            samples = [ds[(i * K + j) % len(ds)] for j in range(K)]
            return to_device_batch(
                jax.tree.map(lambda *xs: np.stack(xs), *samples))
        return ThreadPrefetcher((lambda i=i: load(i) for i in range(n)),
                                depth=2)

    def index_loader(n):
        def load(i):
            inds = [sample_indices(ds, (i * K + j) % len(ds))
                    for j in range(K)]
            return to_device_batch(
                jax.tree.map(lambda *xs: np.stack(xs), *inds))
        return ThreadPrefetcher((lambda i=i: load(i) for i in range(n)),
                                depth=2)

    results = {}
    for arm in ("host", "store"):         # store second: tunnel settled
        state = TrainState(params, tx.init(params),
                           jnp.zeros((), jnp.int32))
        key = jax.random.PRNGKey(1)
        if arm == "host":
            step = make_train_step_scan(cfg, nerf, mvs, tx)

            def dispatch(payload):
                nonlocal state, key
                key, sub = jax.random.split(key)
                state, m = step(state, payload, jax.random.split(sub, K))
                return m
            results[arm] = run_arm(arm, host_loader, dispatch)
        else:
            sstep = make_train_step_scan_store(cfg, nerf, mvs, tx)

            def dispatch(payload):
                nonlocal state, key
                key, sub = jax.random.split(key)
                state, m = sstep(state, store, payload,
                                 jax.random.split(sub, K))
                return m
            results[arm] = run_arm(arm, index_loader, dispatch)

    print(f"speedup: {results['host'] / results['store']:.2f}x; "
          f"store rays/s: {cfg.n_train_rays / results['store'] * 1e3:,.0f}")


if __name__ == "__main__":
    main()
