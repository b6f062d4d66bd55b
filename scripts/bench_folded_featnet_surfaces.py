"""A/B the space-folded FeatureNet on the eval frame and finetune step.

Follow-up to scripts/bench_folded_featnet.py, which found the standalone
featnet 3.2x/4.7x faster (fwd / fwd+bwd) but the full standard train step
marginally SLOWER (featnet hides under the warp gather/scatter phases).
This measures the two surfaces where featnet is NOT overlapped with a
cascade backward: the eval frame (featnet runs once per frame, serial
with everything) and the finetune step (cascade backward pruned).

Interleaved in one process (axon gotcha #3). Run:
  python scripts/bench_folded_featnet_surfaces.py [eval|finetune|both]
(cold compiles are long — the finetune scan step alone is ~8-10 min —
so the surfaces can run as separate invocations.)
"""

import json
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
from ucnerf_tpu.data.synthetic import SyntheticDataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_eval_render,
                                   make_optimizer, make_train_step_scan,
                                   to_device_batch)

H, W = 256, 320
WARMUP, ITERS = 3, 9


def main():
    surface = sys.argv[1] if len(sys.argv) > 1 else "both"
    base = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                  patch_size=6, patch_num=50, n_depth_rays=1024,
                  N_samples=90, num_epochs=30, chunk=1024)
    ds = SyntheticDataset("", split="train", n_views=base.view_num,
                          img_wh=(W, H), n_depth_rays=base.n_depth_rays,
                          n_sparse=1024, n_images=16)
    params = init_params(base, jax.random.PRNGKey(0), (H, W))
    batch = to_device_batch(ds[0])
    results = {}

    # ---- eval frame ----
    if surface in ("eval", "both"):
        _bench_eval(base, params, batch, results)
    if surface in ("finetune", "both"):
        _bench_finetune(base, params, batch, results)
    print(json.dumps(results))


def _bench_eval(base, params, batch, results):
    renders = {}
    for folded in (False, True):
        cfg = base.replace(folded_featnet=folded)
        nerf, mvs = create_models(cfg)
        renders[folded] = make_eval_render(cfg, nerf, mvs, (H, W))
    for folded in (False, True):   # compile both before timing
        rgb, depth, conf = renders[folded](params, batch)
        float(jnp.sum(rgb))
    for _ in range(WARMUP):
        for folded in (False, True):
            rgb, depth, conf = renders[folded](params, batch)
            float(jnp.sum(rgb) + jnp.sum(depth))
    tp, tf = [], []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        rgb, d, c = renders[False](params, batch)
        float(jnp.sum(rgb) + jnp.sum(d))
        t1 = time.perf_counter()
        rgb, d, c = renders[True](params, batch)
        float(jnp.sum(rgb) + jnp.sum(d))
        t2 = time.perf_counter()
        tp.append(t1 - t0)
        tf.append(t2 - t1)
    results["eval_frame_plain_ms"] = round(float(np.median(tp)) * 1e3, 1)
    results["eval_frame_folded_ms"] = round(float(np.median(tf)) * 1e3, 1)
    print(f"eval frame: plain {results['eval_frame_plain_ms']} ms  "
          f"folded {results['eval_frame_folded_ms']} ms", flush=True)


def _bench_finetune(base, params, batch, results):
    # finetune step (scan path, cascade backward pruned)
    tx = make_optimizer(base, steps_per_epoch=200)
    steps = {}
    states = {}
    K = base.steps_per_dispatch
    batches = jax.tree.map(lambda x: jnp.stack([x] * K), batch)
    for folded in (False, True):
        cfg = base.replace(folded_featnet=folded, finetune="scan0")
        nerf, mvs = create_models(cfg)
        steps[folded] = make_train_step_scan(cfg, nerf, mvs, tx)
        states[folded] = TrainState(params, tx.init(params),
                                    jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP + 1):
        for folded in (False, True):
            key, sub = jax.random.split(key)
            states[folded], m = steps[folded](states[folded], batches,
                                              jax.random.split(sub, K))
            float(m["loss"])
    tp, tf = [], []
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, K)
        t0 = time.perf_counter()
        states[False], m = steps[False](states[False], batches, ks)
        float(m["loss"])
        t1 = time.perf_counter()
        states[True], m = steps[True](states[True], batches, ks)
        float(m["loss"])
        t2 = time.perf_counter()
        tp.append(t1 - t0)
        tf.append(t2 - t1)
    results["finetune_step_plain_ms"] = round(
        float(np.median(tp)) / K * 1e3, 1)
    results["finetune_step_folded_ms"] = round(
        float(np.median(tf)) / K * 1e3, 1)
    print(f"finetune step: plain {results['finetune_step_plain_ms']} ms  "
          f"folded {results['finetune_step_folded_ms']} ms  (K={K})",
          flush=True)


if __name__ == "__main__":
    main()
