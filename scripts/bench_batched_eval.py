"""Measure batched (vmapped) multi-frame eval rendering for serving.

Hypothesis: the eval frame's featurization gathers run at ~6.4 ns/row
effective vs the measured ~2.9 ns/row parallel-issue floor (BASELINE.md
round-3 notes), so rendering B independent frames in ONE dispatch
(jax.vmap over the frame batch; each frame keeps its own cascade +
volumes) may expose enough extra independent issue parallelism to raise
serving THROUGHPUT (frames/s) above the pipelined 1-frame path, at the
cost of latency.  Tile interleave (eval_unroll=16) already overlaps 16
tiles within a frame; this tests whether cross-frame work adds more.

Methodology mirrors bench.py: value-fetch sync on every timed call
(axon gotchas #1/#2), median over ITERS calls (gotcha #3), one process,
single chip.  Run:  python scripts/bench_batched_eval.py
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
from ucnerf_tpu.train.loop import make_eval_render, to_device_batch

H, W = 256, 320
WARMUP = 3
ITERS = 10


def median_time(fn, sync, warmup=WARMUP, iters=ITERS):
    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                 patch_size=6, patch_num=50, n_depth_rays=1024,
                 N_samples=90, num_epochs=30, chunk=1024)
    ds = SyntheticDataset("", split="train", n_views=cfg.view_num,
                          img_wh=(W, H), n_depth_rays=cfg.n_depth_rays,
                          n_sparse=1024, n_images=16)
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))

    # distinct target poses per frame in the batch
    samples = [ds[i] for i in range(4)]
    render = make_eval_render(cfg, nerf, mvs, (H, W))

    batch1 = to_device_batch(samples[0])
    dt1 = median_time(lambda: render(params, batch1),
                      lambda out: float(jnp.sum(out[0])))
    results = {"B1_ms_per_frame": round(dt1 * 1e3, 1)}
    print(f"B=1: {dt1 * 1e3:.1f} ms/frame "
          f"({H * W / dt1 / 1e3:.0f}k rays/s)", flush=True)

    for B in (2, 4):
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *samples[:B])
        brender = jax.jit(jax.vmap(render, in_axes=(None, 0)))
        dt = median_time(lambda: brender(params, stacked),
                         lambda out: float(jnp.sum(out[0])))
        per = dt / B
        results[f"B{B}_ms_per_frame"] = round(per * 1e3, 1)
        print(f"B={B}: {dt * 1e3:.1f} ms/dispatch = {per * 1e3:.1f} "
              f"ms/frame ({H * W / per / 1e3:.0f}k rays/s, "
              f"{dt1 / per:.2f}x vs B=1)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
