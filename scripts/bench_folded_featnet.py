"""A/B the space-folded FeatureNet (layers.SpaceFolded) on the real chip.

Interleaves plain and folded variants in ONE process (axon gotcha #3:
fresh-executable settling would otherwise bias whichever ran first) and
amortizes dispatch with K-iteration lax.scan phases like
scripts/profile_phases.py.  Run:  python scripts/bench_folded_featnet.py
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
from ucnerf_tpu.models.mvs import FeatureNet
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step, to_device_batch)

H, W = 256, 320
K = 8
WARMUP = 2
ITERS = 7


def timed(fn):
    for _ in range(WARMUP):
        float(fn())
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_phase(body, keys):
    @jax.jit
    def run(keys):
        def one(acc, k):
            return acc + body(k), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), keys)
        return acc
    return lambda: run(keys)


def main():
    cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                 patch_size=6, patch_num=50, n_depth_rays=1024,
                 N_samples=90, num_epochs=30, chunk=1024)
    ds = SyntheticDataset("", split="train", n_views=cfg.view_num,
                          img_wh=(W, H), n_depth_rays=cfg.n_depth_rays,
                          n_sparse=1024, n_images=16)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
    batch = to_device_batch(ds[0])
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    imgs_norm = batch["images"]
    fp = params["mvs"]["feature"]
    results = {}

    dt0 = timed(scan_phase(
        lambda k: jnp.sum(k.astype(jnp.float32)) * 0.0, keys))
    print(f"empty dispatch: {dt0 * 1e3:.1f} ms", flush=True)

    def featnet_phases(folded):
        net = FeatureNet(8, None, space_folded=folded)

        def fwd(key):
            x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
            outs = [net.apply({"params": fp}, x[i]) for i in range(6)]
            return sum(jnp.sum(o["stage1"]) + jnp.sum(o["stage2"])
                       + jnp.sum(o["stage3"]) for o in outs
                       ).astype(jnp.float32)

        def loss(p, key):
            x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
            outs = [net.apply({"params": p}, x[i]) for i in range(6)]
            return sum(jnp.sum(o["stage1"]) + jnp.sum(o["stage2"])
                       + jnp.sum(o["stage3"]) for o in outs
                       ).astype(jnp.float32)

        def grad(key):
            g = jax.grad(loss)(fp, key)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree.leaves(g)) * 1e-20

        return scan_phase(fwd, keys), scan_phase(grad, keys)

    pf, pg = featnet_phases(False)
    ff, fg = featnet_phases(True)
    # interleave: plain fwd, folded fwd, plain grad, folded grad
    for name, fn in (("featnet_fwd_plain", pf), ("featnet_fwd_folded", ff),
                     ("featnet_grad_plain", pg),
                     ("featnet_grad_folded", fg)):
        dt = (timed(fn) - dt0) / K
        results[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt * 1e3:.2f} ms/iter", flush=True)

    # full train step A/B (single dispatch each, interleaved)
    tx = make_optimizer(cfg, steps_per_epoch=200)
    steps = {}
    states = {}
    for folded in (False, True):
        c = cfg.replace(folded_featnet=folded)
        nerf, mvs = create_models(c)
        states[folded] = TrainState(params, tx.init(params),
                                    jnp.zeros((), jnp.int32))
        steps[folded] = make_train_step(c, nerf, mvs, tx)

    def step_fn(folded):
        def run():
            st, metrics = steps[folded](states[folded], batch,
                                        jax.random.PRNGKey(5))
            states[folded] = st
            return metrics["loss"]
        return run

    run_p, run_f = step_fn(False), step_fn(True)
    for _ in range(WARMUP):
        float(run_p()), float(run_f())
    tp, tf = [], []
    for _ in range(ITERS):
        t0 = time.perf_counter(); float(run_p())
        t1 = time.perf_counter(); float(run_f())
        t2 = time.perf_counter()
        tp.append(t1 - t0); tf.append(t2 - t1)
    results["step_plain"] = round(float(np.median(tp)) * 1e3, 2)
    results["step_folded"] = round(float(np.median(tf)) * 1e3, 2)
    print(f"step_plain: {results['step_plain']} ms  "
          f"step_folded: {results['step_folded']} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
