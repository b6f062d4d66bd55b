"""DPT-hybrid depth-prior inference on the TPU: f32 vs bf16.

The reference runs DPT as fp16 CUDA preprocessing (``run_monodepth.py:
82-84``); ``load_dpt(dtype="bfloat16")`` is the TPU analogue.  This
measures the network forward at the SCARED preprocessing operating point
(1024x1280 image -> 'minimal'/x32 resize -> network at 384x480), both
precisions interleaved in ONE process (axon gotcha #3), K-iteration
lax.scan phases to amortize the ~32 ms dispatch tax, medians reported.

Weights are random (speed does not depend on values; building the
transformers model just provides the full key set).

Run:  python scripts/bench_dpt.py
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

from ucnerf_tpu.models.dpt import (convert_dpt_torch_state_dict, dpt_forward,
                                   dpt_input_size)

H_IMG, W_IMG = 1024, 1280          # SCARED native (data/scared.py:164-167)
K = 4
WARMUP, ITERS = 2, 7


def make_params():
    import torch
    from transformers import DPTConfig, DPTForDepthEstimation
    torch.manual_seed(0)
    cfg = DPTConfig(is_hybrid=True, neck_hidden_sizes=[256, 512, 768, 768],
                    reassemble_factors=[1, 1, 1, 0.5],
                    backbone_out_indices=[2, 5, 8, 11],
                    readout_type="project",
                    backbone_featmap_shape=[1, 1024, 24, 24])
    m = DPTForDepthEstimation(cfg)
    return convert_dpt_torch_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()})


def timed(fn):
    for _ in range(WARMUP):
        float(fn())
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    net_h, net_w = dpt_input_size(H_IMG, W_IMG)
    print(f"network resolution: {net_h}x{net_w}", flush=True)
    params_np = make_params()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (net_h, net_w, 3)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    def scan_phase(p, in_dt):
        # params go in as ARGUMENTS: a closure would bake all ~123M weights
        # into the HLO as constants (~0.5 GB serialized), which the axon
        # remote-compile service rejects with HTTP 413
        @jax.jit
        def run(p, keys):
            def one(acc, k):
                x = (img + 1e-6 * k[0].astype(jnp.float32)).astype(in_dt)
                return acc + jnp.sum(dpt_forward(p, x)), None
            acc, _ = jax.lax.scan(one, jnp.zeros(()), keys)
            return acc
        return lambda: run(p, keys)

    results = {}
    p32 = {k: jnp.asarray(v) for k, v in params_np.items()}
    p16 = {k: jnp.asarray(v, jnp.bfloat16) for k, v in params_np.items()}
    f32 = scan_phase(p32, jnp.float32)
    f16 = scan_phase(p16, jnp.bfloat16)
    # compile + settle both, then interleave timed runs
    float(f32()), float(f16())
    for _ in range(WARMUP):
        float(f32()), float(f16())
    t32, t16 = [], []
    for _ in range(ITERS):
        t0 = time.perf_counter(); float(f32())
        t1 = time.perf_counter(); float(f16())
        t2 = time.perf_counter()
        t32.append(t1 - t0); t16.append(t2 - t1)
    results["dpt_fwd_f32_ms"] = round(float(np.median(t32)) / K * 1e3, 2)
    results["dpt_fwd_bf16_ms"] = round(float(np.median(t16)) / K * 1e3, 2)
    print(f"dpt forward ({net_h}x{net_w}): "
          f"f32 {results['dpt_fwd_f32_ms']} ms/img  "
          f"bf16 {results['dpt_fwd_bf16_ms']} ms/img", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
