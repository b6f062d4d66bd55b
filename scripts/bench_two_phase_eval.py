"""Two-phase eval render experiment: featurize-all THEN MLP-all.

Hypothesis (round 3): the eval frame's ~280 ms of featurization gathers run
at ~6.4 ns/row effective, while the parallel-issue floor measured for
independent gathers is 2.9 ns/row.  Inside the fused tile body the gathers
serialize against the MLP chain beyond what unroll=16 recovers.  Splitting
the frame into (phase 1) a featurization-only pass that materializes the
per-point conditioning features to HBM in bf16 (the MLP casts them to bf16
anyway, so phase-2 matmul inputs are bit-identical) and (phase 2) an
MLP+composite pass may let the gather storm issue at the floor.  The HBM
round trip it adds is ~1.4 GB read+write = ~4 ms at v5e bandwidth — cheap
if the gather overlap materializes.

Counter-hypothesis: the 176 B quad rows are already at their own issue
floor ("within noise" per the round-2 pack sweep) and the split buys
nothing.  Either way this script produces the measured verdict.

Usage: python scripts/bench_two_phase_eval.py   (on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ucnerf_tpu.utils.platform import enable_compile_cache
enable_compile_cache()

from ucnerf_tpu.config import Config
from ucnerf_tpu.data.synthetic import SyntheticDataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.ops.composite import raw2outputs
from ucnerf_tpu.render.fast_feats import gen_pts_feats_fast
from ucnerf_tpu.render.renderer import gen_dir_feature
from ucnerf_tpu.train.loop import (make_eval_render, prepare_view_ctx,
                                   to_device_batch, view_chunk_fns)

H, W = 256, 320
cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
             patch_size=6, patch_num=50, n_depth_rays=1024, N_samples=90,
             num_epochs=30, chunk=1024)
ds = SyntheticDataset("", split="train", n_views=7, img_wh=(W, H),
                      n_depth_rays=1024, n_sparse=1024, n_images=16)
nerf, mvs = create_models(cfg)
params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
batch = to_device_batch(ds[0])


def make_two_phase(chunk1, unroll1, chunk2, unroll2, feats_only=False):
    n = H * W
    n1 = (n + chunk1 - 1) // chunk1
    tiles = (jnp.arange(n1 * chunk1) % n).reshape(-1, chunk1)

    @jax.jit
    def render_view(params, batch):
        ctx = prepare_view_ctx(cfg, nerf, mvs, params, batch)
        build_chunk, _ = view_chunk_fns(cfg, nerf, H, W, ctx)
        fctx = ctx["feat_ctx"]

        def feat_body(carry, pix):
            rays = build_chunk(pix)
            cos = jnp.linalg.norm(rays["rays_d"], axis=-1)
            dirs = gen_dir_feature(ctx["w2cs"][0],
                                   rays["rays_d"] / cos[..., None])
            feat = gen_pts_feats_fast(
                rays, fctx["stage_volumes"], fctx["confidence"],
                fctx["quad_views"], fctx["src_w2cs"],
                fctx["src_intrinsics"], fctx["img_hw"])
            # conf (last ch) is constant along S; keep it f32 separately so
            # phase-2 inputs are bit-identical to the fused path
            return carry, (feat[..., :-1].astype(jnp.bfloat16),
                           feat[:, 0, -1], rays["ndc"]["ndc"], dirs,
                           rays["depth_candidates"])

        _, (f96, conf, pts, dirs, dc) = jax.lax.scan(
            feat_body, None, tiles, unroll=unroll1)
        if feats_only:
            return (jnp.sum(f96.astype(jnp.float32)) + jnp.sum(conf)
                    + jnp.sum(pts) + jnp.sum(dc))

        S = f96.shape[2]
        f96 = f96.reshape(-1, chunk2, S, f96.shape[-1])
        conf = conf.reshape(-1, chunk2)
        pts = pts.reshape(-1, chunk2, S, 3)
        dirs = dirs.reshape(-1, chunk2, 3)
        dc = dc.reshape(-1, chunk2, S)

        def mlp_body(carry, args):
            f96t, conft, ptst, dirst, dct = args
            feats = jnp.concatenate(
                [f96t.astype(jnp.float32),
                 jnp.broadcast_to(conft[:, None, None],
                                  (*f96t.shape[:2], 1))], axis=-1)
            raw = nerf.apply({"params": params["nerf"]}, ptst, dirst, feats)
            rgb, depth, _, _ = raw2outputs(raw, dct, cfg.white_bkgd)
            return carry, (rgb, depth)

        _, (rgb, depth) = jax.lax.scan(
            mlp_body, None, (f96, conf, pts, dirs, dc), unroll=unroll2)
        rgb = rgb.reshape(-1, 3)[:n].reshape(H, W, 3)
        depth = depth.reshape(-1)[:n].reshape(H, W)
        return jnp.clip(rgb, 0.0, 1.0), depth, ctx["confidence"]

    return render_view


def timeit(fn, *args, reps=10, warmup=3):
    def sync(out):
        if isinstance(out, tuple):
            return float(jnp.sum(out[0])) + float(jnp.sum(out[1]))
        return float(out)

    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


base = make_eval_render(cfg, nerf, mvs, (H, W))
t_base = timeit(base, params, batch)
print(f"baseline fused frame (chunk 1024, unroll 16): {t_base:.1f} ms",
      flush=True)

t_p1 = timeit(make_two_phase(10240, 8, 4096, 4, feats_only=True),
              params, batch)
print(f"phase-1 only (feats for all rays, 10240x8): {t_p1:.1f} ms",
      flush=True)

rgb0, d0, _ = jax.jit(base)(params, batch)
for (c1, u1, c2, u2) in [(10240, 8, 4096, 4), (10240, 8, 8192, 2),
                         (20480, 4, 4096, 4), (10240, 8, 2048, 8)]:
    fn = make_two_phase(c1, u1, c2, u2)
    t = timeit(fn, params, batch)
    rgb1, d1, _ = fn(params, batch)
    err = float(jnp.max(jnp.abs(rgb1 - rgb0)))
    print(f"two-phase c1={c1} u1={u1} c2={c2} u2={u2}: {t:.1f} ms "
          f"(max|rgb diff|={err:.2e})", flush=True)

# re-measure baseline last so tunnel drift shows up
print(f"baseline again: {timeit(base, params, batch):.1f} ms", flush=True)
