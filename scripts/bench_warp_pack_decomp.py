"""Decompose the plane-sweep warp+variance cost into FWD vs BWD per pack.

The round-2/3 pack sweeps measured fwd+bwd TOTALS per pack factor and
re-confirmed the symmetric defaults (pack-1 at C>=16, pack-4 at C=8).  But
gathers (2.9 ns/row parallel-issue floor) and scatter-adds (8.7 ns/row)
are different engines with different width sensitivity, so the FORWARD's
optimal pack and the BACKWARD's optimal pack need not agree.  This script
measures, per cascade stage shape (SCARED 320x256 operating point, V=6
source views):

  - fwd-only cost of the full masked-variance volume, per pack factor
  - fwd+bwd cost (grad w.r.t. all V src feature maps), per pack factor
  - derived bwd = total - fwd

If argmin_pack(fwd) != argmin_pack(bwd), an asymmetric custom_vjp
(forward gathers at pack_f, hand-written backward scatters at pack_b)
is worth building.

Timing per CLAUDE.md: value-fetch sync, median over calls, one process,
interleaved configs so tunnel drift hits all equally.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

# stage shapes at 320x256 (H/4,W/4 .. full), V=7 -> 6 src views
STAGES = [
    dict(name="s1", C=32, H=64, W=80, D=48),
    dict(name="s2", C=16, H=128, W=160, D=32),
    dict(name="s3", C=8, H=256, W=320, D=8),
]
V = 6


def make_inputs(st, key):
    ks = jax.random.split(key, 3)
    feats = jax.random.normal(ks[0], (V, st["H"], st["W"], st["C"]),
                              jnp.float32)
    # realistic homography: small rotation + translation, depth-dependent
    projs = []
    rng = np.random.default_rng(0)
    for v in range(V):
        ang = 0.02 * (v + 1)
        Rm = np.array([[np.cos(ang), -np.sin(ang), rng.uniform(-.01, .01)],
                       [np.sin(ang), np.cos(ang), rng.uniform(-.01, .01)],
                       [0.0, 0.0, 1.0]], np.float32)
        T = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                      rng.uniform(0.5, 2.0)], np.float32)
        projs.append(np.concatenate([Rm, T[:, None]], 1))
    projs = jnp.asarray(np.stack(projs))
    depth = jnp.linspace(2.0, 8.0, st["D"])[:, None, None]
    depth = jnp.broadcast_to(depth, (st["D"], st["H"], st["W"]))
    depth = depth * (1.0 + 0.01 * jax.random.normal(
        ks[1], depth.shape, jnp.float32))
    return feats, projs, depth


def _sync(out):
    float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))


def _make_var(projs, depth, pack, bwd_pack=None):
    from ucnerf_tpu.ops.warp import homo_warp

    def var(feats):
        vol_sum = 0.0
        vol_sq_sum = 0.0
        mask_sum = jnp.ones_like(depth)
        for i in range(V):
            warped, mask = homo_warp(feats[i], projs[i], depth, pad=0,
                                     pack=pack, bwd_pack=bwd_pack)
            vol_sum = vol_sum + warped
            vol_sq_sum = vol_sq_sum + warped * warped
            mask_sum = mask_sum + mask
        count = (1.0 / mask_sum)[..., None]
        return vol_sq_sum * count - (vol_sum * count) ** 2

    return var


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    results = {}
    jobs = []   # (stage, pack, kind, fn, inputs)
    for st in STAGES:
        feats, projs, depth = make_inputs(st, key)
        for pack in args.packs:
            if st["W"] % pack:
                continue

            f_fwd = jax.jit(lambda f, fn=_make_var(projs, depth, pack):
                            jnp.sum(fn(f)))
            f_tot = jax.jit(jax.grad(
                lambda f, fn=_make_var(projs, depth, pack): jnp.sum(fn(f))))
            jobs.append((f"{st['name']}.p{pack}", "fwd", f_fwd, feats))
            jobs.append((f"{st['name']}.p{pack}", "tot", f_tot, feats))
        # asymmetric combos: forward at the production default, backward
        # at each candidate scatter pack
        fwd_default = 4 if st["C"] <= 8 else 1
        for bp in args.packs:
            if st["W"] % bp or bp == fwd_default:
                continue
            f_tot = jax.jit(jax.grad(
                lambda f, fn=_make_var(projs, depth, fwd_default, bp):
                jnp.sum(fn(f))))
            jobs.append((f"{st['name']}.f{fwd_default}b{bp}", "tot",
                         f_tot, feats))

    # warm up (compile) everything first, then interleave measurements
    # round-robin per repetition so tunnel drift hits every config equally
    for label, kind, fn, feats in jobs:
        for _ in range(2):
            _sync(fn(feats))
        print(f"compiled {label} {kind}", flush=True)
    times = {f"{j[0]}.{j[1]}": [] for j in jobs}
    for _ in range(args.n):
        for label, kind, fn, feats in jobs:
            t0 = time.perf_counter()
            _sync(fn(feats))
            times[f"{label}.{kind}"].append(time.perf_counter() - t0)
    for k, ts in times.items():
        results[k] = float(np.median(ts) * 1e3)
        print(f"{k}: {results[k]:.2f} ms", flush=True)

    # derived bwd
    print()
    for st in STAGES:
        for pack in args.packs:
            kf, kt = f"{st['name']}.p{pack}.fwd", f"{st['name']}.p{pack}.tot"
            if kf in results and kt in results:
                print(f"{st['name']} pack={pack}: fwd {results[kf]:.2f}  "
                      f"bwd {results[kt]-results[kf]:.2f}  "
                      f"tot {results[kt]:.2f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
