"""Tiled-patch plane-sweep warp: can scanline coherence beat the gather floor?

The production warp gathers one C-wide row per (view, depth, y, x) —
D*H*W rows/view/stage at the measured 2.9 ns/row issue floor — and its
backward scatter-adds the same row count at 8.7 ns/row; together the
measured floor of the train step's dominant phase (BASELINE.md round-3).

Untried lever: the homography's source indices are COHERENT along a
target scanline — over a tile of T target pixels, the needed source
pixels lie inside a small (B rows) x (T+K cols) window around the
per-tile index minimum (in the unit-slope frame e = ix - x).  So instead
of T per-element gather rows, issue ONE windowed gather per tile (vmapped
dynamic_slice -> XLA gather with a (B, T+K, C) slice window; T-times
fewer gather indices) and pick each pixel with a bounded one-hot select
on the VPU.  The AD backward then scatter-adds PATCHES (the adjoint of
the windowed gather), cutting scatter indices by the same factor.

Exactness: border clamping would flatten the index slope at the frustum
edge and blow the tile span, so the gather runs on an EDGE-EXTENDED
source table (clipping to the extended range yields exactly the
production border value for ANY overshoot) — the slope survives up to
Ex/Ey pixels beyond the border.  The remaining correctness condition is
the per-tile span check (ok flag); a production integration would
lax.cond on it and fall back to the exact per-element gather (stages 2/3
re-center depth per pixel, so violations are data-dependent).

This differs from the CLOSED experiments: pack-N only cut rows 2-4x (and
wider C lost); the epipolar-band idea was per-ray featurization with thin
MXU matmuls; one-hot full-row matmuls were W-wide contractions.  Here the
select window is B*K elements, VPU-elementwise, and the gather/scatter
row count drops T-fold.

Usage: PYTHONPATH=. python scripts/bench_warp_tiled.py [--n 8]
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
    dict(name="s1", C=32, H=64, W=80, D=48, T=16, B=4, K=12, pack=1),
    dict(name="s2", C=16, H=128, W=160, D=32, T=16, B=4, K=12, pack=1),
    dict(name="s3", C=8, H=256, W=320, D=8, T=16, B=4, K=12, pack=4),
]
V = 6


def make_inputs(st, key):
    ks = jax.random.split(key, 3)
    feats = jax.random.normal(ks[0], (V, st["H"], st["W"], st["C"]),
                              jnp.float32)
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


def raw_coords(src_shape, proj_mat, depth_values):
    """Float rounded indices BEFORE border clipping + mask, with the exact
    production float expressions (ops/warp.py)."""
    H, W = src_shape
    D, H_pad, W_pad = depth_values.shape
    R = proj_mat[:, :3]
    T = proj_mat[:, 3]
    dt = depth_values.dtype
    ys = jnp.arange(H_pad, dtype=dt)
    xs = jnp.arange(W_pad, dtype=dt)
    base = (R[:, 0][:, None, None] * xs[None, None, :]
            + R[:, 1][:, None, None] * ys[None, :, None]
            + R[:, 2][:, None, None])
    src = base[:, None] + T[:, None, None, None] / depth_values[None]
    u = src[0] / src[2]
    v = src[1] / src[2]
    gx = u / ((W - 1) / 2.0) - 1.0
    gy = v / ((H - 1) / 2.0) - 1.0
    in_mask = ((gx > -1.0) & (gx < 1.0) & (gy > -1.0) & (gy < 1.0))
    rx = jnp.round((gx + 1.0) * 0.5 * (W - 1))
    ry = jnp.round((gy + 1.0) * 0.5 * (H - 1))
    return rx, ry, in_mask


def tiled_warp(src_feat, proj_mat, depth_values, T, B, K, Ex, Ey,
               select="2step"):
    """Windowed tile gather + bounded select on an edge-extended table.

    Returns (warped, mask, ok): exact iff ok (all tile spans in-window);
    always exact at borders (extended clip == production border clamp).
    """
    H, W, C = src_feat.shape
    D, Hp, Wp = depth_values.shape
    assert Wp % T == 0, (Wp, T)
    X = T + K
    nt = Wp // T
    rx, ry, in_mask = raw_coords((H, W), proj_mat, depth_values)
    # extended clip: same VALUE as production's [0, W-1] clamp for any
    # overshoot (edge padding replicates), but keeps the index slope
    # alive for Ex/Ey px past the border so tile spans stay bounded
    ixe = jnp.clip(rx, -Ex, W - 1 + Ex).astype(jnp.int32) + Ex
    iye = jnp.clip(ry, -Ey, H - 1 + Ey).astype(jnp.int32) + Ey
    He, We = H + 2 * Ey, W + 2 * Ex
    ext = jnp.pad(src_feat, ((Ey, Ey), (Ex, Ex), (0, 0)), mode="edge")

    ixt = ixe.reshape(D, Hp, nt, T)
    iyt = iye.reshape(D, Hp, nt, T)
    jl = jnp.arange(T, dtype=jnp.int32)
    e = ixt - jl                                             # unit-slope frame
    by = jnp.clip(jnp.min(iyt, axis=-1), 0, He - B)          # [D,Hp,nt]
    bx = jnp.clip(jnp.min(e, axis=-1), 0, We - X)
    r = iyt - by[..., None]                                  # [D,Hp,nt,T]
    k = e - bx[..., None]
    ok = jnp.logical_and((r >= 0) & (r < B), (k >= 0) & (k < K)).all()

    bases = jnp.stack([by.reshape(-1), bx.reshape(-1)], axis=-1)  # [N,2]

    def slice_one(b):
        return jax.lax.dynamic_slice(ext, (b[0], b[1], 0), (B, X, C))

    patches = jax.vmap(slice_one)(bases)                     # [N,B,X,C]
    N = patches.shape[0]
    rf = r.reshape(N, T)
    kf = k.reshape(N, T)

    if select == "2step":
        # k-select per row candidate, then row mix
        colsel = jnp.zeros((N, B, T, C), src_feat.dtype)
        for kk in range(K):
            m = (kf == kk).astype(src_feat.dtype)[:, None, :, None]
            colsel = colsel + m * jax.lax.slice_in_dim(
                patches, kk, kk + T, axis=2)
        onehot_r = jax.nn.one_hot(rf, B, dtype=src_feat.dtype)  # [N,T,B]
        out = jnp.einsum("ntb,nbtc->ntc", onehot_r, colsel)
    else:                                                    # combined B*K
        sel = rf * K + kf
        out = jnp.zeros((N, T, C), src_feat.dtype)
        for rr in range(B):
            for kk in range(K):
                m = (sel == (rr * K + kk)).astype(src_feat.dtype)[..., None]
                out = out + m * jax.lax.slice_in_dim(
                    patches[:, rr], kk, kk + T, axis=1)
    warped = out.reshape(D, Hp, nt * T, C)
    return warped, in_mask.astype(src_feat.dtype), ok


def make_var_tiled(projs, depth, T, B, K, Ex, Ey, select):
    def var(feats):
        vol_sum = 0.0
        vol_sq_sum = 0.0
        mask_sum = jnp.ones_like(depth)
        oks = []
        for i in range(V):
            warped, mask, ok = tiled_warp(feats[i], projs[i], depth,
                                          T, B, K, Ex, Ey, select)
            oks.append(ok)
            vol_sum = vol_sum + warped
            vol_sq_sum = vol_sq_sum + warped * warped
            mask_sum = mask_sum + mask
        count = (1.0 / mask_sum)[..., None]
        return vol_sq_sum * count - (vol_sum * count) ** 2, jnp.stack(oks)

    return var


def make_var_prod(projs, depth, pack):
    from ucnerf_tpu.ops.warp import homo_warp

    def var(feats):
        vol_sum = 0.0
        vol_sq_sum = 0.0
        mask_sum = jnp.ones_like(depth)
        for i in range(V):
            warped, mask = homo_warp(feats[i], projs[i], depth, pack=pack)
            vol_sum = vol_sum + warped
            vol_sq_sum = vol_sq_sum + warped * warped
            mask_sum = mask_sum + mask
        count = (1.0 / mask_sum)[..., None]
        return vol_sq_sum * count - (vol_sum * count) ** 2

    return var


def _sync(x):
    float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--selects", nargs="+", default=["2step", "bk"])
    ap.add_argument("--stages", nargs="+", default=["s1", "s2", "s3"])
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    jobs = []
    for st in [s for s in STAGES if s["name"] in args.stages]:
        feats, projs, depth = make_inputs(st, key)
        T, B, K = st["T"], st["B"], st["K"]
        Ex, Ey = st["W"] // 2, st["H"] // 4

        vp = make_var_prod(projs, depth, st["pack"])
        vol_p = jax.jit(vp)(feats)
        f_p_fwd = jax.jit(lambda f, fn=vp: jnp.sum(fn(f)))
        jobs += [(f"{st['name']}.prod", "fwd", f_p_fwd, feats)]
        if not args.fwd_only:
            f_p_tot = jax.jit(jax.grad(lambda f, fn=vp: jnp.sum(fn(f))))
            jobs += [(f"{st['name']}.prod", "tot", f_p_tot, feats)]

        for sel in args.selects:
            vt = make_var_tiled(projs, depth, T, B, K, Ex, Ey, sel)
            vol_t, oks = jax.jit(vt)(feats)
            md = float(jnp.abs(vol_t - vol_p).max())
            print(f"{st['name']}.{sel}: windows_ok={bool(oks.all())} "
                  f"maxdiff={md:.2e}", flush=True)
            f_t_fwd = jax.jit(lambda f, fn=vt: jnp.sum(fn(f)[0]))
            jobs += [(f"{st['name']}.tiled_{sel}", "fwd", f_t_fwd, feats)]
            if not args.fwd_only:
                f_t_tot = jax.jit(jax.grad(
                    lambda f, fn=vt: jnp.sum(fn(f)[0])))
                jobs += [(f"{st['name']}.tiled_{sel}", "tot", f_t_tot, feats)]

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
    results = {k: float(np.median(v) * 1e3) for k, v in times.items()}
    for k in sorted(results):
        print(f"{k}: {results[k]:.2f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
