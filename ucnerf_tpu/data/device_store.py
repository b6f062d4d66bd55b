"""Device-resident scene store: index-only training samples.

The SceneDataset sample contract ships ~35-40 MB of per-sample arrays
(V full-resolution images, sparse maps, pyramids, matrices) host->device
on EVERY train step, yet every one of those arrays is a pure gather from
per-scene arrays that never change during training — the host merely
re-assembles views of them (reference behavior: the torch DataLoader does
the same per-step assembly in worker processes, ``data/scared.py:387-522``).

On this tunnel-attached TPU the staging is the measured end-to-end
bottleneck: the synced train step runs 193 ms (bench.py) but the
production loop sustains only ~380 ms/step (round-4 soak) — the gap is
host sample assembly + ~600 MB/dispatch of uploads at K=16.

The store uploads each scan's arrays ONCE (a few hundred MB for a full
SCARED scene set — v5e HBM is 16 GB) and the jitted train step gathers
the sample from them by indices; per step the host ships only
``{scan_idx, view_ids [V], sparse sel coords [n,2], mask}`` (~10 KB).
``gather_batch`` reproduces ``SceneDataset.__getitem__`` BIT-EXACTLY
(tested), so the objective and its tests are unchanged.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.data.base import SceneDataset, build_affine_mats, \
    make_stage_pyramid


def build_store(ds: SceneDataset) -> Dict:
    """Stack every scan's per-view arrays into device arrays.

    Scans with fewer views than the widest are zero-padded on the view
    axis (metas only ever index valid views).  Weight images are
    per-view min-max normalized and pyramids built EXACTLY like
    ``__getitem__`` so gathers are bit-identical.
    """
    W, H = ds.img_wh
    n_max = max(len(ds.scene[s]["c2ws"]) for s in ds.scans)
    S = len(ds.scans)

    def zeros(*shape, dtype=np.float32):
        return np.zeros(shape, dtype)

    images = zeros(S, n_max, H, W, 3)
    sparse_depth = zeros(S, n_max, H, W)
    sparse_weight = zeros(S, n_max, H, W)
    dpt = zeros(S, n_max, H, W)
    c2ws = zeros(S, n_max, 4, 4)
    w2cs = zeros(S, n_max, 4, 4)
    affine = zeros(S, n_max, 3, 4, 4)
    affine_inv = zeros(S, n_max, 3, 4, 4)
    intrinsics = zeros(S, 3, 3)
    near_fars = zeros(S, 2)
    pyr = {k: zeros(S, n_max, H // f, W // f)
           for k, f in (("stage1", 4), ("stage2", 2), ("stage3", 1))}
    wpyr = {k: np.zeros_like(v) for k, v in pyr.items()}

    for si, scan in enumerate(ds.scans):
        sc = ds.scene[scan]
        n = len(sc["c2ws"])
        images[si, :n] = sc["images"].astype(np.float32)
        c2ws[si, :n] = sc["c2ws"]
        w2cs[si, :n] = sc["w2cs"]
        intrinsics[si] = sc["intrinsic"]
        near_fars[si] = sc["near_far"]
        if sc.get("dpt") is not None:
            dpt[si, :n] = sc["dpt"]
        for v in range(n):
            a, ai = build_affine_mats(sc["intrinsic"], sc["w2cs"][v])
            affine[si, v] = a
            affine_inv[si, v] = ai
            dg = sc["sparse"][v]
            sparse_depth[si, v] = dg["depth_img"]
            w_img = dg["weight_img"].copy()
            wmin, wmax = w_img.min(), w_img.max()
            if wmax > wmin:
                w_img = (w_img - wmin) / (wmax - wmin)
            sparse_weight[si, v] = w_img.astype(np.float32)
            p = make_stage_pyramid(dg["depth_img"])
            wp = make_stage_pyramid(sparse_weight[si, v])
            for k in pyr:
                pyr[k][si, v] = p[k]
                wpyr[k][si, v] = wp[k]

    return jax.tree.map(jnp.asarray, dict(
        images=images, sparse_depth=sparse_depth,
        sparse_weight=sparse_weight, dpt=dpt, c2ws=c2ws, w2cs=w2cs,
        affine=affine, affine_inv=affine_inv, intrinsics=intrinsics,
        near_fars=near_fars, sparse_depth_ms=pyr, weight_ms=wpyr))


def sample_indices(ds: SceneDataset, idx: int) -> Dict[str, np.ndarray]:
    """The ~10 KB per-sample payload: indices + the host-side sparse-ray
    subset draw (the SAME stateless rng as ``__getitem__``, so the
    training stream is identical to the host-loaded path)."""
    scan, ref, srcs = ds.metas[idx]
    sc = ds.scene[scan]
    coords = sc["sparse"][ref]["coords"]
    item_rng = np.random.default_rng(
        np.random.SeedSequence([ds.seed, ds._epoch, idx]))
    perm = item_rng.permutation(len(coords))[:ds.n_depth_rays]
    sel = coords[perm]
    pad_coords = np.zeros((ds.n_depth_rays, 2), np.int32)
    pad_coords[:len(sel)] = sel
    mask = np.zeros((ds.n_depth_rays,), np.float32)
    mask[:len(sel)] = 1.0
    return dict(
        scan_idx=np.int32(ds.scans.index(scan)),
        view_ids=np.asarray([ref] + list(srcs), np.int32),
        sparse_coords=pad_coords, sparse_mask=mask)


def gather_batch(store: Dict, inds: Dict) -> Dict:
    """Assemble the standard batch pytree from the store (inside jit).

    Bit-exact twin of ``SceneDataset.__getitem__`` (tested) minus the
    host-only/eval-only fields (depths_h is served as zeros like the
    train-split datasets without GT do).
    """
    s = inds["scan_idx"]
    v = inds["view_ids"]
    ref = v[0]
    intr = store["intrinsics"][s]
    V = v.shape[0]
    return dict(
        images=store["images"][s][v],
        c2ws=store["c2ws"][s][v], w2cs=store["w2cs"][s][v],
        intrinsics=jnp.broadcast_to(intr, (V, 3, 3)),
        affine_mat=store["affine"][s][v],
        affine_mat_inv=store["affine_inv"][s][v],
        near_fars=jnp.broadcast_to(store["near_fars"][s], (V, 2)),
        depths_h=jnp.zeros_like(store["dpt"][s][ref]),
        dpt=store["dpt"][s][ref],
        sparse_depths=store["sparse_depth"][s][ref],
        sparse_weights=store["sparse_weight"][s][ref],
        sparse_coords=inds["sparse_coords"],
        sparse_mask=inds["sparse_mask"],
        view_ids=v, scan_idx=s,
        sparse_depth_ms={k: store["sparse_depth_ms"][k][s][ref]
                         for k in store["sparse_depth_ms"]},
        weight_ms={k: store["weight_ms"][k][s][ref]
                   for k in store["weight_ms"]},
    )


def store_nbytes(store: Dict) -> int:
    return int(sum(np.prod(x.shape) * x.dtype.itemsize
                   for x in jax.tree.leaves(store)))
