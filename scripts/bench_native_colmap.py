"""Size/perf evidence for the native COLMAP path (``native/colmap_fast.cpp``).

Fabricates a large-model scene (default 300 images / 100k points / ~4k
observations per image — the scale of a real COLMAP reconstruction of a
long endoscopic sequence) and times parse+splat end to end:

- Python: ``ucnerf_tpu.data.base.load_colmap_sparse_depth`` (vectorized
  numpy parsing + per-image splat — already the fast pure-Python form).
- native: ``ucnerf_tpu.data.native.load_colmap_sparse_depth_native``
  (C++ parser + splatter via ctypes).

Bit-match between the two paths is covered by
``tests/test_colmap_io.py::test_native_splat_matches_python``; this script
produces the speed number backing the "for large models" claim
(``data/colmap.py:9-10``).  CPU-only — safe to run while the TPU is busy.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ucnerf_tpu.data import colmap, native
from ucnerf_tpu.data.base import load_colmap_sparse_depth

N_IMAGES = int(os.environ.get("N_IMAGES", 300))
N_POINTS = int(os.environ.get("N_POINTS", 100_000))
OBS_PER_IMAGE = int(os.environ.get("OBS_PER_IMAGE", 4000))
W_FULL, H_FULL = 1280, 1024       # SCARED native resolution
FACTOR = 4.0                      # splat divisor (1/downsample, like
                                  # data/scared.py:116) -> 320x256


def fabricate(rng):
    """Vectorized large-model fabrication (the test-suite helper loops
    per point; at 300x100k that would take minutes)."""
    K = np.array([[1000.0, 0, W_FULL / 2], [0, 1000.0, H_FULL / 2],
                  [0, 0, 1]])
    cams = {1: colmap.Camera(1, "PINHOLE", W_FULL, H_FULL,
                             np.array([1000.0, 1000.0, W_FULL / 2,
                                       H_FULL / 2]))}
    xyz = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], size=(N_POINTS, 3))
    errs = rng.uniform(0.2, 2.0, size=N_POINTS)
    points = {pid + 1: colmap.Point3D(
        pid + 1, xyz[pid], np.array([128, 128, 128]), float(errs[pid]),
        np.array([], np.int32), np.array([], np.int32))
        for pid in range(N_POINTS)}

    images = {}
    ids = np.arange(1, N_POINTS + 1)
    for i in range(1, N_IMAGES + 1):
        angle = 0.002 * i
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]])
        t = np.array([0.02 * i, 0.0, 0.0])
        pc = xyz @ R.T + t
        uv = pc[:, :2] / pc[:, 2:3] * 1000.0 + [W_FULL / 2, H_FULL / 2]
        inb = ((pc[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W_FULL)
               & (uv[:, 1] >= 0) & (uv[:, 1] < H_FULL))
        cand = np.where(inb)[0]
        sel = rng.choice(cand, size=min(OBS_PER_IMAGE, len(cand)),
                         replace=False)
        sel.sort()
        pids = ids[sel].astype(np.int64)
        # ~30% unmatched observations like real models
        pids[rng.uniform(size=len(pids)) < 0.3] = -1
        images[i] = colmap.Image(i, colmap.rotmat2qvec(R), t, 1,
                                 f"img_{i:04d}.png", uv[sel], pids)
    return cams, images, points


def main():
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    cams, images, points = fabricate(rng)
    with tempfile.TemporaryDirectory() as d:
        sparse = os.path.join(d, "sparse", "0")
        os.makedirs(sparse)
        colmap.write_cameras_binary(cams, os.path.join(sparse,
                                                       "cameras.bin"))
        colmap.write_images_binary(images, os.path.join(sparse,
                                                        "images.bin"))
        colmap.write_points3d_binary(points, os.path.join(sparse,
                                                          "points3D.bin"))
        n_obs = sum(len(im.point3D_ids) for im in images.values())
        sz = sum(os.path.getsize(os.path.join(sparse, f))
                 for f in os.listdir(sparse))
        print(f"fabricated {N_IMAGES} images / {N_POINTS} points / "
              f"{n_obs} obs ({sz / 1e6:.1f} MB) in "
              f"{time.perf_counter() - t0:.1f}s")

        img_wh = (int(W_FULL / FACTOR), int(H_FULL / FACTOR))
        bds = np.array([2.0, 5.0])
        times = {"python": [], "native": []}
        out = {}
        for rep in range(3):
            t0 = time.perf_counter()
            out["python"] = load_colmap_sparse_depth(
                d, img_wh, factor=FACTOR, bds_raw=bds)
            times["python"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out["native"] = native.load_colmap_sparse_depth_native(
                d, img_wh, factor=FACTOR, bds_raw=bds)
            times["native"].append(time.perf_counter() - t0)

        # spot-check agreement at this scale (full bit-match is the test's
        # job on the small model)
        for a, b in zip(out["python"], out["native"]):
            assert a["name"] == b["name"]
            np.testing.assert_allclose(a["depth_img"], b["depth_img"],
                                       rtol=1e-6, atol=1e-7)
        py = float(np.median(times["python"]))
        nat = float(np.median(times["native"]))
        print(f"python parse+splat: {py:.2f} s")
        print(f"native parse+splat: {nat:.2f} s")
        print(f"speedup: {py / nat:.1f}x")


if __name__ == "__main__":
    main()
