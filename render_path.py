"""Novel-view video rendering along a camera trajectory.

    python render_path.py --preset eval_scared --datadir <path> \
        --ckpt <ckpt> --traj spiral --n_frames 60 --out video.mp4

Exercises the reference's latent render-path capability (SURVEY.md §2 #23;
configs item 3 in BASELINE.json): pick a validation sample for the source
views, sweep the target camera along a generated trajectory, render each
frame with the full MVS + NeRF pipeline, and write an mp4/npz.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()  # an explicit JAX_PLATFORMS env var wins
enable_compile_cache()     # persistent compile cache (env var overrides)

from ucnerf_tpu.config import parse_config
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.render.serving import ServingRenderer
from ucnerf_tpu.utils import checkpoint_io
from ucnerf_tpu.utils import pose_traj


def make_trajectory(name, c2ws, bounds, n_frames):
    if name == "spiral":
        b = bounds if bounds is not None else np.array([0.5, 5.0])
        return pose_traj.render_path_spiral(c2ws, b, n_views=n_frames)
    if name == "euler":
        return pose_traj.gen_render_path_euler(c2ws, n_views=n_frames)
    if name == "interp":
        key_idx = np.linspace(0, len(c2ws) - 1, min(5, len(c2ws))).astype(int)
        return pose_traj.interp_poses_bspline(c2ws, key_idx,
                                              n_views=n_frames)
    if name == "spheric":
        radius = float(np.linalg.norm(c2ws[:, :3, 3], axis=1).mean()) + 1.0
        return pose_traj.create_spheric_poses(radius, n_poses=n_frames)
    raise ValueError(name)


def write_video(path: str, frames_u8, fps: int = 10) -> bool:
    """Encode [N, H, W, 3] uint8 frames to a video file.

    Tries imageio's ffmpeg/pyav plugins first; falls back to OpenCV's
    built-in FFMPEG VideoWriter (present in this environment even though
    the imageio plugins are not).  Returns False only if no encoder
    exists, letting the caller keep the frames as .npz.  Covers the
    reference's latent video capability (``utils/common.py:511-618`` —
    trajectory generation with no writer at all)."""
    try:
        import imageio
        imageio.mimwrite(path, frames_u8, fps=fps)
        return os.path.getsize(path) > 0
    except Exception:
        pass
    try:
        import cv2
        n, h, w = frames_u8.shape[:3]
        fourcc = cv2.VideoWriter_fourcc(
            *("mp4v" if path.endswith((".mp4", ".m4v")) else "XVID"))
        vw = cv2.VideoWriter(path, fourcc, float(fps), (w, h))
        if not vw.isOpened():
            return False
        for f in frames_u8:
            vw.write(f[..., ::-1])          # RGB -> BGR
        vw.release()
        return os.path.getsize(path) > 0
    except Exception:
        return False


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--traj", default="interp",
                        choices=["spiral", "euler", "interp", "spheric"])
    parser.add_argument("--n_frames", type=int, default=30)
    parser.add_argument("--fps", type=int, default=10)
    parser.add_argument("--out", default="render_path.mp4")
    ns, rest = parser.parse_known_args(argv)
    cfg = parse_config(rest)

    ds = build_dataset(cfg, "val")
    H, W = ds.img_wh[1], ds.img_wh[0]
    nerf, mvs = create_models(cfg)
    params = checkpoint_io.load_eval_params(
        cfg, init_params(cfg, jax.random.PRNGKey(cfg.seed), (H, W)))

    sample = ds[0]
    scan = ds.metas[0][0]
    sc = ds.scene[scan]
    train_c2ws = sc["c2ws"][sc["train_index"]]
    traj = make_trajectory(ns.traj, train_c2ws, sc.get("bounds"),
                           ns.n_frames)

    # Serving layout (render/serving.py): source views + FeatureNet
    # features device-resident across the trajectory; per frame only the
    # pose matrices ship and the target-dependent cascade remainder reruns.
    # Multi-chip (--mesh_shape N [M]): pixel tiles shard over the mesh.
    renderer = ServingRenderer(cfg, nerf, mvs, params, sample, (H, W),
                               sc["intrinsic"])

    # Pipeline: dispatch frame i+1 before fetching frame i so the host
    # transfer overlaps the device render.
    import time
    frames, depths, marks = [], [], []
    pending = None
    t0 = time.perf_counter()
    for i, c2w in enumerate(traj):
        rgb, depth, _ = renderer.render(c2w)
        if pending is not None:
            frames.append(np.asarray(pending[0]))
            depths.append(np.asarray(pending[1]))
            marks.append(time.perf_counter())
        pending = (rgb, depth)
        print(f"frame {i + 1}/{len(traj)} dispatched")
    frames.append(np.asarray(pending[0]))
    depths.append(np.asarray(pending[1]))
    marks.append(time.perf_counter())
    total = marks[-1] - t0
    # frame 1 carries the jit compile; steady state is what serving sees
    if len(marks) > 2:
        steady = np.median(np.diff(marks[1:]))
        print(f"rendered {len(frames)} frames in {total:.2f}s "
              f"(first {marks[0] - t0:.2f}s incl. compile; steady "
              f"{steady * 1e3:.0f} ms/frame = {1.0 / steady:.2f} fps)")
    else:
        print(f"rendered {len(frames)} frames in {total:.2f}s")

    frames = np.stack(frames)
    if ns.out.endswith(".npz"):
        np.savez(ns.out, rgb=frames, depth=np.stack(depths))
    elif not write_video(ns.out, (np.clip(frames, 0, 1)
                                  * 255).astype(np.uint8), fps=ns.fps):
        # no video backend at all — don't throw the rendered frames away
        fallback = ns.out + ".npz"
        np.savez(fallback, rgb=frames, depth=np.stack(depths))
        print(f"render_path.py: no video writer for {ns.out!r}; "
              f"saved frames to {fallback} instead")
        ns.out = fallback
    print(f"wrote {ns.out} ({len(frames)} frames, {W}x{H})")


if __name__ == "__main__":
    main()
