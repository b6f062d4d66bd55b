"""Pose trajectories, SE(3) geometry, latent ray APIs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucnerf_tpu.ops.geometry import (se3_exp, so3_exp, project_to_cam,
                                     transform_to_world, reproject)
from ucnerf_tpu.ops.rays import (get_ndc_rays, ray_aabb, ray_marcher,
                                 ray_marcher_fine)
from ucnerf_tpu.utils import pose_traj


def _orthonormal(R, atol=1e-5):
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=atol)


def test_so3_exp_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    w = rng.standard_normal((8, 3)).astype(np.float32) * 0.8
    R = np.asarray(so3_exp(jnp.asarray(w)))
    ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, ref, atol=1e-5)
    # tiny-angle Taylor branch
    R0 = np.asarray(so3_exp(jnp.zeros((1, 3))))
    np.testing.assert_allclose(R0[0], np.eye(3), atol=1e-7)


def test_se3_exp_properties(rng):
    wu = rng.standard_normal((5, 6)).astype(np.float32) * 0.5
    M = np.asarray(se3_exp(jnp.asarray(wu)))
    assert M.shape == (5, 3, 4)
    _orthonormal(M[:, :, :3])
    # zero twist -> identity
    M0 = np.asarray(se3_exp(jnp.zeros((6,))))
    np.testing.assert_allclose(M0, np.eye(4)[:3], atol=1e-7)


def test_project_unproject_roundtrip(rng):
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    c2w = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.1, -0.2, 0.3]))
    w2c = jnp.linalg.inv(c2w)
    pix = jnp.asarray(rng.uniform(0, 48, (10, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 3.0, (10,)).astype(np.float32))
    world = transform_to_world(pix, depth, K, c2w)
    pix2, z2 = project_to_cam(world, K, w2c)
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(depth), atol=1e-4)
    # reproject into the same view is identity
    pix3, _ = reproject(pix, depth, K, c2w, w2c)
    np.testing.assert_allclose(np.asarray(pix3), np.asarray(pix), atol=1e-3)


def test_trajectories_shapes_and_rotations():
    c2ws = np.tile(np.eye(4), (6, 1, 1))
    c2ws[:, 0, 3] = np.linspace(0, 1, 6)
    c2ws[:, 2, 3] = np.linspace(0, 0.3, 6)
    for traj in (pose_traj.gen_render_path_euler(c2ws, 12),
                 pose_traj.interp_poses_slerp(c2ws, [0, 2, 5], 10),
                 pose_traj.interp_poses_bspline(c2ws, [0, 2, 4, 5], 10),
                 pose_traj.render_path_spiral(c2ws, np.array([1.0, 5.0]), 10),
                 pose_traj.create_spheric_poses(2.0, 10)):
        assert traj.shape[-2:] == (4, 4)
        _orthonormal(traj[:, :3, :3], atol=1e-6)
    # slerp endpoints hit the keyframes
    t = pose_traj.interp_poses_slerp(c2ws, [0, 5], 7)
    np.testing.assert_allclose(t[0, :3, 3], c2ws[0, :3, 3], atol=1e-6)
    np.testing.assert_allclose(t[-1, :3, 3], c2ws[5, :3, 3], atol=1e-6)


def test_get_ndc_rays_on_axis():
    # a ray straight down -z from origin-ish maps near plane to o2 = -1
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    no, nd = get_ndc_rays(100, 100, (50.0, 50.0), 1.0, o, d)
    np.testing.assert_allclose(np.asarray(no[0]), [0, 0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd[0]), [0, 0, 2.0], atol=1e-6)


def test_ray_marchers(rng):
    rays = jnp.concatenate([jnp.zeros((4, 3)),
                            jnp.asarray([[0, 0, 1.0]] * 4),
                            jnp.full((4, 1), 1.0), jnp.full((4, 1), 3.0)],
                           axis=-1)
    pts, o, d, z = ray_marcher(rays, 16)
    assert pts.shape == (4, 16, 3)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 3.0)
    # disparity spacing denser near the camera
    _, _, _, zd = ray_marcher(rays, 16, lindisp=True)
    gaps = np.diff(np.asarray(zd[0]))
    assert gaps[0] < gaps[-1]
    # importance sampling concentrates where weights are
    w = jnp.zeros((4, 16)).at[:, 8].set(1.0)
    pts2, _, _, z2 = ray_marcher_fine(rays[:, :6], z, w, n_importance=16,
                                      key=jax.random.PRNGKey(0))
    assert z2.shape == (4, 32)
    dense = np.asarray(z[:, 8])
    frac_near = (np.abs(np.asarray(z2) - dense[:, None]) < 0.3).mean()
    assert frac_near > 0.5


def test_ray_aabb():
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0]])
    bbox = jnp.asarray([[-1, -1, 2.0], [1, 1, 4.0]])
    tmin, tmax = ray_aabb(o, d, bbox)
    np.testing.assert_allclose(np.asarray(tmin[0]), 2.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tmax[0]), 4.0, rtol=1e-4)
    # ray pointing away: the slab interval lies behind the origin (both
    # negative), like the reference's dda (data/ray_utils.py:143-150)
    assert float(tmax[1, 0]) < 0


def test_render_path_cli_smoke(tmp_path):
    """render_path.py end-to-end on the synthetic scene (2 frames, npz)."""
    import numpy as np
    import render_path as rp

    out = str(tmp_path / "path.npz")
    rp.main(["--traj", "interp", "--n_frames", "2", "--out", out,
             "--dataset_name", "synthetic", "--view_num", "4",
             "--N_samples", "9", "--batch_size", "80", "--patch_size", "4",
             "--patch_num", "4", "--n_depth_rays", "32", "--chunk", "256"])
    data = np.load(out)
    assert data["rgb"].shape == (2, 32, 64, 3)
    assert data["depth"].shape == (2, 32, 64)
    assert np.isfinite(data["rgb"]).all()


def test_render_path_cli_mesh_smoke(tmp_path):
    """render_path.py with --mesh_shape 8: multi-chip serving shards each
    frame's pixel tiles over the mesh (same render the validator uses)."""
    import numpy as np
    import render_path as rp

    out = str(tmp_path / "path8.npz")
    rp.main(["--traj", "interp", "--n_frames", "2", "--out", out,
             "--dataset_name", "synthetic", "--view_num", "4",
             "--N_samples", "9", "--batch_size", "80", "--patch_size", "4",
             "--patch_num", "4", "--n_depth_rays", "32", "--chunk", "256",
             "--mesh_shape", "8"])
    data = np.load(out)
    assert data["rgb"].shape == (2, 32, 64, 3)
    assert np.isfinite(data["rgb"]).all()


def test_render_path_writes_encoded_video(tmp_path):
    """render_path.py --out video.mp4 produces an actual ENCODED video
    (via imageio or OpenCV's built-in FFMPEG writer) that decodes back to
    the right frame count and size — the final artifact of the serving
    trajectory loop (reference latent capability, utils/common.py:511-618)."""
    import numpy as np
    import render_path as rp

    out = str(tmp_path / "video.mp4")
    rp.main(["--traj", "interp", "--n_frames", "3", "--out", out,
             "--dataset_name", "synthetic", "--view_num", "4",
             "--N_samples", "9", "--batch_size", "80", "--patch_size", "4",
             "--patch_num", "4", "--n_depth_rays", "32", "--chunk", "256"])
    assert os.path.exists(out) and os.path.getsize(out) > 0
    import cv2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
        n += 1
    cap.release()
    assert n == 3
    assert frames[0].shape == (32, 64, 3)
    # frames round-trip recognizably (lossy codec): mean abs error small
    data_mean = np.mean([f.mean() for f in frames])
    assert 1 < data_mean < 250           # not all-black / all-white
    # (an untrained NeRF renders dark — ~10/255 mean on this scene)


def test_write_video_helper_fallback(tmp_path):
    """write_video encodes via the cv2 fallback and returns False (no
    crash) for an extension no backend can write."""
    import numpy as np
    import render_path as rp

    frames = (np.random.RandomState(0).rand(4, 32, 64, 3)
              * 255).astype(np.uint8)
    out = str(tmp_path / "clip.mp4")
    assert rp.write_video(out, frames, fps=5)
    assert os.path.getsize(out) > 0
    assert not rp.write_video(str(tmp_path / "clip.notavideo"), frames)
