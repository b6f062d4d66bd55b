"""COLMAP dense-workspace I/O round-trips (reference
``colmapUtils/read_write_dense.py`` / ``read_write_fused_vis.py``):
depth/normal ``*.bin`` arrays and fused PLY + ``.vis`` point clouds."""

import numpy as np

from ucnerf_tpu.data.colmap_dense import (read_array, read_fused,
                                          write_array, write_fused)


def test_dense_array_roundtrip_2d(tmp_path, rng):
    depth = rng.uniform(0.5, 3.0, size=(17, 23)).astype(np.float32)
    p = tmp_path / "depth.bin"
    write_array(depth, p)
    back = read_array(p)
    assert back.shape == depth.shape
    np.testing.assert_array_equal(back, depth)


def test_dense_array_roundtrip_3channel(tmp_path, rng):
    normals = rng.normal(size=(9, 13, 3)).astype(np.float32)
    p = tmp_path / "normal.bin"
    write_array(normals, p)
    back = read_array(p)
    assert back.shape == normals.shape
    np.testing.assert_array_equal(back, normals)


def test_dense_stream_matches_reference_writer(tmp_path):
    """Byte-compare our write_array against the reference's own writer
    (read_write_dense.py:58): 'width&height&channels&' header, then the
    data walking w fastest, h next, channel planes last."""
    arr = np.arange(12, dtype=np.float32).reshape(2, 3, 2)
    p = tmp_path / "d.bin"
    write_array(arr, p)
    raw = p.read_bytes()
    assert raw.startswith(b"3&2&2&")
    # the reference's exact formulation:
    ref_stream = np.transpose(arr, (1, 0, 2)).reshape(-1, order="F")
    data = np.frombuffer(raw[len(b"3&2&2&"):], np.float32)
    np.testing.assert_array_equal(data, ref_stream)


def test_fused_ply_roundtrip(tmp_path, rng):
    n = 31
    pts = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        normals=rng.normal(size=(n, 3)).astype(np.float32),
        rgb=rng.integers(0, 256, size=(n, 3)).astype(np.uint8),
        visible_image_idxs=[
            rng.integers(0, 40, size=rng.integers(0, 6)).astype(np.uint32)
            for _ in range(n)],
    )
    ply, vis = tmp_path / "fused.ply", tmp_path / "fused.ply.vis"
    write_fused(pts, ply, vis)
    back = read_fused(ply, vis)
    np.testing.assert_array_equal(back["xyz"], pts["xyz"])
    np.testing.assert_array_equal(back["normals"], pts["normals"])
    np.testing.assert_array_equal(back["rgb"], pts["rgb"])
    assert len(back["visible_image_idxs"]) == n
    for a, b in zip(back["visible_image_idxs"], pts["visible_image_idxs"]):
        np.testing.assert_array_equal(a, b)


def test_fused_ply_without_vis(tmp_path, rng):
    pts = dict(xyz=rng.normal(size=(5, 3)).astype(np.float32))
    ply = tmp_path / "fused.ply"
    write_fused(pts, ply)                       # defaults: zero normals/rgb
    back = read_fused(ply)
    np.testing.assert_array_equal(back["xyz"], pts["xyz"])
    assert back["visible_image_idxs"] is None
    assert (back["rgb"] == 0).all()
