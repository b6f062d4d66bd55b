"""COLMAP binary I/O round trip + Python-vs-native sparse splat parity +
the LLFF pose pipeline."""

import os

import numpy as np
import pytest

from ucnerf_tpu.data import colmap
from ucnerf_tpu.data.base import load_colmap_sparse_depth
from ucnerf_tpu.data.llff import (gen_poses, load_poses_bounds,
                                  prepare_scene_poses)


def _make_model(rng, n_images=4, n_points=200):
    cams = {1: colmap.Camera(1, "PINHOLE", 64, 48,
                             np.array([60.0, 60.0, 32.0, 24.0]))}
    points = {}
    for pid in range(1, n_points + 1):
        xyz = rng.uniform([-1, -1, 2.0], [1, 1, 5.0])
        points[pid] = colmap.Point3D(pid, xyz, np.array([128, 128, 128]),
                                     float(rng.uniform(0.2, 2.0)),
                                     np.array([], np.int32),
                                     np.array([], np.int32))
    images = {}
    for i in range(1, n_images + 1):
        angle = 0.05 * i
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]])
        t = np.array([0.1 * i, 0.0, 0.0])
        qvec = colmap.rotmat2qvec(R)
        xys, pids = [], []
        K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
        for pid, pt in points.items():
            pc = R @ pt.xyz + t
            if pc[2] <= 0.1:
                continue
            uv = K @ (pc / pc[2])
            if 0 <= uv[0] < 64 and 0 <= uv[1] < 48:
                xys.append(uv[:2])
                pids.append(pid if rng.uniform() > 0.3 else -1)
        images[i] = colmap.Image(i, qvec, t, 1, f"img_{i:03d}.png",
                                 np.array(xys), np.array(pids, np.int64))
    return cams, images, points


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    cams, images, points = _make_model(rng)
    d = tmp_path_factory.mktemp("scene")
    sparse = d / "sparse" / "0"
    os.makedirs(sparse)
    colmap.write_cameras_binary(cams, sparse / "cameras.bin")
    colmap.write_images_binary(images, sparse / "images.bin")
    colmap.write_points3d_binary(points, sparse / "points3D.bin")
    return str(d)


def test_colmap_roundtrip(model_dir):
    cams, images, points = colmap.read_model(
        os.path.join(model_dir, "sparse", "0"))
    assert cams[1].model == "PINHOLE"
    assert len(images) == 4
    im = images[1]
    assert im.name == "img_001.png"
    assert im.xys.shape[1] == 2
    assert len(points) == 200
    # quaternion -> rotmat consistency
    R = colmap.qvec2rotmat(im.qvec)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_colmap_text_roundtrip(model_dir, tmp_path):
    """.txt write -> read reproduces the binary model exactly (repr floats
    round-trip), and read_model auto-detects the format."""
    cams_b, images_b, points_b = colmap.read_model(
        os.path.join(model_dir, "sparse", "0"))

    txt_dir = str(tmp_path / "text_model")
    colmap.write_model(cams_b, images_b, points_b, txt_dir, ext=".txt")
    assert colmap.detect_model_format(txt_dir) == ".txt"
    cams_t, images_t, points_t = colmap.read_model(txt_dir)

    assert cams_t.keys() == cams_b.keys()
    for k in cams_b:
        a, b = cams_t[k], cams_b[k]
        assert (a.model, a.width, a.height) == (b.model, b.width, b.height)
        np.testing.assert_array_equal(a.params, b.params)
    assert images_t.keys() == images_b.keys()
    for k in images_b:
        a, b = images_t[k], images_b[k]
        assert a.name == b.name and a.camera_id == b.camera_id
        np.testing.assert_array_equal(a.qvec, b.qvec)
        np.testing.assert_array_equal(a.tvec, b.tvec)
        np.testing.assert_array_equal(a.xys, b.xys)
        np.testing.assert_array_equal(a.point3D_ids, b.point3D_ids)
    assert points_t.keys() == points_b.keys()
    for k in points_b:
        a, b = points_t[k], points_b[k]
        np.testing.assert_array_equal(a.xyz, b.xyz)
        np.testing.assert_array_equal(a.rgb, b.rgb)
        assert a.error == b.error
        np.testing.assert_array_equal(a.image_ids, b.image_ids)
        np.testing.assert_array_equal(a.point2D_idxs, b.point2D_idxs)

    # binary preferred when both formats coexist (COLMAP convention)
    colmap.write_model(cams_b, images_b, points_b, txt_dir, ext=".bin")
    assert colmap.detect_model_format(txt_dir) == ".bin"


def test_image_name_with_spaces_text(tmp_path):
    im = colmap.Image(7, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                      "frame 000 left.png", np.zeros((0, 2)),
                      np.zeros((0,), np.int64))
    colmap.write_images_text({7: im}, tmp_path / "images.txt")
    back = colmap.read_images_text(tmp_path / "images.txt")
    assert back[7].name == "frame 000 left.png"


def test_reference_readers_parse_our_writers(model_dir, tmp_path):
    """Strictest format gate: the reference's OWN readers
    (colmapUtils/read_write_model.py — pure numpy, imported directly)
    must parse models written by our binary AND text writers and see the
    same cameras/images/points."""
    import sys
    ref_dir = "/root/reference/colmapUtils"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not available")
    sys.path.insert(0, ref_dir)
    try:
        import read_write_model as ref_rw
    finally:
        sys.path.remove(ref_dir)

    sparse = os.path.join(model_dir, "sparse", "0")
    cams, images, points = colmap.read_model(sparse)
    txt_dir = tmp_path / "txt"
    colmap.write_model(cams, images, points, str(txt_dir), ext=".txt")

    for readers, base in (
            ((ref_rw.read_cameras_binary, ref_rw.read_images_binary,
              ref_rw.read_points3d_binary), (sparse, ".bin")),
            ((ref_rw.read_cameras_text, ref_rw.read_images_text,
              ref_rw.read_points3D_text), (str(txt_dir), ".txt"))):
        d, ext = base
        r_cams = readers[0](os.path.join(d, "cameras" + ext))
        r_imgs = readers[1](os.path.join(d, "images" + ext))
        r_pts = readers[2](os.path.join(d, "points3D" + ext))
        assert set(r_cams) == set(cams)
        for cid, c in cams.items():
            assert r_cams[cid].model == c.model
            assert (r_cams[cid].width, r_cams[cid].height) == (c.width,
                                                               c.height)
            np.testing.assert_allclose(r_cams[cid].params, c.params)
        assert set(r_imgs) == set(images)
        for iid, im in images.items():
            np.testing.assert_allclose(r_imgs[iid].qvec, im.qvec)
            np.testing.assert_allclose(r_imgs[iid].tvec, im.tvec)
            assert r_imgs[iid].camera_id == im.camera_id
            assert r_imgs[iid].name == im.name
            np.testing.assert_allclose(
                np.asarray(r_imgs[iid].xys, np.float64),
                np.asarray(im.xys, np.float64))
            np.testing.assert_array_equal(
                np.asarray(r_imgs[iid].point3D_ids, np.int64),
                np.asarray(im.point3D_ids, np.int64))
        assert set(r_pts) == set(points)
        for pid, pt in points.items():
            np.testing.assert_allclose(r_pts[pid].xyz, pt.xyz)
            np.testing.assert_array_equal(r_pts[pid].rgb, pt.rgb)
            np.testing.assert_allclose(float(r_pts[pid].error),
                                       float(pt.error))


def test_our_readers_parse_reference_writers(model_dir, tmp_path):
    """Symmetric gate: models written by the reference's OWN writers must
    parse with our binary and text readers."""
    import sys
    ref_dir = "/root/reference/colmapUtils"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not available")
    sys.path.insert(0, ref_dir)
    try:
        import read_write_model as ref_rw
    finally:
        sys.path.remove(ref_dir)

    sparse = os.path.join(model_dir, "sparse", "0")
    cams, images, points = colmap.read_model(sparse)
    # re-express through the reference's namedtuples
    r_cams = {cid: ref_rw.Camera(id=cid, model=c.model, width=c.width,
                                 height=c.height, params=c.params)
              for cid, c in cams.items()}
    r_imgs = {iid: ref_rw.Image(
        id=iid, qvec=im.qvec, tvec=im.tvec, camera_id=im.camera_id,
        name=im.name, xys=np.asarray(im.xys, np.float64),
        point3D_ids=np.asarray(im.point3D_ids, np.int64))
        for iid, im in images.items()}
    r_pts = {pid: ref_rw.Point3D(
        id=pid, xyz=pt.xyz, rgb=np.asarray(pt.rgb),
        error=float(pt.error),
        image_ids=np.asarray(pt.image_ids, np.int64),
        point2D_idxs=np.asarray(pt.point2D_idxs, np.int64))
        for pid, pt in points.items()}

    for ext in (".bin", ".txt"):
        d = tmp_path / f"ref{ext.lstrip('.')}"
        os.makedirs(d)
        ref_rw.write_model(r_cams, r_imgs, r_pts, str(d), ext=ext)
        o_cams, o_imgs, o_pts = colmap.read_model(str(d), ext=ext)
        assert set(o_cams) == set(cams) and set(o_imgs) == set(images) \
            and set(o_pts) == set(points)
        for cid, c in cams.items():
            np.testing.assert_allclose(o_cams[cid].params, c.params)
        for iid, im in images.items():
            np.testing.assert_allclose(o_imgs[iid].qvec, im.qvec)
            np.testing.assert_allclose(o_imgs[iid].tvec, im.tvec)
            assert o_imgs[iid].name == im.name
            np.testing.assert_allclose(
                np.asarray(o_imgs[iid].xys, np.float64),
                np.asarray(im.xys, np.float64))
        for pid, pt in points.items():
            np.testing.assert_allclose(o_pts[pid].xyz, pt.xyz)


def test_gen_poses_matches_reference_pose_utils(model_dir, tmp_path):
    """poses_bounds.npy from our gen_poses == the reference's own
    load_colmap_data + save_poses (preprocess/colmap/pose_utils.py:11-92)
    on the same model.  Caught a real deviation: the bound percentiles
    are 0.5/99.5, not 0.1/99.9."""
    import shutil
    import sys
    ref_dir = "/root/reference/preprocess/colmap"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not available")

    # the reference's save_poses needs point->image visibility tracks;
    # rebuild the fixture model with tracks derived from the image pids
    sparse_src = os.path.join(model_dir, "sparse", "0")
    cams, images, points = colmap.read_model(sparse_src)
    img_ids_of = {pid: [] for pid in points}
    for iid, im in images.items():
        for pid in np.asarray(im.point3D_ids):
            if pid > 0 and pid in img_ids_of:
                img_ids_of[pid].append(iid)
    tracked = {
        pid: colmap.Point3D(pid, pt.xyz, pt.rgb, pt.error,
                            np.array(img_ids_of[pid], np.int32),
                            np.zeros(len(img_ids_of[pid]), np.int32))
        for pid, pt in points.items() if img_ids_of[pid]}
    scene = tmp_path / "scene"
    colmap.write_model(cams, images, tracked, str(scene / "sparse" / "0"))

    ours = gen_poses(str(scene))

    # stub skimage (absent here; pose_utils only uses it in minify paths).
    # Another test may have stubbed the bare top-level module already —
    # ensure the .transform SUBMODULE exists either way.
    import types
    from conftest import stub_module
    sk = sys.modules.setdefault("skimage", stub_module("skimage"))
    if "skimage.transform" not in sys.modules:
        sk.transform = stub_module("skimage.transform")
        sys.modules["skimage.transform"] = sk.transform
    sys.path.insert(0, ref_dir)
    try:
        import pose_utils as ref_pu
    finally:
        sys.path.remove(ref_dir)
    ref_scene = tmp_path / "ref_scene"
    shutil.copytree(scene, ref_scene)
    os.remove(ref_scene / "poses_bounds.npy")
    poses, pts3d, perm = ref_pu.load_colmap_data(str(ref_scene))
    ref_pu.save_poses(str(ref_scene), poses, pts3d, perm)
    theirs = np.load(ref_scene / "poses_bounds.npy")

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_center_poses_matches_reference_code(rng):
    """average_poses / center_poses == the reference's own implementations
    (data/scared.py:22-126, pure numpy — extracted by AST to avoid the
    module's torch/cv2 import baggage), identity blender2opencv like the
    SCARED caller."""
    import ast
    ref_path = "/root/reference/data/scared.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not available")
    src = open(ref_path).read()
    tree = ast.parse(src)
    # scared.py defines normalize twice; like the interpreter, the LAST
    # module-level def of each name is the one in scope
    wanted = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "normalize", "average_poses", "center_poses"):
            wanted[node.name] = node
    ns = {"np": np}
    for name in ("normalize", "average_poses", "center_poses"):
        exec(compile(ast.Module(body=[wanted[name]], type_ignores=[]),
                     ref_path, "exec"), ns)

    from ucnerf_tpu.data.llff import average_poses, center_poses

    # plausible c2w [R|t] stack around the origin
    poses = []
    for i in range(6):
        angle = 0.2 * i - 0.5
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]])
        t = rng.normal(scale=0.3, size=3)
        poses.append(np.concatenate([R, t[:, None]], 1))
    poses = np.stack(poses)

    np.testing.assert_allclose(average_poses(poses),
                               ns["average_poses"](poses), atol=1e-12)
    b2o = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0],
                    [0, 0, 0, 1]], np.float64)  # scared.py:176
    ours_c, ours_avg = center_poses(poses)
    ref_c, ref_avg = ns["center_poses"](poses, b2o)
    np.testing.assert_allclose(ours_c, ref_c, atol=1e-12)
    # aux return: ours slices rows ([:3], a [3,4] transform), the
    # reference slices COLUMNS ([:, :3] — scared.py:66, dropping the
    # translation; unused downstream there); the rotation block agrees
    np.testing.assert_allclose(np.asarray(ours_avg)[:3, :3],
                               np.asarray(ref_avg)[:3, :3], atol=1e-12)


def test_gen_poses_and_pipeline(model_dir):
    arr = gen_poses(model_dir)
    assert arr.shape == (4, 17)
    poses, bounds = load_poses_bounds(
        os.path.join(model_dir, "poses_bounds.npy"))
    assert (bounds[:, 0] > 0).all() and (bounds[:, 1] > bounds[:, 0]).all()
    info = prepare_scene_poses(os.path.join(model_dir, "poses_bounds.npy"),
                               (64, 48))
    assert info["c2ws"].shape == (4, 4, 4)
    np.testing.assert_allclose(info["w2cs"][0] @ info["c2ws"][0], np.eye(4),
                               atol=1e-4)
    assert info["near_far"][0] < info["near_far"][1]


def test_native_splat_matches_python(model_dir):
    from ucnerf_tpu.data import native
    if not native.available():
        pytest.skip("libcolmap_fast.so not built")
    _, bds = load_poses_bounds(os.path.join(model_dir, "poses_bounds.npy"))
    py = load_colmap_sparse_depth(model_dir, (64, 48), factor=1.0,
                                  bds_raw=bds)
    nat = native.load_colmap_sparse_depth_native(model_dir, (64, 48),
                                                 factor=1.0, bds_raw=bds)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a["name"] == b["name"]
        np.testing.assert_allclose(a["depth_img"], b["depth_img"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a["weight_img"], b["weight_img"],
                                   rtol=1e-5, atol=1e-7)
        assert len(a["coords"]) == len(b["coords"])
        np.testing.assert_array_equal(a["coords"], b["coords"])
