"""COLMAP sparse-model binary/text I/O, written from the COLMAP format spec.

Covers the slice the pipeline consumes (reference behavior at
``colmapUtils/read_write_model.py``: ``read_cameras_binary:128``,
``read_images_binary:225``, ``read_points3d_binary:336``) plus writers so our
own tools can round-trip models.  Pure numpy/struct; a C++ fast path lives in
``native/`` for large models (optional, loaded via ctypes when built).
"""

from __future__ import annotations

import collections
import os
import struct
from typing import Dict

import numpy as np

Camera = collections.namedtuple("Camera",
                                ["id", "model", "width", "height", "params"])
Image = collections.namedtuple(
    "Image", ["id", "qvec", "tvec", "camera_id", "name", "xys", "point3D_ids"])
Point3D = collections.namedtuple(
    "Point3D", ["id", "xyz", "rgb", "error", "image_ids", "point2D_idxs"])

# model_id -> (name, num_params) per the COLMAP camera model table
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: (mid, n) for mid, (name, n) in CAMERA_MODELS.items()}


def qvec2rotmat(qvec):
    """Quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w,
         2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w,
         1 - 2 * x * x - 2 * y * y]])


def rotmat2qvec(R):
    """Rotation matrix -> quaternion (w, x, y, z)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1],
         R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]]]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def _read(fh, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, fh.read(size))


def read_cameras_binary(path) -> Dict[int, Camera]:
    cams = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(fh, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(fh, "<" + "d" * n_params))
            cams[cam_id] = Camera(cam_id, name, width, height, params)
    return cams


def read_images_binary(path) -> Dict[int, Image]:
    images = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            img_id = _read(fh, "<i")[0]
            qvec = np.array(_read(fh, "<dddd"))
            tvec = np.array(_read(fh, "<ddd"))
            cam_id = _read(fh, "<i")[0]
            name = b""
            while True:
                c = fh.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(fh, "<Q")
            raw = np.frombuffer(fh.read(24 * n_pts),
                                dtype=[("x", "<f8"), ("y", "<f8"),
                                       ("id", "<i8")])
            xys = np.stack([raw["x"], raw["y"]], axis=-1)
            images[img_id] = Image(img_id, qvec, tvec, cam_id,
                                   name.decode("utf-8"), xys,
                                   raw["id"].copy())
    return images


def read_points3d_binary(path) -> Dict[int, Point3D]:
    points = {}
    with open(path, "rb") as fh:
        (n,) = _read(fh, "<Q")
        for _ in range(n):
            pt_id = _read(fh, "<q")[0]
            xyz = np.array(_read(fh, "<ddd"))
            rgb = np.array(_read(fh, "<BBB"))
            error = _read(fh, "<d")[0]
            (track_len,) = _read(fh, "<Q")
            raw = np.frombuffer(fh.read(8 * track_len),
                                dtype=[("img", "<i4"), ("p2d", "<i4")])
            points[pt_id] = Point3D(pt_id, xyz, rgb, error,
                                    raw["img"].copy(), raw["p2d"].copy())
    return points


def write_cameras_binary(cams: Dict[int, Camera], path):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(cams)))
        for cam in cams.values():
            mid, n_params = CAMERA_MODEL_IDS[cam.model]
            fh.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            fh.write(struct.pack("<" + "d" * n_params, *cam.params))


def write_images_binary(images: Dict[int, Image], path):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(images)))
        for im in images.values():
            fh.write(struct.pack("<i", im.id))
            fh.write(struct.pack("<dddd", *im.qvec))
            fh.write(struct.pack("<ddd", *im.tvec))
            fh.write(struct.pack("<i", im.camera_id))
            fh.write(im.name.encode("utf-8") + b"\x00")
            fh.write(struct.pack("<Q", len(im.xys)))
            for xy, pid in zip(im.xys, im.point3D_ids):
                fh.write(struct.pack("<ddq", xy[0], xy[1], int(pid)))


def write_points3d_binary(points: Dict[int, Point3D], path):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(points)))
        for pt in points.values():
            fh.write(struct.pack("<q", int(pt.id)))
            fh.write(struct.pack("<ddd", *pt.xyz))
            fh.write(struct.pack("<BBB", *np.asarray(pt.rgb, np.uint8)))
            fh.write(struct.pack("<d", float(pt.error)))
            fh.write(struct.pack("<Q", len(pt.image_ids)))
            for img_id, p2d in zip(pt.image_ids, pt.point2D_idxs):
                fh.write(struct.pack("<ii", int(img_id), int(p2d)))


def read_model(sparse_dir):
    """Read (cameras, images, points3D) from a ``sparse/0``-style directory."""
    return (read_cameras_binary(os.path.join(sparse_dir, "cameras.bin")),
            read_images_binary(os.path.join(sparse_dir, "images.bin")),
            read_points3d_binary(os.path.join(sparse_dir, "points3D.bin")))
