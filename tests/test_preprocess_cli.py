"""Smoke tests for the preprocess CLI surface (reference ``preprocess/``
layer: ``imgs2poses.py`` + ``run_monodepth.py:98-130``).  The heavy pieces
(COLMAP wrapper, gen_poses, the DPT model) have their own tests; these pin
the CLI wiring: argument routing, the per-image npz{pred} artifact layout,
and the output locations."""

import os

import numpy as np
from PIL import Image

import preprocess


def test_dpt_subcommand_writes_npz_per_image(tmp_path, monkeypatch):
    scene = tmp_path / "scene0"
    os.makedirs(scene / "images")
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        arr = rng.integers(0, 255, (32, 40, 3)).astype("uint8")
        Image.fromarray(arr).save(scene / "images" / f"{name}.png")

    # stub the model load: the CLI contract is routing + artifact layout
    def fake_load_dpt(weights, dtype=None):
        assert weights == "w.npz"
        return lambda img: img.mean(axis=-1)

    import ucnerf_tpu.models.dpt as dpt_mod
    monkeypatch.setattr(dpt_mod, "load_dpt", fake_load_dpt)

    preprocess.main(["dpt", str(scene), "--weights", "w.npz"])

    for name in ("a", "b"):
        out = scene / "dpt" / f"{name}.npz"
        assert out.is_file()
        pred = np.load(out)["pred"]
        assert pred.shape == (32, 40)    # reference writes npz{pred}


def test_seg_subcommand_writes_npz_and_blended_png(tmp_path, monkeypatch):
    scene = tmp_path / "scene0"
    os.makedirs(scene / "images")
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (24, 30, 3)).astype("uint8")
    Image.fromarray(arr).save(scene / "images" / "a.png")

    def fake_load_dpt_seg(weights, dtype=None):
        assert weights == "s.npz"

        def predict(img):
            h, w = img.shape[:2]
            labels = np.full((h, w), 3, np.int32)
            return labels, np.zeros((h, w, 9), np.float32)
        return predict

    import ucnerf_tpu.models.dpt as dpt_mod
    monkeypatch.setattr(dpt_mod, "load_dpt_seg", fake_load_dpt_seg)

    preprocess.main(["seg", str(scene), "--weights", "s.npz"])

    labels = np.load(scene / "seg" / "a.npz")["labels"]
    assert labels.shape == (24, 30) and (labels == 3).all()
    png = np.asarray(Image.open(scene / "seg" / "a.png"))
    # reference write_segm_img blends image and palette mask 50/50
    from ucnerf_tpu.utils.viz import ADE20K_PALETTE
    expect = np.clip(arr * 0.5 + ADE20K_PALETTE[3] * 0.5, 0, 255)
    assert png.shape == (24, 30, 3)
    assert np.abs(png.astype(np.float32) - expect).max() <= 1.0


def test_colmap_subcommand_routes_to_imgs2poses(tmp_path, monkeypatch):
    calls = {}

    def fake_imgs2poses(scene_dir, match):
        calls["args"] = (scene_dir, match)

    import ucnerf_tpu.data.colmap_wrapper as cw
    monkeypatch.setattr(cw, "imgs2poses", fake_imgs2poses)
    preprocess.main(["colmap", str(tmp_path), "--match",
                     "sequential_matcher"])
    assert calls["args"] == (str(tmp_path), "sequential_matcher")
