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
    def fake_load_dpt(weights):
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


def test_colmap_subcommand_routes_to_imgs2poses(tmp_path, monkeypatch):
    calls = {}

    def fake_imgs2poses(scene_dir, match):
        calls["args"] = (scene_dir, match)

    import ucnerf_tpu.data.colmap_wrapper as cw
    monkeypatch.setattr(cw, "imgs2poses", fake_imgs2poses)
    preprocess.main(["colmap", str(tmp_path), "--match",
                     "sequential_matcher"])
    assert calls["args"] == (str(tmp_path), "sequential_matcher")
