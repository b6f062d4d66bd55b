"""Tests for the external-COLMAP driver (reference component #9,
``preprocess/colmap/colmap_wrapper.py:5-59``).  The binary itself is an
external tool; these tests pin the command sequence, the error when it is
absent, and the skip-SfM-when-model-exists branch of ``imgs2poses``."""

import os
import subprocess

import pytest

from ucnerf_tpu.data import colmap_wrapper as cw


def test_missing_binary_raises_clear_error(monkeypatch):
    monkeypatch.delenv("COLMAP_BIN", raising=False)
    monkeypatch.setattr("shutil.which", lambda name: None)
    with pytest.raises(cw.ColmapNotFound, match="COLMAP_BIN"):
        cw.run_colmap("/nonexistent")


def test_colmap_bin_env_override(monkeypatch):
    monkeypatch.setenv("COLMAP_BIN", "/opt/bin/colmap-custom")
    assert cw._colmap_bin() == "/opt/bin/colmap-custom"


def test_run_colmap_command_sequence(tmp_path, monkeypatch):
    """The 3-stage pipeline matches the reference: feature_extractor ->
    matcher -> mapper, with the db/image/output paths wired through
    (reference colmap_wrapper.py:9-57)."""
    monkeypatch.setenv("COLMAP_BIN", "colmap-fake")
    calls = []

    def fake_check_call(args, stdout=None, stderr=None):
        calls.append(args)

    monkeypatch.setattr(subprocess, "check_call", fake_check_call)
    out = cw.run_colmap(str(tmp_path), match_type="sequential_matcher",
                        camera_model="PINHOLE", single_camera=False)

    assert out == str(tmp_path / "sparse" / "0")
    assert [c[1] for c in calls] == ["feature_extractor",
                                     "sequential_matcher", "mapper"]
    assert all(c[0] == "colmap-fake" for c in calls)
    feat = calls[0]
    assert feat[feat.index("--ImageReader.camera_model") + 1] == "PINHOLE"
    assert feat[feat.index("--ImageReader.single_camera") + 1] == "0"
    assert feat[feat.index("--image_path") + 1] == str(tmp_path / "images")
    mapper = calls[2]
    assert mapper[mapper.index("--output_path") + 1] == str(
        tmp_path / "sparse")
    # the per-stage output log lands in the scene dir (reference behavior)
    assert (tmp_path / "colmap_output.txt").exists()
    assert (tmp_path / "sparse").is_dir()


def test_imgs2poses_skips_sfm_when_model_exists(tmp_path, monkeypatch):
    """imgs2poses must NOT rerun COLMAP when sparse/0/images.bin already
    exists (precomputed models are copied in; reference imgs2poses.py
    does the same files_needed check)."""
    sparse0 = tmp_path / "sparse" / "0"
    os.makedirs(sparse0)
    (sparse0 / "images.bin").write_bytes(b"")

    monkeypatch.setattr(cw, "run_colmap",
                        lambda *a, **k: pytest.fail("SfM rerun on "
                                                    "existing model"))
    sentinel = object()
    import ucnerf_tpu.data.llff as llff
    monkeypatch.setattr(llff, "gen_poses", lambda d: sentinel)
    assert cw.imgs2poses(str(tmp_path)) is sentinel
