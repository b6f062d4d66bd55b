"""Direct tests for the observability utilities: viz panels
(reference ``train.py:294-316``, ``utils/utils.py:58-77``), the pluggable
metric writer (SURVEY.md §5.5), and the profiling/sanitizer hooks
(SURVEY.md §5.1-5.2).  These modules were previously exercised only
indirectly through the train-CLI smoke tests."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ucnerf_tpu.utils.profiling import RateMeter, checked
from ucnerf_tpu.utils.viz import save_val_panel, visualize_depth
from ucnerf_tpu.utils.writer import MetricWriter


# ---------------------------------------------------------------- viz

def test_visualize_depth_shape_dtype_range():
    depth = np.linspace(0.5, 2.0, 12, dtype=np.float32).reshape(3, 4)
    img = visualize_depth(depth)
    assert img.shape == (3, 4, 3) and img.dtype == np.uint8
    # jet maps min -> blue-ish, max -> red-ish
    assert img[0, 0, 2] > img[0, 0, 0]          # near depth: blue > red
    assert img[-1, -1, 0] > img[-1, -1, 2]      # far depth: red > blue


def test_visualize_depth_min_from_positive_values_only():
    """The reference's visualize_depth takes the min over x>0 (invalid
    pixels are 0) — a zero pixel must not stretch the color range."""
    depth = np.array([[0.0, 1.0], [1.0, 2.0]], np.float32)
    img = visualize_depth(depth)
    ref = visualize_depth(np.array([[1.0, 1.0], [1.0, 2.0]], np.float32))
    # valid pixels are normalized by (min over >0) = 1.0 in both cases
    np.testing.assert_array_equal(img[0, 1], ref[0, 1])
    np.testing.assert_array_equal(img[1, 1], ref[1, 1])


def test_visualize_depth_all_zero_and_nan_safe():
    img = visualize_depth(np.zeros((2, 2), np.float32))
    assert img.shape == (2, 2, 3)
    img = visualize_depth(np.full((2, 2), np.nan, np.float32))
    assert np.isfinite(img.astype(np.float64)).all()


def test_visualize_depth_explicit_minmax():
    depth = np.array([[1.0, 3.0]], np.float32)
    a = visualize_depth(depth, minmax=(0.0, 4.0))
    b = visualize_depth(depth)
    assert not np.array_equal(a, b)


def test_save_val_panel_writes_png(tmp_path):
    H, W = 8, 10
    rng = np.random.default_rng(0)
    path = tmp_path / "sub" / "panel.png"
    save_val_panel(str(path),
                   rng.uniform(size=(H, W, 3)), rng.uniform(size=(H, W, 3)),
                   rng.uniform(0.5, 2.0, size=(H, W)),
                   rng.uniform(0.5, 2.0, size=(H, W)))
    assert path.is_file() and path.stat().st_size > 0
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------- writer

def test_metric_writer_jsonl_roundtrip(tmp_path):
    w = MetricWriter(logdir=str(tmp_path))
    w.write(3, {"loss": jnp.float32(0.5), "psnr": 21.0})
    w.write(4, {"loss": 0.25})
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [l["step"] for l in lines] == [3, 4]
    assert lines[0]["loss"] == pytest.approx(0.5)
    assert lines[0]["psnr"] == pytest.approx(21.0)
    assert isinstance(lines[0]["loss"], float)   # jnp scalars serialized


def test_metric_writer_appends_across_instances(tmp_path):
    MetricWriter(logdir=str(tmp_path)).write(0, {"a": 1.0})
    w2 = MetricWriter(logdir=str(tmp_path))
    w2.write(1, {"a": 2.0})
    w2.close()
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2   # resume appends instead of truncating


def test_metric_writer_tensorboard_events(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    w = MetricWriter(logdir=str(tmp_path))
    w.write(1, {"loss": 1.0})
    w.close()
    assert any(f.startswith("events.out.tfevents")
               for f in os.listdir(tmp_path))


def test_metric_writer_no_logdir_is_noop(tmp_path):
    w = MetricWriter(logdir=None)
    w.write(0, {"a": 1.0})   # must not raise
    w.close()


# ---------------------------------------------------------- profiling

def test_rate_meter_math(monkeypatch):
    clock = iter([0.0, 1.0, 2.0, 3.0])
    monkeypatch.setattr("time.perf_counter", lambda: next(clock))
    m = RateMeter(smoothing=0.5)
    assert m.update(100) == 0.0          # first call: no interval yet
    assert m.update(100) == pytest.approx(100.0)   # 100 items / 1 s
    # second interval also 100/s; smoothed stays 100
    assert m.update(100) == pytest.approx(100.0)
    assert m.total == 300
    assert m.rate == pytest.approx(100.0)


def test_checked_raises_on_nan_and_passes_clean():
    def f(x):
        return jnp.log(x)

    g = checked(f)
    np.testing.assert_allclose(g(jnp.ones(3)), np.zeros(3), atol=1e-7)
    with pytest.raises(Exception, match="nan"):
        g(-jnp.ones(3))


def test_checked_raises_on_oob_index():
    def f(x):
        return x[jnp.int32(7)]

    with pytest.raises(Exception, match="[Oo]ut.of.bounds|index"):
        checked(f)(jnp.arange(3.0))
