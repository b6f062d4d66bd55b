"""Checkpoint conversion round-trip, orbax save/load, and metric parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import init_params
from ucnerf_tpu.utils import checkpoint_io as cio


@pytest.fixture(scope="module")
def params():
    cfg = Config(view_num=4, N_samples=9)
    return init_params(cfg, jax.random.PRNGKey(0), (32, 64))


def _trees_equal(a, b):
    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb, f"treedefs differ:\n{ta}\n{tb}"
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nerf_state_dict_roundtrip(params):
    sd = cio.export_nerf_state_dict(params["nerf"])
    back = cio.convert_nerf_state_dict(sd)
    _trees_equal(params["nerf"], back)


def test_casmvsnet_state_dict_roundtrip(params):
    sd = cio.export_casmvsnet_state_dict(params["mvs"])
    back = cio.convert_casmvsnet_state_dict(sd)
    _trees_equal(params["mvs"], back)


def test_torch_tar_roundtrip(tmp_path, params):
    """Full ucnerf.tar round trip through torch serialization."""
    import torch
    sd_nerf = {k: torch.from_numpy(np.asarray(v).copy())
               for k, v in cio.export_nerf_state_dict(params["nerf"]).items()}
    sd_mvs = {k: torch.from_numpy(np.asarray(v).copy())
              for k, v in
              cio.export_casmvsnet_state_dict(params["mvs"]).items()}
    path = str(tmp_path / "ucnerf.tar")
    torch.save({"network_fn_state_dict": sd_nerf,
                "network_mvs_state_dict": sd_mvs}, path)
    back = cio.convert_reference_checkpoint(path)
    _trees_equal(params["nerf"], back["nerf"])
    _trees_equal(params["mvs"], back["mvs"])


def test_orbax_roundtrip(tmp_path, params):
    import optax
    from ucnerf_tpu.train.loop import TrainState
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(7, jnp.int32))
    path = cio.save_checkpoint(str(tmp_path), state, 7)
    restored = cio.load_checkpoint(path, state)
    _trees_equal(state.params, restored.params)
    assert int(restored.step) == 7


def test_orbax_async_save_and_overwrite(tmp_path, params):
    """wait=False saves commit in the background (wait_for_checkpoints
    flushes them) and re-saving the same step overwrites instead of
    raising — the periodic-save path of train.py."""
    import optax
    from ucnerf_tpu.train.loop import TrainState
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(3, jnp.int32))
    cio.save_checkpoint(str(tmp_path), state, 3, wait=False)
    path = cio.save_checkpoint(str(tmp_path), state, 3, wait=False)
    cio.wait_for_checkpoints()
    restored = cio.load_checkpoint(path, state)
    _trees_equal(state.params, restored.params)
    assert int(restored.step) == 3


def test_load_eval_params_from_finetune_checkpoint(tmp_path, params):
    """Inference CLIs must load checkpoints saved by ANY phase.

    A --finetune run's optimizer is a multi_transform (make_optimizer),
    whose opt_state STRUCTURE differs from plain adam — load_eval_params
    therefore restores the params subtree only (regression: it used to
    restore the full TrainState against a plain-adam target and rejected
    finetune-phase checkpoints in render_path.py/serve.py)."""
    from ucnerf_tpu.train.loop import TrainState, make_optimizer
    cfg = Config(view_num=4, N_samples=9, finetune="scan0")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = TrainState(params, tx.init(params), jnp.asarray(5, jnp.int32))
    path = cio.save_checkpoint(str(tmp_path), state, 5)
    # target init params differ from the save — the restore must win
    other = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)
    restored = cio.load_eval_params(cfg.replace(ckpt=path), other)
    _trees_equal(params, restored)


def test_checkpoint_retention(tmp_path, params):
    """keep=N prunes to the newest N step dirs (async saves included);
    keep=0 keeps everything (the reference's behavior)."""
    import optax
    from ucnerf_tpu.train.loop import TrainState
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    for step in (1, 2, 3):
        cio.save_checkpoint(str(tmp_path), state, step, wait=False, keep=0)
    cio.wait_for_checkpoints()
    assert sorted(os.listdir(tmp_path)) == [
        "step_00000001", "step_00000002", "step_00000003"]
    path = cio.save_checkpoint(str(tmp_path), state, 4, keep=2)
    assert sorted(d for d in os.listdir(tmp_path)
                  if d.startswith("step_")) == [
        "step_00000003", "step_00000004"]
    restored = cio.load_checkpoint(path, state)
    _trees_equal(state.params, restored.params)


def test_psnr_matches_reference_definition(rng):
    from ucnerf_tpu.eval.metrics import rgb_evaluation
    gts = rng.uniform(size=(3, 16, 24, 3)).astype(np.float32)
    preds = np.clip(gts + 0.05 * rng.standard_normal(gts.shape), 0,
                    1).astype(np.float32)
    psnr_v, ssim_v, lpips_v = rgb_evaluation(gts, preds)
    mse = ((gts - preds) ** 2).mean(-1).mean(-1).mean(-1)
    expected = (-10 * np.log10(mse)).mean()
    np.testing.assert_allclose(psnr_v, expected, rtol=1e-6)
    assert 0 < ssim_v <= 1
    assert np.isnan(lpips_v)   # no pretrained weights in this environment


def test_ssim_identity_and_monotonicity(rng):
    from ucnerf_tpu.eval.metrics import ssim
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    a = float(ssim(img, np.clip(img + 0.02, 0, 1)))
    b = float(ssim(img, np.clip(img + 0.2, 0, 1)))
    assert a > b


def test_depth_evaluation_matches_reference_code(rng):
    """Our depth_evaluation == the reference's own
    utils/evaluation.py:29-74 (median-ratio alignment, [1e-4, 100] clamp,
    per-view compute_errors, mean) on random inputs, with and without
    prediction masks."""
    import sys
    import types
    if not os.path.isdir("/root/reference/utils"):
        pytest.skip("reference tree not available")
    for mod in ("lpips", "skimage"):          # absent; only needed at import
        if mod not in sys.modules:
            from conftest import stub_module
            sys.modules[mod] = stub_module(mod)
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from utils import evaluation as ref_eval
    from ucnerf_tpu.eval.metrics import depth_evaluation

    gt = rng.uniform(0.5, 3.0, size=(4, 24, 32)).astype(np.float64)
    gt[gt < 0.8] = 0.0                         # invalid pixels (mask)
    pred = (gt * rng.uniform(1.2, 1.4)
            + rng.normal(scale=0.05, size=gt.shape))
    pred = np.abs(pred) + 1e-3

    ours = np.asarray(depth_evaluation(gt, pred.copy()))
    theirs = np.asarray(ref_eval.depth_evaluation(gt, pred.copy()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    masks = (rng.uniform(size=gt.shape) > 0.3).astype(np.float32)
    ours_m = np.asarray(depth_evaluation(gt, pred.copy(), masks))
    theirs_m = np.asarray(ref_eval.depth_evaluation(
        gt, pred.copy(), pred_masks=masks))
    np.testing.assert_allclose(ours_m, theirs_m, rtol=1e-9)


def test_depth_evaluation_perfect_after_scaling(rng):
    from ucnerf_tpu.eval.metrics import depth_evaluation
    gt = rng.uniform(1.0, 3.0, size=(2, 16, 16)).astype(np.float32)
    pred = gt * 0.5                      # constant scale -> fixed by median
    errs = depth_evaluation(gt, pred)
    assert errs[0] < 1e-6                # abs_rel
    assert errs[4] == 1.0                # a1


def test_ssim_matches_torch_reference_impl(rng):
    """Cross-check our SSIM against an independent torch implementation of
    the skimage algorithm (uniform 7x7, sample covariance, border crop)."""
    import torch
    import torch.nn.functional as F
    from ucnerf_tpu.eval.metrics import ssim

    def torch_ssim(x, y, win=7, data_range=1.0):
        pad = (win - 1) // 2
        C1 = (0.01 * data_range) ** 2
        C2 = (0.03 * data_range) ** 2
        NP = win * win
        cov_norm = NP / (NP - 1)
        k = torch.ones(1, 1, win, win) / NP
        vals = []
        for c in range(x.shape[-1]):
            xx = torch.from_numpy(x[..., c])[None, None]
            yy = torch.from_numpy(y[..., c])[None, None]
            ux = F.conv2d(xx, k)
            uy = F.conv2d(yy, k)
            uxx = F.conv2d(xx * xx, k)
            uyy = F.conv2d(yy * yy, k)
            uxy = F.conv2d(xx * yy, k)
            vx = cov_norm * (uxx - ux * ux)
            vy = cov_norm * (uyy - uy * uy)
            vxy = cov_norm * (uxy - ux * uy)
            s = ((2 * ux * uy + C1) * (2 * vxy + C2) /
                 ((ux * ux + uy * uy + C1) * (vx + vy + C2)))
            vals.append(float(s.mean()))
        return float(np.mean(vals))

    x = rng.uniform(size=(24, 20, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape), 0,
                1).astype(np.float32)
    np.testing.assert_allclose(float(ssim(x, y)), torch_ssim(x, y),
                               rtol=1e-4)


def test_params_npz_roundtrip(tmp_path, params):
    path = str(tmp_path / "params.npz")
    cio.save_params_npz(params, path)
    back = cio.load_params_npz(path)
    _trees_equal(params, back)


def test_convert_weights_cli_ucnerf_and_casmvsnet(tmp_path, params):
    """convert_weights.py: ucnerf.tar -> npz (both trees) and a bare
    casmvsnet.ckpt ({'model': sd}, the reference's downloaded format,
    network/models.py:240-248) -> mvs-only npz that seeds init params."""
    import torch
    import convert_weights as cw

    sd_nerf = {k: torch.from_numpy(np.asarray(v)) for k, v in
               cio.export_nerf_state_dict(params["nerf"]).items()}
    sd_mvs = {k: torch.from_numpy(np.asarray(v)) for k, v in
              cio.export_casmvsnet_state_dict(params["mvs"]).items()}

    tar = str(tmp_path / "ucnerf.tar")
    torch.save({"network_fn_state_dict": sd_nerf,
                "network_mvs_state_dict": sd_mvs}, tar)
    out = cw.main(["ucnerf", tar, str(tmp_path / "ucnerf.npz")])
    back = cio.load_params_npz(out)
    _trees_equal(params["nerf"], back["nerf"])
    _trees_equal(params["mvs"], back["mvs"])

    ckpt = str(tmp_path / "casmvsnet.ckpt")
    torch.save({"model": sd_mvs}, ckpt)
    out = cw.main(["casmvsnet", ckpt, str(tmp_path / "casmvsnet.npz")])
    back = cio.load_params_npz(out)
    assert set(back) == {"mvs"}
    _trees_equal(params["mvs"], back["mvs"])
    # the --ckpt merge contract: mvs-only npz overrides ONLY the mvs tree
    merged = {**params, **back}
    _trees_equal(merged["mvs"], params["mvs"])
    assert merged["nerf"] is params["nerf"]

    # convert_reference_checkpoint also takes the bare ckpt directly
    conv = cio.convert_reference_checkpoint(ckpt)
    assert set(conv) == {"mvs"}
    with pytest.raises(ValueError, match="unrecognized"):
        bad = str(tmp_path / "bad.tar")
        torch.save({"something": 1}, bad)
        cio.convert_reference_checkpoint(bad)


def test_convert_weights_cli_lpips(tmp_path):
    """lpips kind: a state dict shaped like torch lpips.LPIPS(net='alex')
    converts to an npz that load_lpips accepts and evaluates."""
    import torch
    import convert_weights as cw
    from ucnerf_tpu.eval.lpips import load_lpips

    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3),
             (256, 256, 3)]
    conv_ids = [0, 3, 6, 8, 10]
    rng = np.random.RandomState(0)
    sd = {}
    for i, ((ci, co, k), cid) in enumerate(zip(chans, conv_ids)):
        sd[f"net.slice{i+1}.{cid}.weight"] = torch.from_numpy(
            rng.randn(co, ci, k, k).astype(np.float32))
        sd[f"net.slice{i+1}.{cid}.bias"] = torch.from_numpy(
            rng.randn(co).astype(np.float32))
        sd[f"lins.{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, co, 1, 1)).astype(np.float32))
    pth = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, pth)
    out = cw.main(["lpips", pth, str(tmp_path / "lpips_alex.npz")])
    fn = load_lpips(out)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = rng.rand(64, 64, 3).astype(np.float32)
    d_ab = fn(a, b)
    assert np.isfinite(d_ab) and d_ab > 0
    assert abs(fn(a, a)) < 1e-6


def test_convert_weights_cli_dpt(tmp_path):
    """dpt kind: torch-layout state dict file -> npz with our layouts."""
    import torch
    import convert_weights as cw

    sd = {"x.weight": torch.zeros(8, 4, 3, 3),
          "y.weight": torch.zeros(8, 4),
          "z.bias": torch.zeros(8)}
    pth = str(tmp_path / "dpt.bin")
    torch.save(sd, pth)
    out = cw.main(["dpt", pth, str(tmp_path / "dpt.npz")])
    data = np.load(out)
    assert data["x.weight"].shape == (3, 3, 4, 8)
    assert data["y.weight"].shape == (4, 8)
    assert data["z.bias"].shape == (8,)
