"""LPIPS semantics oracle: our JAX implementation vs the lpips package's
exact algorithm re-executed in torch with RANDOM weights.

The pretrained AlexNet/LPIPS weights cannot be downloaded here (zero
egress), so the real-weights path is exercised only when they arrive (the
round-4 quality gate).  What CAN be verified offline is every piece of
semantics the weights flow through: the [-1,1] + ScalingLayer input
protocol, the torchvision-AlexNet conv/pool geometry (kernel/stride/pad,
taps after each ReLU, maxpools after taps 0-1), lpips ``normalize_tensor``
(eps added to the norm, outside the sqrt), the squared-difference 1x1
linear heads, spatial averaging, and the tap sum — plus the state-dict
converter layout itself.  Reference algorithm: the ``lpips`` pip package
v0.1 (``lpips/lpips.py`` forward) as invoked by the reference at
``utils/evaluation.py:84-87``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ucnerf_tpu.eval.lpips import (_ALEX_CFG, convert_lpips_torch,
                                   lpips_distance)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
# torchvision alexnet.features conv layer indices and lpips slice layout
_CONV_IDS = [0, 3, 6, 8, 10]


def _random_state_dict(rng):
    """A random state_dict with the lpips package's exact key layout."""
    sd = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CFG):
        w = rng.normal(0, 0.1, (out_ch, in_ch, k, k)).astype(np.float32)
        b = rng.normal(0, 0.1, (out_ch,)).astype(np.float32)
        sd[f"net.slice{i+1}.{_CONV_IDS[i]}.weight"] = torch.from_numpy(w)
        sd[f"net.slice{i+1}.{_CONV_IDS[i]}.bias"] = torch.from_numpy(b)
        lin = np.abs(rng.normal(0, 0.05, (1, out_ch, 1, 1))).astype(
            np.float32)
        sd[f"lins.{i}.model.1.weight"] = torch.from_numpy(lin)
        in_ch = out_ch
    return sd


def _torch_lpips(sd, img0, img1):
    """The lpips v0.1 forward, re-executed with torch ops from the
    state_dict (ScalingLayer -> AlexNet slices -> normalize_tensor ->
    squared diff -> 1x1 heads -> spatial mean -> sum)."""

    def feats(img):
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(
            2, 0, 1)[None]
        x = x * 2.0 - 1.0                       # evaluation.py:85 protocol
        x = (x - _SHIFT) / _SCALE               # ScalingLayer
        taps = []
        for i, (_, _, stride, pad) in enumerate(_ALEX_CFG):
            w = sd[f"net.slice{i+1}.{_CONV_IDS[i]}.weight"]
            b = sd[f"net.slice{i+1}.{_CONV_IDS[i]}.bias"]
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return taps

    t0, t1 = feats(img0), feats(img1)
    total = torch.zeros(())
    for i, (a, b) in enumerate(zip(t0, t1)):
        # lpips.normalize_tensor: eps OUTSIDE the sqrt, added to the norm
        a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (a - b) ** 2
        lin = sd[f"lins.{i}.model.1.weight"]
        total = total + F.conv2d(d, lin).mean(dim=(2, 3)).squeeze()
    return float(total)


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    sd = _random_state_dict(rng)
    img0 = rng.uniform(size=(64, 80, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
        np.float32)

    ref = _torch_lpips(sd, img0, img1)

    npz = str(tmp_path / "lpips_rand.npz")
    convert_lpips_torch(sd, npz)
    data = np.load(npz)
    weights = {k: data[k] for k in data.files}
    ours = float(lpips_distance(weights, img0, img1))

    assert ref > 0
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_lpips_eps_placement_at_tiny_norms(tmp_path):
    """lpips's normalize_tensor adds eps to the NORM (outside the sqrt).
    Scaling the last conv to 1e-8 drives tap-4 norms into the regime where
    eps-inside-sqrt diverges (measured 2.4e-3 relative vs the oracle while
    the correct placement sits at 3e-7) — this pins the exact formula."""
    rng = np.random.default_rng(0)
    sd = _random_state_dict(rng)
    sd["net.slice5.10.weight"] = sd["net.slice5.10.weight"] * 1e-8
    sd["net.slice5.10.bias"] = sd["net.slice5.10.bias"] * 1e-8
    img0 = rng.uniform(size=(64, 80, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
        np.float32)

    ref = _torch_lpips(sd, img0, img1)
    npz = str(tmp_path / "lpips_tiny.npz")
    convert_lpips_torch(sd, npz)
    data = np.load(npz)
    weights = {k: data[k] for k in data.files}
    np.testing.assert_allclose(float(lpips_distance(weights, img0, img1)),
                               ref, rtol=1e-4)


def test_lpips_identical_images_is_zero(tmp_path):
    rng = np.random.default_rng(1)
    sd = _random_state_dict(rng)
    npz = str(tmp_path / "lpips_rand.npz")
    convert_lpips_torch(sd, npz)
    data = np.load(npz)
    weights = {k: data[k] for k in data.files}
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(lpips_distance(weights, img, img)) == pytest.approx(
        0.0, abs=1e-9)


def test_load_lpips_via_env_var(tmp_path, monkeypatch):
    """load_lpips picks up UCNERF_LPIPS_WEIGHTS and returns a callable
    consistent with lpips_distance."""
    from ucnerf_tpu.eval.lpips import load_lpips

    rng = np.random.default_rng(2)
    sd = _random_state_dict(rng)
    npz = str(tmp_path / "w.npz")
    convert_lpips_torch(sd, npz)
    monkeypatch.setenv("UCNERF_LPIPS_WEIGHTS", npz)
    fn = load_lpips()
    assert fn is not None
    img0 = rng.uniform(size=(40, 40, 3)).astype(np.float32)
    img1 = rng.uniform(size=(40, 40, 3)).astype(np.float32)
    data = np.load(npz)
    weights = {k: data[k] for k in data.files}
    np.testing.assert_allclose(fn(img0, img1),
                               float(lpips_distance(weights, img0, img1)),
                               rtol=1e-5)
