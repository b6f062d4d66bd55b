"""LPIPS (AlexNet, v0.1) in JAX.

The reference computes LPIPS with the ``lpips`` pip package
(``utils/evaluation.py:84-87``): inputs scaled to [-1, 1], AlexNet-conv
features at 5 taps, unit-normalized over channels, squared difference,
1x1 linear heads, spatial mean, summed over taps.

This module implements that computation in pure JAX; the pretrained weights
(AlexNet convs + LPIPS linear heads) must be converted once from the torch
``lpips`` package with ``convert_lpips_torch(state_dict) -> npz`` — the
zero-egress build environment cannot download them, so ``load_lpips``
returns None when no weight file is present and the eval reports LPIPS=nan
(PSNR/SSIM are unaffected).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# AlexNet feature config: (out_ch, kernel, stride, pad), with taps after each
# ReLU block (torchvision alexnet.features layout used by lpips).
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_MAXPOOL_AFTER = {0, 1}          # maxpool(3, stride 2) after taps 0 and 1
# lpips 'scaling layer' constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return y + b


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (k, k, 1),
                                 (s, s, 1), "VALID")


def lpips_distance(weights, img0, img1):
    """img0/img1 [H, W, 3] in [0, 1] -> scalar LPIPS distance."""
    def feats(img):
        x = img * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        taps = []
        for i, (_, _, stride, pad) in enumerate(_ALEX_CFG):
            x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"],
                      stride, pad)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in _MAXPOOL_AFTER:
                x = _maxpool(x)
        return taps

    t0 = feats(img0)
    t1 = feats(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        # lpips normalize_tensor adds eps=1e-10 to the NORM (outside the
        # sqrt) — matching that exactly matters in all-channels-dead ReLU
        # regions, where eps-inside-sqrt would inflate tiny norms 30%+
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{i}_w"]          # [C] non-negative head
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def convert_lpips_torch(lpips_module_state: dict, out_path: str):
    """torch ``lpips.LPIPS(net='alex')`` state_dict -> npz weight file."""
    out = {}
    conv_ids = [0, 3, 6, 8, 10]  # indices in torchvision alexnet.features
    for i, cid in enumerate(conv_ids):
        w = lpips_module_state[f"net.slice{i+1}.{cid}.weight"]
        b = lpips_module_state[f"net.slice{i+1}.{cid}.bias"]
        out[f"conv{i}_w"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
        out[f"conv{i}_b"] = np.asarray(b)
        lin = lpips_module_state[f"lins.{i}.model.1.weight"]
        out[f"lin{i}_w"] = np.asarray(lin)[0, :, 0, 0]
    np.savez(out_path, **out)
    return out_path


def load_lpips(weights_path: Optional[str] = None):
    """Returns lpips_fn(img0, img1) or None if weights are unavailable."""
    if weights_path is None:
        weights_path = os.environ.get("UCNERF_LPIPS_WEIGHTS",
                                      "pretrained_weights/lpips_alex.npz")
    if not os.path.exists(weights_path):
        return None
    data = np.load(weights_path)
    weights = {k: jnp.asarray(data[k]) for k in data.files}
    # weights as a jit argument, not a closure: closed-over arrays embed as
    # HLO constants in every compiled executable (see models/dpt.py, where
    # the same pattern at DPT scale broke the axon remote-compile service)
    fn = jax.jit(lpips_distance)
    return lambda a, b: float(fn(weights, jnp.asarray(a), jnp.asarray(b)))
