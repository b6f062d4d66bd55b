"""Visualization helpers (reference ``utils/utils.py:40-77`` +
``train.py:294-316``)."""

from __future__ import annotations

import os

import numpy as np


def visualize_depth(depth, minmax=None, cmap=None):
    """Depth [H, W] -> uint8 RGB colormap (jet-ish via matplotlib)."""
    import matplotlib
    x = np.nan_to_num(np.asarray(depth, np.float32))
    if minmax is None:
        mi = np.min(x[x > 0]) if (x > 0).any() else 0.0
        ma = np.max(x)
    else:
        mi, ma = minmax
    x = np.clip((x - mi) / (ma - mi + 1e-8), 0, 1)
    rgba = matplotlib.colormaps[cmap or "jet"](x)
    return (rgba[..., :3] * 255).astype(np.uint8)


# ADE20K mask palette (label 0 = black background, labels 1..150), the
# standard table the reference's seg runner paints with
# (``preprocess/DPT/util/pallete.py`` -> Hang Zhang's PyTorch-Encoding,
# MIT license) — a spec constant, flat [R,G,B, R,G,B, ...].
ADE20K_PALETTE = np.array([
    0, 0, 0, 120, 120, 120, 180, 120, 120, 6, 230, 230, 80, 50, 50, 4, 200,
    3, 120, 120, 80, 140, 140, 140, 204, 5, 255, 230, 230, 230, 4, 250, 7,
    224, 5, 255, 235, 255, 7, 150, 5, 61, 120, 120, 70, 8, 255, 51, 255, 6,
    82, 143, 255, 140, 204, 255, 4, 255, 51, 7, 204, 70, 3, 0, 102, 200, 61,
    230, 250, 255, 6, 51, 11, 102, 255, 255, 7, 71, 255, 9, 224, 9, 7, 230,
    220, 220, 220, 255, 9, 92, 112, 9, 255, 8, 255, 214, 7, 255, 224, 255,
    184, 6, 10, 255, 71, 255, 41, 10, 7, 255, 255, 224, 255, 8, 102, 8, 255,
    255, 61, 6, 255, 194, 7, 255, 122, 8, 0, 255, 20, 255, 8, 41, 255, 5,
    153, 6, 51, 255, 235, 12, 255, 160, 150, 20, 0, 163, 255, 140, 140, 140,
    250, 10, 15, 20, 255, 0, 31, 255, 0, 255, 31, 0, 255, 224, 0, 153, 255,
    0, 0, 0, 255, 255, 71, 0, 0, 235, 255, 0, 173, 255, 31, 0, 255, 11, 200,
    200, 255, 82, 0, 0, 255, 245, 0, 61, 255, 0, 255, 112, 0, 255, 133, 255,
    0, 0, 255, 163, 0, 255, 102, 0, 194, 255, 0, 0, 143, 255, 51, 255, 0, 0,
    82, 255, 0, 255, 41, 0, 255, 173, 10, 0, 255, 173, 255, 0, 0, 255, 153,
    255, 92, 0, 255, 0, 255, 255, 0, 245, 255, 0, 102, 255, 173, 0, 255, 0,
    20, 255, 184, 184, 0, 31, 255, 0, 255, 61, 0, 71, 255, 255, 0, 204, 0,
    255, 194, 0, 255, 82, 0, 10, 255, 0, 112, 255, 51, 0, 255, 0, 194, 255,
    0, 122, 255, 0, 255, 163, 255, 153, 0, 0, 255, 10, 255, 112, 0, 143,
    255, 0, 82, 0, 255, 163, 255, 0, 255, 235, 0, 8, 184, 170, 133, 0, 255,
    0, 255, 92, 184, 0, 255, 255, 0, 31, 0, 184, 255, 0, 214, 255, 255, 0,
    112, 92, 255, 0, 0, 224, 255, 112, 224, 255, 70, 184, 160, 163, 0, 255,
    153, 0, 255, 71, 255, 0, 255, 0, 163, 255, 204, 0, 255, 0, 143, 0, 255,
    235, 133, 255, 0, 255, 0, 235, 245, 0, 255, 255, 0, 122, 255, 245, 0,
    10, 190, 212, 214, 255, 0, 0, 204, 255, 20, 0, 255, 255, 255, 0, 0, 153,
    255, 0, 41, 255, 0, 255, 204, 41, 0, 255, 41, 255, 0, 173, 0, 255, 0,
    245, 255, 71, 0, 255, 122, 0, 255, 0, 255, 184, 0, 92, 255, 184, 255, 0,
    0, 133, 255, 255, 214, 0, 25, 194, 194, 102, 255, 0, 92, 0, 255],
    dtype=np.uint8).reshape(-1, 3)


def blend_segmentation(img01, labels, alpha: float = 0.5):
    """ADE20K-palette mask alpha-blended over the image (reference
    ``write_segm_img``, ``preprocess/DPT/util/io.py:201-218``:
    ``Image.blend(img, palette_mask, alpha)``).  img01 [H, W, 3] in [0, 1];
    labels [H, W] ints (1-based ADE20K ids).  Returns uint8 [H, W, 3]."""
    colors = ADE20K_PALETTE[
        np.clip(np.asarray(labels), 0, len(ADE20K_PALETTE) - 1)]
    img = np.asarray(img01, np.float32) * 255.0
    out = img * (1.0 - alpha) + colors.astype(np.float32) * alpha
    return np.clip(out, 0, 255).astype(np.uint8)


def save_val_panel(path, gt_rgb, pred_rgb, gt_depth, pred_depth):
    """2x2 GT/pred panel (reference ``train.py:294-316``).

    Direct pixel compositing (cv2) instead of a matplotlib figure: the
    figure path cost hundreds of ms per panel on the 1-core host — most
    of the validator's non-render wall time (BASELINE.md round-4,
    850-1250 ms/view of which the render is ~320 ms).  Same content:
    full-resolution tiles with title strips.
    """
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)

    def to_u8(img):
        a = np.asarray(img)
        if a.dtype != np.uint8:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        if a.ndim == 2:
            a = np.repeat(a[..., None], 3, axis=-1)
        return a

    tiles = [(to_u8(gt_rgb), "Ground Truth RGB"),
             (to_u8(pred_rgb), "Rendered RGB"),
             (visualize_depth(gt_depth), "Ground Truth Depth"),
             (visualize_depth(pred_depth), "Rendered Depth")]
    H, W = tiles[0][0].shape[:2]
    strip, pad = 22, 4

    def tile(img, title):
        canvas = np.full((H + strip, W, 3), 255, np.uint8)
        canvas[strip:] = img
        cv2.putText(canvas, title, (4, strip - 7),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, (0, 0, 0), 1,
                    cv2.LINE_AA)
        return canvas

    vpad = np.full((H + strip, pad, 3), 255, np.uint8)
    rows = [np.concatenate([tile(*tiles[2 * r]), vpad,
                            tile(*tiles[2 * r + 1])], axis=1)
            for r in range(2)]
    hpad = np.full((pad, rows[0].shape[1], 3), 255, np.uint8)
    panel = np.concatenate([rows[0], hpad, rows[1]], axis=0)
    cv2.imwrite(path, panel[..., ::-1])          # RGB -> BGR
