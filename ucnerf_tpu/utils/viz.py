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


def save_val_panel(path, gt_rgb, pred_rgb, gt_depth, pred_depth):
    """2x2 GT/pred panel (reference ``train.py:294-316``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig, axs = plt.subplots(2, 2)
    for ax, img, title in (
            (axs[0, 0], np.clip(gt_rgb, 0, 1), "Ground Truth RGB"),
            (axs[0, 1], np.clip(pred_rgb, 0, 1), "Rendered RGB"),
            (axs[1, 0], visualize_depth(gt_depth), "Ground Truth Depth"),
            (axs[1, 1], visualize_depth(pred_depth), "Rendered Depth")):
        ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
