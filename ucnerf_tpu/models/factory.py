"""Model factory (reference ``create_ucnerf``, ``network/models.py:209-283``).

Differences from the reference, on purpose:
- no hard-coded weight-download URL at construction (``models.py:240-244``);
  pretrained CasMVSNet / UC-NeRF checkpoints are converted offline with
  ``ucnerf_tpu.utils.checkpoint_io`` and loaded explicitly.
- ``--finetune`` freezing is implemented as an optax mask in the train loop
  rather than per-parameter requires_grad (``models.py:249-250``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.mvs import CascadeMVSNet
from ucnerf_tpu.models.nerf import UCNeRFMLP


def create_models(cfg: Config) -> Tuple[UCNeRFMLP, CascadeMVSNet]:
    import jax.numpy as _jnp
    nerf_dtype = None if cfg.nerf_dtype == "float32" else _jnp.dtype(
        cfg.nerf_dtype)
    nerf = UCNeRFMLP(depth=cfg.netdepth, width=cfg.netwidth,
                     multires=cfg.multires,
                     multires_views=cfg.multires_views,
                     view_num=cfg.view_num, skips=tuple(cfg.skips),
                     dtype=nerf_dtype)
    mvs_dtype = None if cfg.mvs_dtype == "float32" else _jnp.dtype(
        cfg.mvs_dtype)
    mvs = CascadeMVSNet(ndepths=tuple(cfg.ndepths),
                        depth_intervals_ratio=tuple(cfg.depth_intervals_ratio),
                        dtype=mvs_dtype,
                        folded_featnet=cfg.folded_featnet)
    return nerf, mvs


def init_params(cfg: Config, key, img_hw: Tuple[int, int]):
    """Initialize both parameter trees with dummy shapes."""
    H, W = img_hw
    k1, k2 = jax.random.split(key)
    nerf, mvs = create_models(cfg)

    v1 = cfg.view_num - 1
    pts = jnp.zeros((2, cfg.N_samples, 3))
    dirs = jnp.zeros((2, 3))
    feats = jnp.zeros((2, cfg.N_samples, cfg.feat_dim))
    nerf_params = nerf.init(k1, pts, dirs, feats)["params"]

    imgs_src = jnp.zeros((v1, H, W, 3))
    affine = jnp.broadcast_to(jnp.eye(4), (cfg.view_num, 3, 4, 4))
    mvs_params = mvs.init(k2, imgs_src, affine, affine, 0.5, 2.0,
                          pad=cfg.pad)["params"]
    params = {"nerf": nerf_params, "mvs": mvs_params}
    if cfg.encode_a:
        # appearance embedding table (reference network/models.py:237-239:
        # torch default N(0,1) init; optimized but not consumed by the live
        # render path — kept with identical semantics)
        k3 = jax.random.fold_in(key, 2)
        params["appearance"] = jax.random.normal(k3, (cfg.N_vocab, cfg.N_a))
    return params
