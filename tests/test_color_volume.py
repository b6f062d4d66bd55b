"""use_color_volume approximation vs the exact per-point color sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (to_device_batch, unnormalize,
                                   _stage_planes, make_eval_render)


def test_color_volume_close_to_exact():
    cfg = Config(dataset_name="synthetic", view_num=4, N_samples=9,
                 batch_size=80, patch_size=4, patch_num=4, n_depth_rays=32,
                 chunk=256)
    ds = build_dataset(cfg.replace(datadir=""), "train")
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (32, 64))
    sample = ds[0]
    batch = to_device_batch(sample)

    exact = make_eval_render(cfg, nerf, mvs, (32, 64))
    approx = make_eval_render(cfg.replace(use_color_volume=True,
                                          color_volume_depths=64),
                              nerf, mvs, (32, 64))
    rgb_e, depth_e, _ = exact(params, batch)
    rgb_a, depth_a, _ = approx(params, batch)
    # the synthetic plane scene is smooth; 64 depth planes should make the
    # approximation visually equivalent
    err = float(jnp.abs(rgb_e - rgb_a).mean())
    assert err < 0.02, err
    derr = float(jnp.abs(depth_e - depth_a).mean())
    assert derr < 0.05, derr
