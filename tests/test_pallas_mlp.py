"""Fused Pallas MLP kernel vs the Flax UCNeRFMLP (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.pallas.mlp_kernel import fused_nerf_mlp, pack_mlp_weights


def test_fused_mlp_matches_flax():
    cfg = Config(view_num=5, N_samples=7, nerf_dtype="float32")
    nerf, _ = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (32, 64))
    key = jax.random.PRNGKey(3)
    N, S = 33, cfg.N_samples          # non-multiple of tile -> tests padding
    pts = jax.random.uniform(key, (N, S, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    feats = jax.random.normal(jax.random.fold_in(key, 2),
                              (N, S, cfg.feat_dim))
    feats = feats.at[..., -1].set(
        jax.random.uniform(jax.random.fold_in(key, 3), (N, S)))

    ref = nerf.apply({"params": params["nerf"]}, pts, dirs, feats)
    packed = pack_mlp_weights(params, dtype=jnp.float32)
    out = fused_nerf_mlp(pts, dirs, feats, packed, multires=cfg.multires,
                         multires_views=cfg.multires_views,
                         view_num=cfg.view_num, depth=cfg.netdepth,
                         skips=tuple(cfg.skips), tile=128, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_bf16_error_comparable_to_flax_bf16():
    """bf16 kernel and bf16 flax are both rounded versions of the f32 math;
    require the kernel's error (vs f32 truth) to be in the same ballpark."""
    cfg = Config(view_num=5, N_samples=7)   # default bf16
    nerf_bf16, _ = create_models(cfg)
    nerf_f32, _ = create_models(cfg.replace(nerf_dtype="float32"))
    params = init_params(cfg, jax.random.PRNGKey(0), (32, 64))
    key = jax.random.PRNGKey(4)
    N, S = 16, cfg.N_samples
    pts = jax.random.uniform(key, (N, S, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    feats = jax.random.normal(jax.random.fold_in(key, 2),
                              (N, S, cfg.feat_dim))
    truth = np.asarray(nerf_f32.apply({"params": params["nerf"]}, pts, dirs,
                                      feats))
    flax_bf16 = np.asarray(nerf_bf16.apply({"params": params["nerf"]}, pts,
                                           dirs, feats))
    packed = pack_mlp_weights(params, dtype=jnp.bfloat16)
    out = np.asarray(fused_nerf_mlp(pts, dirs, feats, packed,
                                    view_num=cfg.view_num, tile=128,
                                    interpret=True))
    err_kernel = np.abs(out - truth)
    err_flax = np.abs(flax_bf16 - truth)
    assert err_kernel.mean() <= 2 * err_flax.mean() + 5e-3, (
        err_kernel.mean(), err_flax.mean())
    assert np.quantile(err_kernel, 0.99) <= 0.25
