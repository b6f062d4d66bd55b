"""Fast per-ray featurization vs the literal reference formulation."""

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import forward_scene, to_device_batch


def test_fast_matches_generic_featurization():
    cfg = Config(dataset_name="synthetic", view_num=4, N_samples=9,
                 batch_size=80, patch_size=4, patch_num=4, n_depth_rays=32)
    ds = build_dataset(cfg.replace(datadir=""), "train")
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (32, 64))
    batch = to_device_batch(ds[0])
    key = jax.random.PRNGKey(2)

    from ucnerf_tpu.train.loop import unnormalize, _stage_planes
    from ucnerf_tpu.ops.rays import build_train_rays
    from ucnerf_tpu.render.renderer import gen_pts_feats
    from ucnerf_tpu.render.fast_feats import gen_pts_feats_fast

    imgs = unnormalize(batch["images"])
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]
    mvs_out = mvs.apply({"params": params["mvs"]}, batch["images"][1:],
                        batch["affine_mat"], batch["affine_mat_inv"],
                        near, far)
    conf = mvs_out["stage3"]["photometric_confidence"]
    rays = build_train_rays(
        key, image_tgt=imgs[0], confidence=conf,
        sparse_coords=batch["sparse_coords"],
        sparse_mask=batch["sparse_mask"], intrinsic=batch["intrinsics"][0],
        c2w=batch["c2ws"][0], w2c_ref=batch["w2cs"][0],
        intrinsic_ref=batch["intrinsics"][0], near_ref=near, far_ref=far,
        stage_planes=_stage_planes(mvs_out, 0), patch_size=cfg.patch_size,
        patch_num=cfg.patch_num, n_uniform=cfg.n_uniform_rays,
        n_samples=cfg.N_samples)

    generic = gen_pts_feats(rays, mvs_out, conf, imgs[1:], batch["w2cs"][1:],
                            batch["intrinsics"][1:])
    stage_volumes = {k: mvs_out[f"stage{k}"]["volume_feature"]
                     for k in (1, 2, 3)}
    from ucnerf_tpu.render.fast_feats import pack_quads
    packed = pack_quads(jnp.concatenate([imgs[1:], mvs_out["img_feats"]], axis=-1))
    fast = gen_pts_feats_fast(rays, stage_volumes, conf, packed,
                              batch["w2cs"][1:], batch["intrinsics"][1:],
                              (32, 64))

    g = np.asarray(generic)
    f = np.asarray(fast)
    assert g.shape == f.shape
    # identical up to the fp round-off of the xy projection (the fast path
    # uses the exact integer pixel; the generic path reprojects the 3D point)
    scale = np.abs(g).max()
    assert np.abs(g - f).max() <= 2e-3 * scale + 1e-4, \
        np.abs(g - f).max()
    # mask channels (every 4th in the colors block) must agree exactly-ish
    v1 = 3
    masks_g = g[..., 24 + 3:24 + 4 * v1:4]
    masks_f = f[..., 24 + 3:24 + 4 * v1:4]
    assert (masks_g == masks_f).mean() > 0.999
