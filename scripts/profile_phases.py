"""Per-phase cost breakdown of the train step on the real chip.

Each phase runs K iterations inside ONE jit (lax.scan over varying
inputs, a scalar value-fetch at the end), so the ~32 ms axon dispatch
overhead amortizes to ~2 ms/iter and phases as small as a few ms are
measurable (BASELINE.md methodology notes).  Medians over ITERS calls.

Phases at the SCARED operating point (320x256, V=7):
  featnet_fwd / featnet_grad   FeatureNet over the 6 source views
  cascade_fwd / cascade_grad   full CascadeMVSNet
  rays_fwd                     build_train_rays given a fixed cascade
  render_fwd / render_grad     render_rays given fixed rays+cascade
                               (grad w.r.t. nerf params AND mvs_out —
                               the in-step cotangent surface)
  loss_fwd                     scene_loss_terms given render outputs
  step_single                  full train step, one dispatch

Run:  python scripts/profile_phases.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()
enable_compile_cache()

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.data.synthetic import SyntheticDataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.models.mvs import FeatureNet
from ucnerf_tpu.render.renderer import render_rays
from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                   make_train_step, scene_inputs,
                                   scene_loss_terms, to_device_batch,
                                   unnormalize)

H, W = 256, 320
K = 8          # iterations per dispatch
WARMUP = 2
ITERS = 7


def timed(fn, *args):
    """Median seconds per call of a pre-jitted fn; value-fetch synced."""
    for _ in range(WARMUP):
        float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_phase(body, init_keys):
    """jit(lambda keys: scan(body)) — body(key) -> scalar contribution."""
    @jax.jit
    def run(keys):
        def one(acc, k):
            return acc + body(k), None
        acc, _ = jax.lax.scan(one, jnp.zeros(()), keys)
        return acc
    return lambda: run(init_keys)


def main():
    cfg = Config(dataset_name="synthetic", view_num=7, batch_size=2000,
                 patch_size=6, patch_num=50, n_depth_rays=1024,
                 N_samples=90, num_epochs=30, chunk=1024)
    ds = SyntheticDataset("", split="train", n_views=cfg.view_num,
                          img_wh=(W, H), n_depth_rays=cfg.n_depth_rays,
                          n_sparse=1024, n_images=16)
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
    batch = to_device_batch(ds[0])
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    imgs_norm = batch["images"]
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]
    results = {}

    def report(name, dt_dispatch, base=None):
        per = (dt_dispatch - (base or 0.0)) / K
        results[name] = round(per * 1e3, 2)
        print(f"{name}: {per * 1e3:.2f} ms/iter "
              f"({dt_dispatch * 1e3:.1f} ms/dispatch)", flush=True)
        return per

    # empty scan: dispatch + scan overhead baseline
    dt0 = timed(scan_phase(lambda k: jnp.sum(k.astype(jnp.float32)) * 0.0,
                           keys))
    print(f"empty dispatch: {dt0 * 1e3:.1f} ms", flush=True)

    # --- FeatureNet over the 6 source views ---
    featnet = FeatureNet(mvs.base_channels, mvs.dtype)
    fp = params["mvs"]["feature"]

    def featnet_fwd(key):
        x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
        outs = [featnet.apply({"params": fp}, x[i]) for i in range(6)]
        return sum(jnp.sum(o["stage3"]) + jnp.sum(o["stage1"])
                   + jnp.sum(o["stage2"]) for o in outs).astype(jnp.float32)

    report("featnet_fwd", timed(scan_phase(featnet_fwd, keys)), dt0)

    def featnet_loss(p, key):
        x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
        outs = [featnet.apply({"params": p}, x[i]) for i in range(6)]
        return sum(jnp.sum(o["stage3"]) + jnp.sum(o["stage1"])
                   + jnp.sum(o["stage2"]) for o in outs).astype(jnp.float32)

    def featnet_grad(key):
        g = jax.grad(featnet_loss)(fp, key)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g)) * 1e-20

    report("featnet_grad", timed(scan_phase(featnet_grad, keys)), dt0)

    # --- plane-sweep warp+variance alone (the floor-priced family) ---
    # realistic per-stage inputs at the production shapes/pack factors;
    # fwd = gathers, grad = gathers + cotangent scatter-adds.  Lets the
    # cascade decompose as warpvar + costreg + featnet + range machinery.
    from ucnerf_tpu.models.mvs import _variance_cost_volume
    V1 = cfg.view_num - 1
    rng = np.random.default_rng(0)
    stage_ins = []
    for (D, hs, ws, C) in ((48, H // 4, W // 4, 32),
                           (32, H // 2, W // 2, 16), (8, H, W, 8)):
        feats = jnp.asarray(rng.normal(size=(V1, hs, ws, C)), jnp.float32)
        projs = []
        for v in range(V1):
            ang = 0.02 * (v + 1)
            Rm = np.array([[np.cos(ang), -np.sin(ang), 0.002 * v],
                           [np.sin(ang), np.cos(ang), -0.003 * v],
                           [0, 0, 1]], np.float32)
            T = np.array([5.0 * v - 10.0, 3.0 * v - 8.0, 1.0], np.float32)
            projs.append(np.concatenate([Rm, T[:, None]], 1))
        depth = jnp.broadcast_to(jnp.linspace(2.0, 8.0, D)[:, None, None],
                                 (D, hs, ws))
        stage_ins.append((feats, jnp.asarray(np.stack(projs)), depth))
    feats_all = [s[0] for s in stage_ins]

    def warpvar_sum(fs, key):
        tot = 0.0
        for f, (_, projs, depth) in zip(fs, stage_ins):
            var = _variance_cost_volume(
                f + 1e-12 * key[0].astype(jnp.float32), projs, depth, pad=0)
            tot = tot + jnp.sum(var)
        return tot

    report("warpvar_fwd",
           timed(scan_phase(lambda k: warpvar_sum(feats_all, k) * 1e-12,
                            keys)), dt0)

    def warpvar_grad(key):
        g = jax.grad(warpvar_sum)(feats_all, key)
        return sum(jnp.sum(jnp.abs(l)) for l in g) * 1e-12

    report("warpvar_grad", timed(scan_phase(warpvar_grad, keys)), dt0)

    # --- full cascade ---
    def cascade_fwd(key):
        x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
        out = mvs.apply({"params": params["mvs"]}, x, batch["affine_mat"],
                        batch["affine_mat_inv"], near, far, pad=cfg.pad)
        return (jnp.sum(out["stage3"]["depth"])
                + jnp.sum(out["stage3"]["volume_feature"])
                ).astype(jnp.float32)

    report("cascade_fwd", timed(scan_phase(cascade_fwd, keys)), dt0)

    def cascade_loss(p, key):
        x = imgs_norm[1:] + 1e-8 * key[0].astype(jnp.float32)
        out = mvs.apply({"params": p}, x, batch["affine_mat"],
                        batch["affine_mat_inv"], near, far, pad=cfg.pad)
        return (jnp.sum(out["stage3"]["depth"])
                + jnp.sum(out["stage3"]["volume_feature"])
                + jnp.sum(out["stage3"]["photometric_confidence"])
                ).astype(jnp.float32)

    def cascade_grad(key):
        g = jax.grad(cascade_loss)(params["mvs"], key)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g)) * 1e-20

    report("cascade_grad", timed(scan_phase(cascade_grad, keys)), dt0)

    # --- fixed cascade outputs for the render phases ---
    # NOTE every phase body must DEPEND on the scanned key through its
    # real operands (the 1e-12 perturbations below): a body whose value
    # is key-independent gets hoisted out of the scan by XLA (computed
    # ONCE per dispatch), silently dividing the reported cost by K —
    # observed round-5 (render_fwd read 1.48 ms/iter hoisted vs ~14 real).
    imgs, mvs_out, confidence, rays0 = jax.jit(
        lambda p, b, k: scene_inputs(cfg, mvs, p, b, k))(
        params, batch, jax.random.PRNGKey(3))
    mvs_out = jax.tree.map(jax.lax.stop_gradient, mvs_out)

    from ucnerf_tpu.ops.rays import build_train_rays
    from ucnerf_tpu.train.loop import _stage_planes
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]

    def rays_fwd(key):
        # ray build ALONE on fixed cascade outputs (key feeds both the
        # sampling and a perturbation, so nothing hoists)
        conf = confidence + 1e-12 * key[0].astype(jnp.float32)
        rays = build_train_rays(
            key, image_tgt=imgs[0], confidence=conf,
            sparse_coords=batch["sparse_coords"],
            sparse_mask=batch["sparse_mask"],
            intrinsic=batch["intrinsics"][0], c2w=batch["c2ws"][0],
            w2c_ref=batch["w2cs"][0], intrinsic_ref=batch["intrinsics"][0],
            near_ref=near, far_ref=far,
            stage_planes=_stage_planes(mvs_out, cfg.pad),
            patch_size=cfg.patch_size, patch_num=cfg.patch_num,
            n_uniform=cfg.n_uniform_rays, n_samples=cfg.N_samples,
            jitter=True)
        return (jnp.sum(rays["points_world"].astype(jnp.float32)) * 1e-10
                + jnp.sum(rays["colors"]))

    report("rays_fwd", timed(scan_phase(rays_fwd, keys)), dt0)

    def nerf_apply(pts, dirs, feats):
        return nerf.apply({"params": params["nerf"]}, pts, dirs, feats)

    def _perturbed(key):
        eps = 1e-12 * key[0].astype(jnp.float32)
        mo = dict(mvs_out)
        mo["img_feats"] = mvs_out["img_feats"] + eps
        return mo, confidence + eps

    def render_fwd(key):
        mo, conf = _perturbed(key)
        rgb, depth = render_rays(nerf_apply, rays0, mo, conf,
                                 imgs[1:], batch["w2cs"][1:],
                                 batch["intrinsics"][1:], batch["w2cs"][0],
                                 white_bkgd=cfg.white_bkgd,
                                 fast=cfg.fast_featurization)
        return jnp.sum(rgb) + jnp.sum(depth) * 1e-6

    report("render_fwd", timed(scan_phase(render_fwd, keys)), dt0)

    def render_loss(operands, key):
        p_nerf, mo, conf, im = operands
        eps = 1e-12 * key[0].astype(jnp.float32)
        mo = dict(mo)
        mo["img_feats"] = mo["img_feats"] + eps

        def napply(pts, dirs, feats):
            return nerf.apply({"params": p_nerf}, pts, dirs, feats)
        rgb, depth = render_rays(napply, rays0, mo, conf + eps, im[1:],
                                 batch["w2cs"][1:], batch["intrinsics"][1:],
                                 batch["w2cs"][0],
                                 white_bkgd=cfg.white_bkgd,
                                 fast=cfg.fast_featurization)
        return jnp.sum(rgb) + jnp.sum(depth) * 1e-6

    operands = (params["nerf"], mvs_out, confidence, imgs)

    def render_grad(key):
        g = jax.grad(render_loss)(operands, key)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g)) * 1e-20

    report("render_grad", timed(scan_phase(render_grad, keys)), dt0)

    # --- loss assembly given render outputs ---
    rgb0, depth0 = jax.jit(lambda: render_rays(
        nerf_apply, rays0, mvs_out, confidence, imgs[1:], batch["w2cs"][1:],
        batch["intrinsics"][1:], batch["w2cs"][0],
        white_bkgd=cfg.white_bkgd, fast=cfg.fast_featurization))()

    def loss_fwd(key):
        eps = 1e-12 * key[0].astype(jnp.float32)
        loss, _ = scene_loss_terms(cfg, batch, rgb0 + eps, depth0 + eps,
                                   rays0, mvs_out)
        return loss

    report("loss_fwd", timed(scan_phase(loss_fwd, keys)), dt0)

    # --- full step, K per dispatch (the production shape) ---
    tx = make_optimizer(cfg, steps_per_epoch=200)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, nerf, mvs, tx)

    def run_step():
        nonlocal state
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        return metrics["loss"]

    dt = timed(run_step)
    results["step_single_dispatch"] = round(dt * 1e3, 2)
    print(f"step_single_dispatch: {dt * 1e3:.2f} ms", flush=True)

    # --- eval-frame decomposition (render side of the attribution map):
    # frame_total (production render), frame_feat (featurization gathers
    # only, per-tile, same unroll).  frame_total - frame_feat -
    # cascade_fwd ~= MLP + composite + ray build (the XLA-fused parts
    # that can't be isolated without perturbing the fusion).
    from ucnerf_tpu.render.fast_feats import gen_pts_feats_fast
    from ucnerf_tpu.train.loop import (make_eval_render, prepare_view_ctx,
                                       view_chunk_fns)
    render_view = make_eval_render(cfg, nerf, mvs, (H, W))

    def run_frame():
        rgb, depth, conf = render_view(params, batch)
        return jnp.sum(rgb)

    dtf = timed(run_frame)
    results["frame_total"] = round(dtf * 1e3, 2)
    print(f"frame_total: {dtf * 1e3:.2f} ms", flush=True)

    ctx = jax.jit(lambda p, b: prepare_view_ctx(cfg, nerf, mvs, p, b))(
        params, batch)
    build_chunk, _ = view_chunk_fns(cfg, nerf, H, W, ctx)
    n_tiles = (H * W + cfg.chunk - 1) // cfg.chunk
    tiles = jnp.arange(n_tiles * cfg.chunk) % (H * W)
    tiles = tiles.reshape(n_tiles, cfg.chunk)

    @jax.jit
    def feat_frame():
        def body(acc, pix):
            rays = build_chunk(pix)
            feats = gen_pts_feats_fast(
                rays, ctx["feat_ctx"]["stage_volumes"],
                ctx["feat_ctx"]["confidence"],
                ctx["feat_ctx"]["quad_views"],
                ctx["feat_ctx"]["src_w2cs"],
                ctx["feat_ctx"]["src_intrinsics"],
                ctx["feat_ctx"]["img_hw"])
            return acc + jnp.sum(feats.astype(jnp.float32)) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), tiles,
                              unroll=cfg.eval_unroll)
        return acc

    dtff = timed(feat_frame)
    results["frame_feat"] = round(dtff * 1e3, 2)
    results["frame_mlp_composite_est"] = round(
        (dtf - dtff - results["cascade_fwd"] / 1e3) * 1e3, 2)
    print(f"frame_feat: {dtff * 1e3:.2f} ms; "
          f"frame - feat - cascade_fwd = "
          f"{results['frame_mlp_composite_est']:.2f} ms (MLP+composite+"
          "ray build est.)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
