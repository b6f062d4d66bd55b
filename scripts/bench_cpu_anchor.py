"""Cross-framework anchor: reference (torch) vs this repo (JAX), SAME CPU.

The CUDA reference cannot run in this environment, so BENCH_r*.json's
``vs_baseline`` is self-referential (our round-1 number).  This script
produces the one cross-framework comparison that IS possible here: both
frameworks executing the same training-step math on identical hardware
(the host CPU), from identical converted parameters, on the same scene
sample and the same pinned ray batch.

- reference side: its own ``CascadeMVSNet`` forward -> ``rendering`` ->
  5-term loss assembly (reference ``train.py:164-188``) -> backward ->
  ``torch.optim.Adam`` step, imported from ``/root/reference`` with the
  CPU shims of ``tests/test_reference_parity.py``.
- our side: the single-jit train step (``train.loop.make_train_step``:
  MVS fwd + ray build + render + losses + backward + Adam).

Caveats (documented in BASELINE.md with the result):
- CPU-relative speed does NOT transfer to CUDA-vs-TPU; this anchors
  framework/runtime efficiency of the same computation, nothing more.
- The ray batch is built once outside both timed regions for the
  reference (its builder needs its Lightning dataset plumbing) while OUR
  step builds rays inside the timed jit — a small advantage TO the
  reference.
- Both sides run the full operating point by default; pass --half for a
  reduced one if wall-clock is constrained.

Usage:
    JAX_PLATFORMS=cpu python scripts/bench_cpu_anchor.py [--steps 3] [--half]
"""

import argparse
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

# The axon TPU plugin's sitecustomize sets jax_platforms="axon,cpu" via
# jax.config at interpreter start, which OVERRIDES the env var — jax then
# initializes the axon backend anyway (and hangs/fails when the tunnel is
# down).  Force it back before any backend initializes (same as
# tests/conftest.py).  This is a same-host CPU anchor by definition.
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--half", action="store_true",
                    help="160x128 / V=5 reduced operating point")
    ap.add_argument("--eval", action="store_true",
                    help="anchor the EVAL frame (full-image render, "
                         "validation_step protocol) instead of the train "
                         "step")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from test_reference_parity import import_reference
    reference = import_reference()
    import utils.loss as ref_loss

    from ucnerf_tpu.config import Config
    from ucnerf_tpu.data.synthetic import SyntheticDataset
    from ucnerf_tpu.models.factory import create_models, init_params
    from ucnerf_tpu.train.loop import (scene_inputs, scene_loss,
                                       to_device_batch)
    from ucnerf_tpu.utils.checkpoint_io import (export_casmvsnet_state_dict,
                                                export_nerf_state_dict)

    if args_cli.half:
        H, W, V = 128, 160, 5
        cfg = Config(dataset_name="synthetic", view_num=V, batch_size=1000,
                     patch_size=6, patch_num=25, n_depth_rays=512,
                     N_samples=90, chunk=1024, nerf_dtype="float32")
    else:
        # the SCARED operating point (BASELINE.md): 320x256, V=7,
        # 2000 uniform + 50x6^2 patch + 1024 sparse rays x 90 samples
        H, W, V = 256, 320, 7
        cfg = Config(dataset_name="synthetic", view_num=V, batch_size=2000,
                     patch_size=6, patch_num=50, n_depth_rays=1024,
                     N_samples=90, chunk=1024, nerf_dtype="float32")
    # sample_rate=2 keeps every other image for train, so 2V images
    # yield the V train views a sample needs
    ds = SyntheticDataset("", split="train", n_views=V, img_wh=(W, H),
                          n_depth_rays=cfg.n_depth_rays, n_sparse=1024,
                          n_images=2 * V)
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
    db = params["nerf"]["nerf"]["pts_bias_depth_fine"]["Dense_0"]
    db["kernel"] = db["kernel"] * 0.05     # tame the bias-multiply trunk
    db["bias"] = db["bias"] * 0.05         # (see tests/test_reference_parity)
    sample = ds[0]
    batch = to_device_batch(sample)

    # ---------------- our side, f32 (bit-comparable math; the TPU default
    # bf16 MLP would be an unfair advantage here)
    tx = optax.adam(5e-4, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    rays_fn = jax.jit(
        lambda p, k: scene_inputs(cfg, mvs, p, batch, k, train=True)[3])

    key = jax.random.PRNGKey(7)
    if args_cli.eval:
        # full-image render, validation_step protocol (reference
        # train.py:213-324): one MVS forward + H*W rays in chunks
        from ucnerf_tpu.train.loop import make_eval_render
        render_view = make_eval_render(cfg, nerf, mvs, (H, W))
        print("compiling + warming our eval render ...", flush=True)
        t0 = time.perf_counter()
        for _ in range(args_cli.warmup):
            rgb_j, depth_j, _ = render_view(params, batch)
            float(jnp.sum(rgb_j) + jnp.sum(depth_j))   # value-fetch sync
        print(f"  compile+warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        ours = []
        for _ in range(args_cli.steps):
            t0 = time.perf_counter()
            rgb_j, depth_j, _ = render_view(params, batch)
            float(jnp.sum(rgb_j) + jnp.sum(depth_j))
            ours.append(time.perf_counter() - t0)
            print(f"  ours: {ours[-1]:.2f}s", flush=True)
    else:
        @jax.jit
        def our_step(params, opt_state, key):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: scene_loss(cfg, nerf, mvs, p, batch, key),
                has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        print("compiling + warming our step ...", flush=True)
        t0 = time.perf_counter()
        p_run, o_run = params, opt_state
        for _ in range(args_cli.warmup):
            key, sub = jax.random.split(key)
            p_run, o_run, loss = our_step(p_run, o_run, sub)
            float(loss)                         # value-fetch sync
        print(f"  compile+warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        ours = []
        for _ in range(args_cli.steps):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            p_run, o_run, loss = our_step(p_run, o_run, sub)
            float(loss)
            ours.append(time.perf_counter() - t0)
            print(f"  ours: {ours[-1]:.2f}s loss {float(loss):.4f}",
                  flush=True)

    # ---------------- reference side: same params through its own modules
    _t = lambda x: torch.from_numpy(np.ascontiguousarray(np.asarray(x)))
    imgs = _t(sample["images"]).permute(0, 3, 1, 2)[None]
    ref_cas = reference.mvs.CascadeMVSNet(view_num=V)
    ref_cas.load_state_dict(
        {k: _t(v) for k, v in
         export_casmvsnet_state_dict(params["mvs"]).items()}, strict=False)
    ref_cas.train()
    feat_dim = 24 + (V - 1) * 12 + 1
    ref_nerf = reference.models.UCNeRF(
        D=cfg.netdepth, W=cfg.netwidth, input_ch_pts=3 + 6 * cfg.multires,
        input_ch_views=27, input_ch_feat=feat_dim, skips=[4], net_type="v0",
        view_num=V)
    ref_nerf.load_state_dict(
        {k: _t(v) for k, v in export_nerf_state_dict(params["nerf"]).items()},
        strict=False)
    # eval protocol matches tests/test_reference_parity.py: cascade in train
    # mode (live BN stats, like our per-batch semantics), MLP in eval mode
    ref_nerf.eval() if args_cli.eval else ref_nerf.train()
    opt_t = torch.optim.Adam(
        list(ref_cas.parameters()) + list(ref_nerf.parameters()),
        lr=5e-4, betas=(0.9, 0.999), eps=1e-8)

    embed_fn, _ = reference.models.get_embedder(cfg.multires)
    embeddirs_fn, _ = reference.models.get_embedder(cfg.multires_views)
    network_query_fn = (
        lambda pts, viewdirs, rays_feats, network_fn:
        reference.renderer.run_network_mvs(
            pts, viewdirs, rays_feats, network_fn, embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn, netchunk=1024))
    rargs = types.SimpleNamespace(
        view_num=V, feat_dim=feat_dim, img_downscale=1.0,
        use_color_volume=False, net_type="v0", N_samples=cfg.N_samples,
        netchunk=1024, pad=cfg.pad, chunk=cfg.chunk, netdepth=cfg.netdepth,
        netwidth=cfg.netwidth, white_bkgd=False)
    near_fars = _t(sample["near_fars"])
    pose_ref = {"w2cs": _t(sample["w2cs"]), "c2ws": _t(sample["c2ws"]),
                "intrinsics": _t(sample["intrinsics"]),
                "near_fars": near_fars}
    from ucnerf_tpu.data.base import IMAGENET_MEAN, IMAGENET_STD
    mean = torch.tensor(IMAGENET_MEAN).view(1, 1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 1, 3, 1, 1)
    imgs_un = imgs * std + mean
    gt_ms = {k: _t(v)[None] for k, v in sample["sparse_depth_ms"].items()}
    w_ms = {k: _t(v)[None] for k, v in sample["weight_ms"].items()}
    dpt_t = _t(sample["dpt"])
    sparse_d_t = _t(sample["sparse_depths"])
    sparse_w_t = _t(sample["sparse_weights"])
    pn, ps = cfg.patch_num, cfg.patch_size
    patch_pts = pn * ps * ps
    n_fixed = cfg.batch_size

    def reference_step(rays):
        """Reference train.py:110-211 math on the pinned ray batch."""
        opt_t.zero_grad()
        _, confidence_t, _, outputs = ref_cas(
            imgs[:, 1:], _t(sample["affine_mat"]),
            _t(sample["affine_mat_inv"]), near_fars[0], pad=cfg.pad)
        rays_ndc = {k: _t(rays["ndc"][k]) for k in rays["ndc"]}
        rgb_t, depth_t = reference.renderer.rendering(
            rargs, pose_ref, _t(rays["points_world"]), rays_ndc,
            _t(rays["depth_candidates"]), _t(rays["rays_d"]), outputs,
            imgs_un[:, 1:], near_fars=near_fars[0],
            img_feat=outputs["stage3"]["img_feats"],
            confidence=confidence_t,
            network_fn=ref_nerf, network_query_fn=network_query_fn)
        coords = rays["pixel_coords"]
        patch_depth = depth_t[:patch_pts].reshape(-1, ps, ps)
        patch_dpt = dpt_t[coords[:patch_pts, 0],
                          coords[:patch_pts, 1]].reshape(pn, ps, ps)
        dcoords = coords[n_fixed:]
        smooth = reference.mvs.EdgePreservingSmoothnessLoss()(
            patch_depth[:pn // 2], patch_dpt[:pn // 2][..., None])
        scaleinv = ref_loss.GradientLoss()(
            patch_depth[pn // 2:], patch_dpt[pn // 2:],
            torch.ones_like(patch_depth[pn // 2:]))
        nerf_depth = torch.mean(
            (depth_t[n_fixed:] - sparse_d_t[dcoords[:, 0], dcoords[:, 1]])
            ** 2 * sparse_w_t[dcoords[:, 0], dcoords[:, 1]])
        mvs_total, _ = reference.mvs.cas_mvsnet_loss(outputs, gt_ms, w_ms)
        img = ref_loss.img2mse(rgb_t, _t(rays["colors"]))
        loss_t = (nerf_depth * 0.05 + mvs_total * 0.05 + smooth * 0.05
                  + scaleinv * 0.008 + img * 5.0)
        loss_t.backward()
        opt_t.step()
        return float(loss_t)

    def reference_frame():
        """Reference validation_step protocol (train.py:213-324): MVS
        forward + all H*W rays in --chunk batches, under no_grad."""
        with torch.no_grad():
            _, confidence_t, _, outputs = ref_cas(
                imgs[:, 1:], _t(sample["affine_mat"]),
                _t(sample["affine_mat_inv"]), near_fars[0], pad=cfg.pad)
            tgt_to_world = pose_ref["c2ws"][0]
            world_to_ref = pose_ref["w2cs"][0]
            intrinsic = pose_ref["intrinsics"][0]
            rgbs = []
            n_chunks = H * W // cfg.chunk + int(H * W % cfg.chunk > 0)
            for ci in range(n_chunks):
                (rays_pts, rays_dir, rays_NDC, depth_candidates, rays_o,
                 ndc_parameters) = reference.utils.build_rays_test(
                    H, W, tgt_to_world, world_to_ref, intrinsic, near_fars,
                    near_fars[-1], cfg.N_samples, pad=cfg.pad,
                    chunk=cfg.chunk, idx=ci, outputs=outputs)
                rgb_c, _depth_c = reference.renderer.rendering(
                    rargs, pose_ref, rays_pts, rays_NDC, depth_candidates,
                    rays_dir, outputs, imgs_un[:, 1:],
                    near_fars=near_fars[0],
                    img_feat=outputs["stage3"]["img_feats"],
                    confidence=confidence_t, ndc_parameters=ndc_parameters,
                    network_fn=ref_nerf, network_query_fn=network_query_fn)
                rgbs.append(rgb_c)
            return float(torch.cat(rgbs).sum())

    if args_cli.eval:
        print("warming the reference eval frame ...", flush=True)
        for _ in range(args_cli.warmup):
            reference_frame()
        theirs = []
        for _ in range(args_cli.steps):
            t0 = time.perf_counter()
            reference_frame()
            theirs.append(time.perf_counter() - t0)
            print(f"  reference: {theirs[-1]:.2f}s", flush=True)
    else:
        key = jax.random.PRNGKey(7)
        rays = jax.tree.map(np.asarray, rays_fn(params, key))  # pinned
        # batch, built OUTSIDE the reference's timed region (advantage:
        # reference)
        print("warming the reference step ...", flush=True)
        for _ in range(args_cli.warmup):
            loss_t = reference_step(rays)
        theirs = []
        for _ in range(args_cli.steps):
            t0 = time.perf_counter()
            loss_t = reference_step(rays)
            theirs.append(time.perf_counter() - t0)
            print(f"  reference: {theirs[-1]:.2f}s loss {loss_t:.4f}",
                  flush=True)

    ours_med, theirs_med = float(np.median(ours)), float(np.median(theirs))
    print(json.dumps({
        "metric": ("same_cpu_eval_frame_speedup_vs_reference"
                   if args_cli.eval else
                   "same_cpu_train_step_speedup_vs_reference"),
        "value": round(theirs_med / ours_med, 3),
        "unit": "x",
        "extra": {
            "operating_point": "half" if args_cli.half else "full",
            "img_hw": [H, W], "views": V,
            "rays": (H * W if args_cli.eval else int(cfg.n_train_rays)),
            "samples": cfg.N_samples,
            ("ours_s_per_frame" if args_cli.eval else "ours_s_per_step"):
                round(ours_med, 3),
            ("reference_s_per_frame" if args_cli.eval
             else "reference_s_per_step"): round(theirs_med, 3),
            "torch_threads": torch.get_num_threads(),
            "cpu_count": os.cpu_count(),
        }}))


if __name__ == "__main__":
    main()
