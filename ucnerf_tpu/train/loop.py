"""Jitted training / evaluation steps.

The reference's training_step (``train.py:110-211``) is a python pipeline of
MVS forward -> build_rays -> rendering -> 5-term loss -> Lightning autograd.
Here the *entire* step — including ray generation — is one jit-compiled pure
function of (params, opt_state, batch, rng), so XLA fuses featurization into
the MLP matmuls and nothing round-trips to host.

LR schedule: Adam β=(0.9,0.999) + per-epoch cosine annealing to eps
(reference ``train.py:85-92``).  ``--finetune`` freezes the MVS tree via a
zero-gradient mask (reference ``network/models.py:249-250``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ucnerf_tpu.config import Config
from ucnerf_tpu.data.base import IMAGENET_MEAN, IMAGENET_STD
from ucnerf_tpu.ops.rays import build_train_rays, build_test_rays
from ucnerf_tpu.render.renderer import render_rays, render_image_chunked
from ucnerf_tpu.train.losses import total_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def cosine_epoch_schedule(lrate: float, num_epochs: int,
                          steps_per_epoch: int, eta_min: float = 1e-7):
    """torch CosineAnnealingLR(T_max=num_epochs) stepped once per epoch."""
    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs)
        return eta_min + (lrate - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / num_epochs))
    return schedule


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """--lr_scheduler cosine|steplr|poly.

    The reference PARSES all three (opt.py:58-60) but builds only cosine
    (train.py:89) — steplr/poly are dead flags there.  Here all three work:
    - cosine: torch CosineAnnealingLR(T_max=num_epochs), per-epoch (parity).
    - steplr: torch MultiStepLR over global steps — lr * gamma^(#milestones
      passed), milestones = --decay_step, gamma = --decay_gamma.
    - poly:   lr * (1 - epoch/num_epochs)^0.9 (the standard poly power; the
      reference never defined one).
    """
    if cfg.lr_scheduler == "cosine":
        return cosine_epoch_schedule(cfg.lrate, cfg.num_epochs,
                                     steps_per_epoch)
    if cfg.lr_scheduler == "steplr":
        milestones = jnp.asarray(cfg.decay_step)

        def steplr(step):
            n = jnp.sum(step >= milestones)
            return cfg.lrate * cfg.decay_gamma ** n
        return steplr
    if cfg.lr_scheduler == "poly":
        total = cfg.num_epochs

        def poly(step):
            epoch = jnp.minimum(step // steps_per_epoch, total)
            return cfg.lrate * (1.0 - epoch / total) ** 0.9
        return poly
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")


def make_optimizer(cfg: Config, steps_per_epoch: int):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.adam(sched, b1=0.9, b2=0.999)
    if cfg.finetune is not None:
        # freeze the MVS ("Consistency Learner") parameters; everything
        # else (nerf, optional appearance table) keeps training.
        # NOTE: optax.masked is the WRONG tool here — it passes masked-out
        # leaves' updates through UNCHANGED (raw gradients would be applied
        # to the "frozen" tree); multi_transform + set_to_zero freezes.
        def labels(params):
            return {k: jax.tree.map(
                lambda _: "freeze" if k == "mvs" else "train", v)
                for k, v in params.items()}
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def unnormalize(images):
    """Undo ImageNet normalization (reference ``unpreprocess``,
    ``train.py:61-70``); images [..., 3] channel-last."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return images * std + mean


def _stage_planes(mvs_out, pad: int):
    """Per-stage (near, far) depth planes for ray building
    (reference ``utils/utils.py:524-541``).  For pad > 0 the reference
    indexes the padded stage-3 planes with unpadded pixel coords (an
    off-by-pad quirk); we crop the pad so coordinates line up."""
    planes = {}
    for k in (1, 2, 3):
        dv = mvs_out[f"stage{k}"]["depth_values"]
        near_p, far_p = dv[0], dv[-1]
        if k == 3 and pad > 0:
            near_p = near_p[pad:-pad, pad:-pad]
            far_p = far_p[pad:-pad, pad:-pad]
        planes[k] = (near_p, far_p)
    return planes


def scene_inputs(cfg: Config, mvs, params, batch, key, train: bool = True,
                 mvs_apply=None):
    """MVS forward + train-ray build for one scene sample — the replicated
    prefix shared by the serial step and the ray-sharded parallel step
    (``parallel.sharding.make_parallel_train_step_rays``).

    ``mvs_apply(params_mvs, imgs_src, affine_mat, affine_mat_inv, near,
    far, pad)`` overrides the cascade forward (used by the view-sharded
    variant, ``parallel.mvs_views.make_view_sharded_cascade``)."""
    imgs_norm = batch["images"]                       # [V, H, W, 3]
    imgs = unnormalize(imgs_norm)
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]

    if cfg.finetune is not None:
        # Finetune freezes the Consistency Learner (reference
        # ``network/models.py:249-250``).  In torch, requires_grad=False
        # means autograd never BUILDS the cascade backward; stop_gradient
        # gives JAX the same information, so the entire MVS backward
        # (~124 ms of the 193 ms step, BASELINE.md perf map) is pruned at
        # trace time instead of computed and then zeroed by the optimizer
        # mask (``make_optimizer``, which stays as the belt-and-braces
        # freeze for any path that skips this prefix).
        params = dict(params, mvs=jax.tree.map(jax.lax.stop_gradient,
                                               params["mvs"]))

    if mvs_apply is None:
        mvs_out = mvs.apply({"params": params["mvs"]}, imgs_norm[1:],
                            batch["affine_mat"], batch["affine_mat_inv"],
                            near, far, pad=cfg.pad)
    else:
        mvs_out = mvs_apply(params["mvs"], imgs_norm[1:],
                            batch["affine_mat"], batch["affine_mat_inv"],
                            near, far, cfg.pad)
    confidence = mvs_out["stage3"]["photometric_confidence"]

    rays = build_train_rays(
        key,
        image_tgt=imgs[0], confidence=confidence,
        sparse_coords=batch["sparse_coords"],
        sparse_mask=batch["sparse_mask"],
        intrinsic=batch["intrinsics"][0], c2w=batch["c2ws"][0],
        w2c_ref=batch["w2cs"][0], intrinsic_ref=batch["intrinsics"][0],
        near_ref=near, far_ref=far,
        stage_planes=_stage_planes(mvs_out, cfg.pad),
        patch_size=cfg.patch_size, patch_num=cfg.patch_num,
        n_uniform=cfg.n_uniform_rays, n_samples=cfg.N_samples,
        jitter=train and cfg.perturb > 0)
    return imgs, mvs_out, confidence, rays


def forward_scene(cfg: Config, nerf, mvs, params, batch, key,
                  train: bool = True):
    """MVS forward + ray build + render for one scene sample."""
    imgs, mvs_out, confidence, rays = scene_inputs(cfg, mvs, params, batch,
                                                   key, train)

    def nerf_apply(pts, dirs, feats):
        return nerf.apply({"params": params["nerf"]}, pts, dirs, feats)

    rgb, depth = render_rays(nerf_apply, rays, mvs_out, confidence,
                             imgs[1:], batch["w2cs"][1:],
                             batch["intrinsics"][1:], batch["w2cs"][0],
                             white_bkgd=cfg.white_bkgd,
                             fast=cfg.fast_featurization)
    return rgb, depth, rays, mvs_out


def make_train_step(cfg: Config, nerf, mvs, tx):
    """Build the jitted single-scene train step."""
    loss_fn = _make_loss_fn(cfg, nerf, mvs)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_step_scan(cfg: Config, nerf, mvs, tx, donate: bool = False):
    """K training steps per dispatch via ``lax.scan``.

    The axon/TPU dispatch overhead is ~32 ms per synced host call
    (BASELINE.md); scanning K steps inside one jit amortizes it to 32/K ms
    per step and batches the host->device sample transfers.  Semantically
    identical to K sequential ``make_train_step`` calls (tested).

    ``batches``: sample pytree stacked on a leading [K] axis;
    ``keys``: [K] PRNG keys.  Returns the final state and the LAST step's
    metrics (matching what a sequential loop would report).

    ``donate``: donate the input TrainState's buffers to the output
    (``jax.jit(donate_argnums=0)``) — XLA aliases params+opt_state in place,
    saving one state copy per dispatch; the caller's input state is dead
    after the call.  Measured on v5e (scripts/bench_donation.py): see
    BASELINE.md for the adopt/close verdict.
    """
    loss_fn = _make_loss_fn(cfg, nerf, mvs)

    @lambda f: jax.jit(f, donate_argnums=(0,) if donate else ())
    def train_steps(state: TrainState, batches, keys):
        def one(st, bk):
            b, k = bk
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, b, k)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), metrics
        state, ms = jax.lax.scan(one, state, (batches, keys))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return train_steps


def make_train_step_store(cfg: Config, nerf, mvs, tx):
    """Single train step fed from a device-resident scene store
    (``data/device_store.py``): the batch is gathered from ``store`` by
    the ~10 KB index payload inside the jit, eliminating the per-step
    host assembly + upload of the full sample (measured 193 ms synced
    step vs ~380 ms end-to-end with host loading — BASELINE.md round-4).
    ``store`` is a jit ARGUMENT, never a closure: closed-over arrays
    embed as HLO constants (the DPT HTTP-413 lesson, models/dpt.py)."""
    from ucnerf_tpu.data.device_store import gather_batch
    loss_fn = _make_loss_fn(cfg, nerf, mvs)

    @jax.jit
    def train_step(state: TrainState, store, inds, key):
        batch = gather_batch(store, inds)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_step_scan_store(cfg: Config, nerf, mvs, tx,
                               donate: bool = False):
    """K store-fed steps per dispatch (see ``make_train_step_scan``);
    ``ind_batches`` is the index payload stacked on a leading [K] axis."""
    from ucnerf_tpu.data.device_store import gather_batch
    loss_fn = _make_loss_fn(cfg, nerf, mvs)

    @lambda f: jax.jit(f, donate_argnums=(0,) if donate else ())
    def train_steps(state: TrainState, store, ind_batches, keys):
        def one(st, bk):
            inds, k = bk
            b = gather_batch(store, inds)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, b, k)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), metrics
        state, ms = jax.lax.scan(one, state, (ind_batches, keys))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return train_steps


def scene_loss_terms(cfg: Config, batch, rgb, depth, rays, mvs_out):
    """Assemble the 5-term objective from render outputs.  The ONE place the
    objective is assembled — the serial step, the scene-DP step, and the
    ray-DP step (``parallel.sharding``) all funnel through here."""
    coords = rays["pixel_coords"]                # [(patch|unif|depth), 2]
    patch_pts = cfg.n_patch_rays
    n_fixed = cfg.batch_size

    dpt_patches = batch["dpt"][coords[:patch_pts, 0],
                               coords[:patch_pts, 1]].reshape(
        cfg.patch_num, cfg.patch_size, cfg.patch_size)
    dcoords = coords[n_fixed:]
    target_depths = batch["sparse_depths"][dcoords[:, 0], dcoords[:, 1]]
    target_weights = batch["sparse_weights"][dcoords[:, 0], dcoords[:, 1]]

    return total_loss(
        cfg, rgb=rgb, target_rgb=rays["colors"], depth_pred=depth,
        mvs_out=mvs_out, sparse_depth_ms=batch["sparse_depth_ms"],
        weight_ms=batch["weight_ms"], target_depths=target_depths,
        target_weights=target_weights,
        depth_ray_mask=rays["depth_ray_mask"], dpt_patches=dpt_patches,
        n_rays_fixed=n_fixed)


def mvs_only_scene_loss(cfg: Config, mvs, params, batch):
    """``--mvs_only``: optimize ``cas_mvsnet_loss`` alone — no rays, no NeRF,
    no render.  From-scratch pretraining of the Consistency Learner; the
    reference instead hard-downloads ``casmvsnet.ckpt``
    (``network/models.py:240-248``) and has no in-tree way to produce MVS
    weights.  NeRF params receive zero gradients (unused by the loss), so
    Adam leaves them untouched and the checkpoint seeds a full ``--ckpt``
    resume."""
    imgs_norm = batch["images"]
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]
    mvs_out = mvs.apply({"params": params["mvs"]}, imgs_norm[1:],
                        batch["affine_mat"], batch["affine_mat_inv"],
                        near, far, pad=cfg.pad)
    from ucnerf_tpu.train.losses import cas_mvsnet_loss
    loss = cas_mvsnet_loss(mvs_out, batch["sparse_depth_ms"],
                           batch["weight_ms"])
    # diagnostic: mean |depth error| at the supervised (splatted) pixels
    est = mvs_out["stage3"]["depth"]
    gt = batch["sparse_depth_ms"]["stage3"]
    mask = (gt > 0).astype(est.dtype)
    abs_err = (jnp.sum(jnp.abs(est - gt) * mask)
               / jnp.maximum(jnp.sum(mask), 1.0))
    return loss, {"loss": loss, "mvs": loss, "depth_abs": abs_err}


def scene_loss(cfg: Config, nerf, mvs, params, batch, key):
    """Single-scene loss: forward + the 5-term objective (or the MVS-only
    pretraining objective under ``--mvs_only``)."""
    if cfg.mvs_only:
        return mvs_only_scene_loss(cfg, mvs, params, batch)
    rgb, depth, rays, mvs_out = forward_scene(cfg, nerf, mvs, params,
                                              batch, key, train=True)
    return scene_loss_terms(cfg, batch, rgb, depth, rays, mvs_out)


def _make_loss_fn(cfg: Config, nerf, mvs):
    def loss_fn(params, batch, key):
        return scene_loss(cfg, nerf, mvs, params, batch, key)

    return loss_fn


def prepare_view_ctx(cfg: Config, nerf, mvs, params, batch,
                     mvs_apply=None) -> Dict:
    """Per-view render context: MVS forward + featurization inputs.

    Everything downstream of this is per-ray work; the returned pytree is
    exactly what ``view_chunk_fns`` needs, which makes it the natural
    replicated operand of the mesh-sharded eval render
    (``parallel.sharding.make_parallel_eval_render``).  ``mvs_apply``
    overrides the cascade forward like in ``scene_inputs``."""
    imgs_norm = batch["images"]
    imgs = unnormalize(imgs_norm)
    near, far = batch["near_fars"][0, 0], batch["near_fars"][0, 1]
    if mvs_apply is None:
        mvs_out = mvs.apply({"params": params["mvs"]}, imgs_norm[1:],
                            batch["affine_mat"], batch["affine_mat_inv"],
                            near, far, pad=cfg.pad)
    else:
        mvs_out = mvs_apply(params["mvs"], imgs_norm[1:],
                            batch["affine_mat"], batch["affine_mat_inv"],
                            near, far, cfg.pad)
    confidence = mvs_out["stage3"]["photometric_confidence"]

    from ucnerf_tpu.render.renderer import make_feat_ctx
    cv = ((batch["c2ws"][0], batch["intrinsics"][0], near, far,
           cfg.color_volume_depths) if cfg.use_color_volume else None)
    feat_ctx = make_feat_ctx(mvs_out, confidence, imgs[1:],
                             batch["w2cs"][1:], batch["intrinsics"][1:],
                             color_volume=cv)

    packed = None
    from ucnerf_tpu.pallas.mlp_kernel import (pack_mlp_weights,
                                              pallas_supported)
    if cfg.use_pallas and pallas_supported():
        packed = pack_mlp_weights(
            params["nerf"],
            dtype=jnp.bfloat16 if cfg.nerf_dtype != "float32"
            else jnp.float32)

    return dict(nerf_params=params["nerf"], packed=packed, mvs_out=mvs_out,
                confidence=confidence, imgs_src=imgs[1:],
                w2cs=batch["w2cs"], intrinsics=batch["intrinsics"],
                c2w_tgt=batch["c2ws"][0], near=near, far=far,
                feat_ctx=feat_ctx)


def view_chunk_fns(cfg: Config, nerf, H: int, W: int, ctx: Dict):
    """(build_chunk, render_chunk) closures over a ``prepare_view_ctx``."""
    planes = _stage_planes(ctx["mvs_out"], cfg.pad)
    eval_key = ctx.get("eval_key")     # set iff cfg.eval_jitter

    def build_chunk(pix):
        key = (None if eval_key is None
               else jax.random.fold_in(eval_key, pix[0]))
        return build_test_rays(
            pix, H=H, W=W, intrinsic=ctx["intrinsics"][0],
            c2w=ctx["c2w_tgt"], w2c_ref=ctx["w2cs"][0],
            intrinsic_ref=ctx["intrinsics"][0], near_ref=ctx["near"],
            far_ref=ctx["far"], stage_planes=planes,
            n_samples=cfg.N_samples, key=key)

    if ctx["packed"] is not None:
        from ucnerf_tpu.pallas.mlp_kernel import fused_nerf_mlp

        def nerf_apply(pts, dirs, feats):
            return fused_nerf_mlp(
                pts, dirs, feats, ctx["packed"], multires=cfg.multires,
                multires_views=cfg.multires_views, view_num=cfg.view_num,
                depth=cfg.netdepth, skips=tuple(cfg.skips))
    else:
        def nerf_apply(pts, dirs, feats):
            return nerf.apply({"params": ctx["nerf_params"]}, pts, dirs,
                              feats)

    def render_chunk(rays):
        return render_rays(nerf_apply, rays, ctx["mvs_out"],
                           ctx["confidence"], ctx["imgs_src"],
                           ctx["w2cs"][1:], ctx["intrinsics"][1:],
                           ctx["w2cs"][0], white_bkgd=cfg.white_bkgd,
                           fast=cfg.fast_featurization,
                           feat_ctx=ctx["feat_ctx"])

    return build_chunk, render_chunk


def make_eval_render(cfg: Config, nerf, mvs, img_hw: Tuple[int, int],
                     mvs_apply=None):
    """Full-image eval render (reference ``validation_step``,
    ``train.py:213-324``): one MVS forward, then a tile scan (lax.scan, unroll=cfg.eval_unroll) over ray tiles.

    ``mvs_apply`` overrides the cascade forward (``prepare_view_ctx``) —
    used by render_path.py's serving layout to reuse cached FeatureNet
    outputs for the fixed source views."""
    H, W = img_hw

    @jax.jit
    def render_view(params, batch, key=None):
        ctx = prepare_view_ctx(cfg, nerf, mvs, params, batch,
                               mvs_apply=mvs_apply)
        if cfg.eval_jitter:
            ctx["eval_key"] = (jax.random.PRNGKey(0) if key is None else key)
        build_chunk, render_chunk = view_chunk_fns(cfg, nerf, H, W, ctx)
        rgb, depth = render_image_chunked(build_chunk, render_chunk, H, W,
                                          cfg.chunk, unroll=cfg.eval_unroll)
        return jnp.clip(rgb, 0.0, 1.0), depth, ctx["confidence"]

    return render_view


def to_device_batch(sample: Dict) -> Dict:
    """numpy sample -> jnp pytree (drops host-only fields if any)."""
    return jax.tree.map(jnp.asarray, sample)
