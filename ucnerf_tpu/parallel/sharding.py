"""Scene-data-parallel training over a device mesh.

Design (SURVEY.md §2.4): a batch of N scenes shards over the mesh 'data'
axis; parameters and optimizer state are replicated.  The per-scene loss is
vmapped, the mean taken across scenes, and jit + NamedSharding constraints
let XLA insert the gradient all-reduce over ICI — no hand-written
collectives (the pjit way, not a NCCL translation).

The stage pyramids (dict leaves of different spatial shapes) batch fine —
every leaf just gains a leading scene dim.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ucnerf_tpu.config import Config
from ucnerf_tpu.train.loop import TrainState, forward_scene
from ucnerf_tpu.train.losses import total_loss


def stack_batches(samples: List[Dict]) -> Dict:
    """Stack N per-scene samples into a scene-batched pytree."""
    return jax.tree.map(lambda *xs: np.stack(xs), *samples)


def _scene_loss(cfg: Config, nerf, mvs, params, batch, key):
    rgb, depth, rays, mvs_out = forward_scene(cfg, nerf, mvs, params, batch,
                                              key, train=True)
    coords = rays["pixel_coords"]
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
        target_weights=target_weights, depth_ray_mask=rays["depth_ray_mask"],
        dpt_patches=dpt_patches, n_rays_fixed=n_fixed)


def make_parallel_train_step(cfg: Config, nerf, mvs, tx, mesh: Mesh,
                             axis: str = "data"):
    """Build the jitted scene-parallel train step.

    batch: scene-batched pytree with leading dim == mesh axis size;
    keys: [N] PRNG keys (one per scene).
    """
    batch_spec = P(axis)
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch, keys):
        def one(b, k):
            return _scene_loss(cfg, nerf, mvs, params, b, k)
        losses, metrics = jax.vmap(one)(batch, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    @jax.jit
    def train_step(state: TrainState, batch, keys):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(
                lambda x: NamedSharding(mesh, P(axis,
                                                *([None] * (x.ndim - 1)))),
                batch))
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, keys)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: repl, grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_parallel_eval_render(cfg: Config, nerf, mvs, img_hw, mesh: Mesh,
                              axis: str = "data"):
    """Ray-sharded full-image eval render over the mesh (SURVEY §2.4(a)/§7
    step 7 — the TPU answer to the reference's single-device chunk loop,
    reference ``train.py:251-256``).

    The per-view context (MVS forward + featurization inputs) is computed
    replicated; the pixel tiles shard over the mesh axis via ``shard_map``,
    each device lax.maps its local tiles, and the frame reassembles from the
    sharded output (XLA inserts the gather on host fetch — no collective in
    the hot loop).
    """
    from ucnerf_tpu.train.loop import (prepare_view_ctx, view_chunk_fns)

    H, W = img_hw
    n_dev = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    @jax.jit
    def render_view(params, batch, key=None):
        params = jax.lax.with_sharding_constraint(
            params, jax.tree.map(lambda _: repl, params))
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: repl, batch))
        ctx = prepare_view_ctx(cfg, nerf, mvs, params, batch)
        if cfg.eval_jitter:
            ctx["eval_key"] = (jax.random.PRNGKey(0) if key is None else key)

        chunk = cfg.chunk
        n = H * W
        per_round = chunk * n_dev
        n_pad = (n + per_round - 1) // per_round * per_round
        idx = jnp.arange(n_pad) % n
        tiles = idx.reshape(n_dev, -1, chunk)

        def local(ctx, tiles_local):
            build_chunk, render_chunk = view_chunk_fns(cfg, nerf, H, W, ctx)

            def body(pix):
                return render_chunk(build_chunk(pix))

            rgb, depth = jax.lax.map(body, tiles_local[0])
            return rgb[None], depth[None]

        rgb, depth = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=(P(axis), P(axis)))(ctx, tiles)
        rgb = rgb.reshape(n_pad, 3)[:n].reshape(H, W, 3)
        depth = depth.reshape(n_pad)[:n].reshape(H, W)
        return jnp.clip(rgb, 0.0, 1.0), depth, ctx["confidence"]

    return render_view


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def shard_scene_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        batch)
