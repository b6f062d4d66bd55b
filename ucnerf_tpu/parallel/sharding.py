"""Data-parallel training over a device mesh — two semantics (SURVEY §2.4):

**Ray-DP** (``make_parallel_train_step_rays``, §2.4(a), ``--parallel_mode
rays``): ONE scene per step — the reference's exact training regime
(reference ``train.py:433`` is single-GPU, 1 scene/step).  The MVS forward
and ray build run replicated (they are ~1/3 of the step and produce the
whole-image tensors every ray needs); the [patches|uniform|sparse] ray batch
then shards over the mesh via ``shard_map``, each device renders its rays,
and the loss is assembled on the gathered per-ray outputs.  Gradients of the
replicated operands (params, MVS outputs) psum over ICI in the shard_map
transpose.  Same batch, same objective, same trajectory as serial — N chips
accelerate the reference workload.

**Scene-DP** (``make_parallel_train_step``, §2.4(b), ``--parallel_mode
scenes``): a batch of N scenes shards over the mesh 'data' axis; parameters
and optimizer state are replicated.  The per-scene loss is vmapped, the mean
taken across scenes, and jit + NamedSharding constraints let XLA insert the
gradient all-reduce over ICI — no hand-written collectives (the pjit way,
not a NCCL translation).  NOTE this is an N-fold effective-batch increase
vs the reference (see the ``mesh_shape`` note in ``config.py``).

The stage pyramids (dict leaves of different spatial shapes) batch fine —
every leaf just gains a leading scene dim.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ucnerf_tpu.config import Config
from ucnerf_tpu.train.loop import (TrainState, scene_inputs, scene_loss,
                                   scene_loss_terms)


def stack_batches(samples: List[Dict]) -> Dict:
    """Stack N per-scene samples into a scene-batched pytree."""
    return jax.tree.map(lambda *xs: np.stack(xs), *samples)


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
            return scene_loss(cfg, nerf, mvs, params, b, k)
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


def _ray_dp_loss_fn(cfg: Config, nerf, mvs, mesh: Mesh, axis: str):
    """One-scene loss with the ray batch sharded over the mesh.

    With ``cfg.shard_mvs_views`` the MVS cascade's per-view work (FeatureNet
    + warp/variance partials) also shards over ``axis`` instead of running
    replicated — see ``parallel.mvs_views``."""
    from ucnerf_tpu.render.renderer import render_rays

    n_dev = mesh.shape[axis]
    mvs_apply = None
    if cfg.shard_mvs_views:
        from ucnerf_tpu.parallel.mvs_views import make_view_sharded_cascade
        mvs_apply = make_view_sharded_cascade(mvs, mesh, axis)

    def loss_fn(params, batch, key):
        imgs, mvs_out, confidence, rays = scene_inputs(
            cfg, mvs, params, batch, key, train=True, mvs_apply=mvs_apply)
        n = rays["rays_o"].shape[0]
        n_pad = -(-n // n_dev) * n_dev

        def pad(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n and n_pad > n:
                return jnp.concatenate([x, x[:n_pad - n]])
            return x

        rays_p = jax.tree.map(pad, rays)
        specs = jax.tree.map(
            lambda x: (P(axis, *([None] * (x.ndim - 1)))
                       if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_pad
                       else P()), rays_p)

        def local(rays_local, params, mvs_out, confidence, imgs_src, w2cs,
                  intrinsics):
            def nerf_apply(pts, dirs, feats):
                return nerf.apply({"params": params["nerf"]}, pts, dirs,
                                  feats)
            return render_rays(nerf_apply, rays_local, mvs_out, confidence,
                               imgs_src, w2cs[1:], intrinsics[1:], w2cs[0],
                               white_bkgd=cfg.white_bkgd,
                               fast=cfg.fast_featurization)

        rgb, depth = jax.shard_map(
            local, mesh=mesh,
            in_specs=(specs, P(), P(), P(), P(), P(), P()),
            out_specs=(P(axis), P(axis)))(
            rays_p, params, mvs_out, confidence, imgs[1:], batch["w2cs"],
            batch["intrinsics"])
        return scene_loss_terms(cfg, batch, rgb[:n], depth[:n], rays,
                                mvs_out)

    return loss_fn


def make_parallel_train_step_rays(cfg: Config, nerf, mvs, tx, mesh: Mesh,
                                  axis: str = "data"):
    """Ray-data-parallel train step (SURVEY §2.4(a), ``--parallel_mode
    rays``): one scene per step, sharded rays, psum'd gradients.  Preserves
    the reference's 1-scene/step semantics exactly (tested serial==parallel
    on the 8-device mesh).

    batch: ONE scene sample pytree (no leading scene dim); key: one PRNG key
    — the same signature as the serial ``make_train_step``.
    """
    repl = NamedSharding(mesh, P())
    loss_fn = _ray_dp_loss_fn(cfg, nerf, mvs, mesh, axis)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: repl, batch))
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_parallel_train_step_rays_scan(cfg: Config, nerf, mvs, tx,
                                       mesh: Mesh, axis: str = "data"):
    """K ray-DP steps per dispatch via ``lax.scan`` (composes
    ``--steps_per_dispatch`` with ``--parallel_mode rays`` so the ~32 ms
    dispatch tax stays amortized in multi-chip training).

    batches: sample pytree stacked on a leading [K] axis; keys: [K] keys.
    Returns the final state and the LAST step's metrics, like
    ``make_train_step_scan``.
    """
    repl = NamedSharding(mesh, P())
    loss_fn = _ray_dp_loss_fn(cfg, nerf, mvs, mesh, axis)

    @jax.jit
    def train_steps(state: TrainState, batches, keys):
        batches = jax.lax.with_sharding_constraint(
            batches, jax.tree.map(lambda _: repl, batches))

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


def make_parallel_train_step_rays_store(cfg: Config, nerf, mvs, tx,
                                        mesh: Mesh, axis: str = "data"):
    """Ray-DP step fed from the device-resident scene store
    (``data/device_store.py``): the ~10 KB index payload replaces the
    ~35 MB host-assembled sample; the store lives replicated across the
    mesh and the batch gather runs inside the jit.  Same semantics as
    ``make_parallel_train_step_rays`` (bit-exact batch, tested)."""
    from ucnerf_tpu.data.device_store import gather_batch
    repl = NamedSharding(mesh, P())
    loss_fn = _ray_dp_loss_fn(cfg, nerf, mvs, mesh, axis)

    @jax.jit
    def train_step(state: TrainState, store, inds, key):
        store = jax.lax.with_sharding_constraint(
            store, jax.tree.map(lambda _: repl, store))
        batch = gather_batch(store, inds)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_parallel_train_step_rays_scan_store(cfg: Config, nerf, mvs, tx,
                                             mesh: Mesh, axis: str = "data"):
    """K store-fed ray-DP steps per dispatch (``lax.scan``); ``ind_batches``
    is the index payload stacked on a leading [K] axis."""
    from ucnerf_tpu.data.device_store import gather_batch
    repl = NamedSharding(mesh, P())
    loss_fn = _ray_dp_loss_fn(cfg, nerf, mvs, mesh, axis)

    @jax.jit
    def train_steps(state: TrainState, store, ind_batches, keys):
        store = jax.lax.with_sharding_constraint(
            store, jax.tree.map(lambda _: repl, store))

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


def _scene_dp_loss_fn(cfg: Config, nerf, mvs):
    """Scene-batched (vmapped, mean-reduced) loss shared by the scene-DP
    step factories."""
    def loss_fn(params, batch, keys):
        def one(b, k):
            return scene_loss(cfg, nerf, mvs, params, b, k)
        losses, metrics = jax.vmap(one)(batch, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)
    return loss_fn


def _make_store_scene_steps(tx, mesh: Mesh, loss_fn, axis: str):
    """(one-step, K-scan) store-fed scene-batched train steps.

    Shared machinery of the store-fed scene-DP and grid factories below:
    ``inds`` is the ~10 KB-per-scene index payload stacked [S] (scan:
    [K, S]); the scene batch is gathered from the mesh-replicated store
    INSIDE the jit (``data/device_store.py::gather_batch`` vmapped over
    the scene axis) and constrained scene-sharded over ``axis`` exactly
    like the host-fed steps' input batch, so everything downstream —
    vmapped loss, grad psum, optimizer — is identical (bit-exact batch,
    tested).  This removes the last host-staging wall: scene-batched
    dispatches no longer ship K*S*~35 MB through the (1-core) host per
    dispatch (the reference's answer is 8 DataLoader workers,
    ``train.py:94-101``; a store upload once + index gathers is the
    TPU-native one)."""
    from ucnerf_tpu.data.device_store import gather_batch
    repl = NamedSharding(mesh, P())

    def gather_scenes(store, inds):
        batch = jax.vmap(lambda i: gather_batch(store, i))(inds)
        return jax.lax.with_sharding_constraint(
            batch, jax.tree.map(
                lambda x: NamedSharding(mesh, P(axis,
                                                *([None] * (x.ndim - 1)))),
                batch))

    def one_update(st, store, inds, keys):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, gather_scenes(store, inds), keys)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: repl, grads))
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params, opt_state, st.step + 1), metrics

    @jax.jit
    def train_step(state: TrainState, store, inds, keys):
        store = jax.lax.with_sharding_constraint(
            store, jax.tree.map(lambda _: repl, store))
        return one_update(state, store, inds, keys)

    @jax.jit
    def train_steps(state: TrainState, store, ind_batches, keys):
        store = jax.lax.with_sharding_constraint(
            store, jax.tree.map(lambda _: repl, store))

        def one(st, bk):
            inds, k = bk
            return one_update(st, store, inds, k)

        state, ms = jax.lax.scan(one, state, (ind_batches, keys))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return train_step, train_steps


def make_parallel_train_step_store(cfg: Config, nerf, mvs, tx, mesh: Mesh,
                                   axis: str = "data"):
    """Store-fed scene-DP step: like ``make_parallel_train_step`` but the
    S-scene batch is gathered from the device-resident store inside the
    jit.  Signature: ``(state, store, inds [S], keys [S])``."""
    return _make_store_scene_steps(
        tx, mesh, _scene_dp_loss_fn(cfg, nerf, mvs), axis)[0]


def make_parallel_train_step_scan_store(cfg: Config, nerf, mvs, tx,
                                        mesh: Mesh, axis: str = "data"):
    """K store-fed scene-DP steps per dispatch (``lax.scan``).
    Signature: ``(state, store, ind_batches [K, S], keys [K, S])``."""
    return _make_store_scene_steps(
        tx, mesh, _scene_dp_loss_fn(cfg, nerf, mvs), axis)[1]


def make_parallel_train_step_grid_store(cfg: Config, nerf, mvs, tx,
                                        mesh: Mesh,
                                        scene_axis: str = "data",
                                        ray_axis: str = "rays"):
    """Store-fed 2D-grid step: like ``make_parallel_train_step_grid`` with
    the scene batch gathered from the store inside the jit.
    Signature: ``(state, store, inds [S], keys [S])``."""
    return _make_store_scene_steps(
        tx, mesh, _grid_loss_fn(cfg, nerf, mvs, mesh, scene_axis, ray_axis),
        scene_axis)[0]


def make_parallel_train_step_grid_scan_store(cfg: Config, nerf, mvs, tx,
                                             mesh: Mesh,
                                             scene_axis: str = "data",
                                             ray_axis: str = "rays"):
    """K store-fed grid steps per dispatch (``lax.scan``).
    Signature: ``(state, store, ind_batches [K, S], keys [K, S])``."""
    return _make_store_scene_steps(
        tx, mesh, _grid_loss_fn(cfg, nerf, mvs, mesh, scene_axis, ray_axis),
        scene_axis)[1]


def make_parallel_train_step_scan(cfg: Config, nerf, mvs, tx, mesh: Mesh,
                                  axis: str = "data"):
    """K scene-DP steps per dispatch: ``lax.scan`` over K mesh-sharded scene
    groups inside one jit (composes ``--steps_per_dispatch`` with
    ``--parallel_mode scenes``).

    batches: scene-batched pytree stacked [K, n_dev, ...]; keys: [K, n_dev].
    """
    batch_spec_tail = lambda x: P(None, axis, *([None] * (x.ndim - 2)))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch, keys):
        def one(b, k):
            return scene_loss(cfg, nerf, mvs, params, b, k)
        losses, metrics = jax.vmap(one)(batch, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    @jax.jit
    def train_steps(state: TrainState, batches, keys):
        batches = jax.lax.with_sharding_constraint(
            batches, jax.tree.map(
                lambda x: NamedSharding(mesh, batch_spec_tail(x)), batches))

        def one(st, bk):
            b, k = bk
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, b, k)
            grads = jax.lax.with_sharding_constraint(
                grads, jax.tree.map(lambda _: repl, grads))
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), metrics

        state, ms = jax.lax.scan(one, state, (batches, keys))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return train_steps


def _grid_loss_fn(cfg: Config, nerf, mvs, mesh: Mesh, scene_axis: str,
                  ray_axis: str):
    """Scene-batched loss with each scene's rays sharded over ``ray_axis``.

    The scene dim shards over ``scene_axis`` (like scene-DP); within every
    scene the [patches|uniform|sparse] ray batch shards over ``ray_axis``
    (like ray-DP).  Each (scene, ray-group) device holds one scene shard's
    MVS outputs replicated along the ray axis and renders its ray slice;
    the per-scene loss assembles on the gathered per-ray outputs and the
    gradient psums over both mesh axes in the shard_map transpose.
    """
    from ucnerf_tpu.render.renderer import render_rays

    n_ray_dev = mesh.shape[ray_axis]

    def loss_fn(params, batch, keys):
        # batch: scene-stacked pytree [S, ...]; keys: [S]
        imgs, mvs_out, confidence, rays = jax.vmap(
            lambda b, k: scene_inputs(cfg, mvs, params, b, k, train=True)
        )(batch, keys)
        n = rays["rays_o"].shape[1]
        n_pad = -(-n // n_ray_dev) * n_ray_dev

        def pad(x):
            if getattr(x, "ndim", 0) >= 2 and x.shape[1] == n and n_pad > n:
                return jnp.concatenate([x, x[:, :n_pad - n]], axis=1)
            return x

        rays_p = jax.tree.map(pad, rays)
        ray_specs = jax.tree.map(
            lambda x: (P(scene_axis, ray_axis)
                       if getattr(x, "ndim", 0) >= 2 and x.shape[1] == n_pad
                       else P(scene_axis)), rays_p)
        scene_spec = lambda tree: jax.tree.map(lambda _: P(scene_axis), tree)

        def local(rays_local, params, mvs_local, conf_local, imgs_src,
                  w2cs, intrinsics):
            def one(rays_s, mvs_s, conf_s, imgs_s, w2c_s, intr_s):
                def nerf_apply(pts, dirs, feats):
                    return nerf.apply({"params": params["nerf"]}, pts,
                                      dirs, feats)
                return render_rays(nerf_apply, rays_s, mvs_s, conf_s,
                                   imgs_s, w2c_s[1:], intr_s[1:], w2c_s[0],
                                   white_bkgd=cfg.white_bkgd,
                                   fast=cfg.fast_featurization)
            return jax.vmap(one)(rays_local, mvs_local, conf_local,
                                 imgs_src, w2cs, intrinsics)

        rgb, depth = jax.shard_map(
            local, mesh=mesh,
            in_specs=(ray_specs, P(), scene_spec(mvs_out), P(scene_axis),
                      P(scene_axis), P(scene_axis), P(scene_axis)),
            out_specs=(P(scene_axis, ray_axis), P(scene_axis, ray_axis)))(
            rays_p, params, mvs_out, confidence, imgs[:, 1:],
            batch["w2cs"], batch["intrinsics"])

        def one_loss(b, rgb_s, depth_s, rays_s, mvs_s):
            return scene_loss_terms(cfg, b, rgb_s, depth_s, rays_s, mvs_s)

        losses, metrics = jax.vmap(one_loss)(
            batch, rgb[:, :n], depth[:, :n], rays, mvs_out)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    return loss_fn


def make_parallel_train_step_grid(cfg: Config, nerf, mvs, tx, mesh: Mesh,
                                  scene_axis: str = "data",
                                  ray_axis: str = "rays"):
    """2D grid-parallel train step (``--parallel_mode grid``): a 2D mesh
    ``(scene_axis, ray_axis)`` shards S scenes × R-way rays per scene —
    scene-DP and ray-DP composed, so e.g. 8 chips can run 2 scenes/step at
    4-way ray parallelism instead of being forced to choose 8 scenes/step
    (scene-DP) or 1 (ray-DP).  Objective semantics == scene-DP with
    S = mesh.shape[scene_axis] scenes/step (mean-reduced; same effective-
    batch note as ``--parallel_mode scenes``).

    batch: scene-batched pytree with leading dim == mesh.shape[scene_axis];
    keys: [S] PRNG keys.  Same signature as ``make_parallel_train_step``.
    """
    repl = NamedSharding(mesh, P())
    loss_fn = _grid_loss_fn(cfg, nerf, mvs, mesh, scene_axis, ray_axis)

    @jax.jit
    def train_step(state: TrainState, batch, keys):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(
                lambda x: NamedSharding(
                    mesh, P(scene_axis, *([None] * (x.ndim - 1)))), batch))
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, keys)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: repl, grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_parallel_train_step_grid_scan(cfg: Config, nerf, mvs, tx,
                                       mesh: Mesh, scene_axis: str = "data",
                                       ray_axis: str = "rays"):
    """K grid steps per dispatch (composes ``--steps_per_dispatch`` with
    ``--parallel_mode grid``).  batches: [K, S, ...]; keys: [K, S]."""
    repl = NamedSharding(mesh, P())
    loss_fn = _grid_loss_fn(cfg, nerf, mvs, mesh, scene_axis, ray_axis)

    @jax.jit
    def train_steps(state: TrainState, batches, keys):
        batches = jax.lax.with_sharding_constraint(
            batches, jax.tree.map(
                lambda x: NamedSharding(
                    mesh, P(None, scene_axis, *([None] * (x.ndim - 2)))),
                batches))

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


def make_parallel_eval_render(cfg: Config, nerf, mvs, img_hw, mesh: Mesh,
                              axis="data", mvs_apply=None):
    """Ray-sharded full-image eval render over the mesh (SURVEY §2.4(a)/§7
    step 7 — the TPU answer to the reference's single-device chunk loop,
    reference ``train.py:251-256``).

    The per-view context (MVS forward + featurization inputs) is computed
    replicated; the pixel tiles shard over the mesh axis via ``shard_map``,
    each device scans its local tiles (unroll=cfg.eval_unroll), and the frame reassembles from the
    sharded output (XLA inserts the gather on host fetch — no collective in
    the hot loop).

    ``axis`` may be one mesh axis name or a tuple of names — a tuple shards
    the tile dim over the product of those axes, so a 2D ``grid`` training
    mesh uses ALL its devices for the eval render too.
    """
    from ucnerf_tpu.train.loop import (prepare_view_ctx, view_chunk_fns)

    H, W = img_hw
    axis = (axis,) if isinstance(axis, str) else tuple(axis)
    n_dev = int(np.prod([mesh.shape[a] for a in axis]))
    repl = NamedSharding(mesh, P())
    if mvs_apply is None and cfg.shard_mvs_views and len(axis) == 1:
        from ucnerf_tpu.parallel.mvs_views import make_view_sharded_cascade
        mvs_apply = make_view_sharded_cascade(mvs, mesh, axis[0])

    @jax.jit
    def render_view(params, batch, key=None):
        params = jax.lax.with_sharding_constraint(
            params, jax.tree.map(lambda _: repl, params))
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: repl, batch))
        ctx = prepare_view_ctx(cfg, nerf, mvs, params, batch,
                               mvs_apply=mvs_apply)
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

            def body(carry, pix):
                return carry, render_chunk(build_chunk(pix))

            # scan(unroll=k) overlaps tile gathers with MLP matmuls like the
            # single-device render_image_chunked (same sweep, BASELINE.md)
            _, (rgb, depth) = jax.lax.scan(body, None, tiles_local[0],
                                           unroll=cfg.eval_unroll)
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


def shard_scene_batch_scan(batch: Dict, mesh: Mesh,
                           axis: str = "data") -> Dict:
    """Shard a [K, n_dev, ...] stacked scene batch (scan dim replicated,
    scene dim sharded) for ``make_parallel_train_step_scan``."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, axis,
                                     *([None] * (x.ndim - 2))))),
        batch)
