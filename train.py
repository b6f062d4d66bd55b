"""Training / evaluation driver CLI (the reference's ``train.py`` surface).

    python train.py --preset train_scared --datadir <path>
    python train.py --preset eval_scared --ckpt logs/scared/ckpts/step_XXXX
    python train.py --dataset_name synthetic --num_epochs 2   # no data needed

Differences from the reference driver (``train.py:26-448``), on purpose:
- the whole train step (MVS + rays + render + loss + Adam) is one jitted
  function; no Lightning, no per-module chunk loops;
- checkpoints include optimizer state (orbax);
- multi-scene scene-parallel training over a device mesh when
  ``--mesh_shape N`` with N > 1 (reference is single-GPU, train.py:433).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()  # an explicit JAX_PLATFORMS env var wins
enable_compile_cache()     # persistent compile cache (env var overrides)

from ucnerf_tpu.config import parse_config
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.eval.lpips import load_lpips
from ucnerf_tpu.eval.metrics import depth_evaluation, rgb_evaluation
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.train.loop import (TrainState, make_eval_render,
                                   make_optimizer, make_train_step,
                                   to_device_batch)
from ucnerf_tpu.utils import checkpoint_io
from ucnerf_tpu.utils.viz import save_val_panel


class Validator:
    """Validation harness built ONCE per run: the val dataset, the jitted
    render (single-device or ray-sharded over the mesh), and LPIPS weights
    are all constructed here and reused across calls — the round-1 version
    rebuilt and re-jitted everything per validation."""

    def __init__(self, cfg, nerf, mvs, mesh=None):
        self.cfg = cfg
        self.val_ds = build_dataset(cfg, "val")
        H, W = self.val_ds.img_wh[1], self.val_ds.img_wh[0]
        if mesh is not None and int(np.prod(cfg.mesh_shape)) > 1:
            from ucnerf_tpu.parallel.sharding import make_parallel_eval_render
            # shard eval tiles over ALL mesh axes (a 2D grid mesh still
            # uses every device for the frame render)
            self.render_view = make_parallel_eval_render(
                cfg, nerf, mvs, (H, W), mesh, axis=tuple(mesh.axis_names))
        else:
            self.render_view = make_eval_render(cfg, nerf, mvs, (H, W))
        self._lpips_fn = None

    @property
    def lpips_fn(self):
        if self._lpips_fn is None:
            self._lpips_fn = load_lpips()
        return self._lpips_fn

    def __call__(self, params, step_idx: int):
        return run_validation(self.cfg, self, params, step_idx)


def run_validation(cfg, validator: Validator, params, step_idx: int):
    val_ds = validator.val_ds
    render_view = validator.render_view
    out_dir = os.path.join(cfg.basedir, cfg.expname, "test_results")
    os.makedirs(out_dir, exist_ok=True)

    # Pipeline: dispatch every view before fetching any — jax dispatch is
    # async, so the host loads/saves view k while the device renders k+1.
    samples, pending = [], []
    for i in range(len(val_ds)):
        sample = val_ds[i]
        samples.append(sample)
        pending.append(render_view(params, to_device_batch(sample)))

    gt_rgbs, pred_rgbs, gt_depths, pred_depths, masks, scans = \
        [], [], [], [], [], []
    for i, (sample, (rgb, depth, conf)) in enumerate(zip(samples, pending)):
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        from ucnerf_tpu.data.base import unnormalize_image
        gt = np.clip(unnormalize_image(sample["images"][0]), 0, 1)
        gt_rgbs.append(gt)
        pred_rgbs.append(rgb)
        gt_depths.append(sample["depths_h"])
        pred_depths.append(depth)
        masks.append((sample["depths_h"] > 0).astype(np.float32))
        scans.append(int(sample["scan_idx"]))
        save_val_panel(os.path.join(out_dir,
                                    f"{step_idx:08d}_{i:02d}.png"),
                       gt, rgb, sample["depths_h"], depth)

    # per-scene metrics averaged across scenes (reference
    # on_validation_epoch_end groups val views per scan, train.py:342-379)
    lpips_fn = validator.lpips_fn
    scans = np.asarray(scans)
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    rgb_rows, depth_rows = [], []
    for s in sorted(set(scans.tolist())):
        sel = np.where(scans == s)[0]
        print(val_ds.scans[s])
        psnr_v, ssim_v, lpips_v = rgb_evaluation(
            np.stack([gt_rgbs[j] for j in sel]),
            np.stack([pred_rgbs[j] for j in sel]), lpips_fn=lpips_fn)
        rgb_rows.append([psnr_v, ssim_v, lpips_v])
        gt_d = np.stack([gt_depths[j] for j in sel])
        if (gt_d > 0).any():
            depth_rows.append(depth_evaluation(
                gt_d, np.stack([pred_depths[j] for j in sel]),
                np.stack([masks[j] for j in sel])))
    psnr_v, ssim_v, lpips_v = np.stack(rgb_rows).mean(axis=0).tolist()
    print(f"psnr: {psnr_v}, ssim: {ssim_v}, lpips: {lpips_v}")
    metrics = dict(psnr=psnr_v, ssim=ssim_v, lpips=lpips_v)
    if depth_rows:
        derr = np.stack(depth_rows).mean(axis=0)
        print(", ".join(f"{n}: {v}" for n, v in zip(names, derr)))
        metrics.update(dict(zip(names, derr.tolist())))
    with open(os.path.join(out_dir, "rgb_evaluation.txt"), "w") as fh:
        fh.write(json.dumps(metrics, indent=1))
    return metrics


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.debug_nans:
        from ucnerf_tpu.utils.profiling import enable_debug_nans
        enable_debug_nans()
    key = jax.random.PRNGKey(cfg.seed)
    # seed the HOST rng too (epoch shuffles) so a whole run is reproducible
    # from --seed, like the reference's startup seeding (train.py:420-421);
    # the device side is already keyed from cfg.seed above
    np.random.seed(cfg.seed % 2**32)

    train_ds = build_dataset(cfg, "train")
    H, W = train_ds.img_wh[1], train_ds.img_wh[0]
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, key, (H, W))
    if cfg.ckpt:
        if cfg.ckpt.endswith((".tar", ".ckpt", ".pth")):
            params = checkpoint_io.convert_reference_checkpoint(cfg.ckpt)
        else:
            tx0 = make_optimizer(cfg, steps_per_epoch=len(train_ds))
            target = TrainState(params, tx0.init(params),
                                jnp.zeros((), jnp.int32))
            params = checkpoint_io.load_checkpoint(cfg.ckpt, target).params
        print(f"restored params from {cfg.ckpt}")

    n_par = int(np.prod(cfg.mesh_shape))
    mesh = None
    if n_par > 1:
        from ucnerf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))

    validator = Validator(cfg, nerf, mvs, mesh=mesh)
    if cfg.eval:
        validator(params, 0)
        return

    tx = make_optimizer(cfg, steps_per_epoch=len(train_ds))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if cfg.ckpt and not cfg.ckpt.endswith((".tar", ".ckpt", ".pth")):
        # orbax checkpoints resume the FULL state (params + optimizer + step)
        state = checkpoint_io.load_checkpoint(cfg.ckpt, state)
        print(f"resumed full train state at step {int(state.step)}")

    if n_par > 1 and cfg.parallel_mode == "rays":
        # ray-data-parallel: one scene/step (the reference's regime), its
        # ray batch sharded over the mesh (SURVEY §2.4(a)).  Same loader
        # shapes as the serial path, so it reuses that branch below.
        from ucnerf_tpu.parallel.sharding import (
            make_parallel_train_step_rays, make_parallel_train_step_rays_scan,
            replicate_state)
        state = replicate_state(state, mesh)
        step = make_parallel_train_step_rays(cfg, nerf, mvs, tx, mesh)
        if cfg.steps_per_dispatch > 1:
            step_scan = make_parallel_train_step_rays_scan(cfg, nerf, mvs,
                                                           tx, mesh)
    elif n_par > 1:
        # scene-batched modes, mean-reduced gradients — an n_scenes-fold
        # effective batch vs the reference (SURVEY §2.4(b); see the
        # mesh_shape note in config.py for LR guidance):
        # - "scenes": n_par scenes/step, one scene per device;
        # - "grid":   2D mesh (scene_axis, ray_axis) — mesh_shape[0]
        #   scenes/step, each scene's rays sharded mesh_shape[1]-way.
        from ucnerf_tpu.parallel.sharding import (
            make_parallel_train_step, make_parallel_train_step_grid,
            make_parallel_train_step_grid_scan,
            make_parallel_train_step_scan,
            replicate_state, shard_scene_batch, stack_batches)
        state = replicate_state(state, mesh)
        if cfg.parallel_mode == "scenes":
            pstep = make_parallel_train_step(cfg, nerf, mvs, tx, mesh)
            if cfg.steps_per_dispatch > 1:
                pstep_scan = make_parallel_train_step_scan(cfg, nerf, mvs,
                                                           tx, mesh)
        elif cfg.parallel_mode == "grid":
            if len(cfg.mesh_shape) != 2:
                raise ValueError("--parallel_mode grid needs a 2D mesh, "
                                 f"e.g. --mesh_shape 2 4 --mesh_axes data "
                                 f"rays (got mesh_shape={cfg.mesh_shape})")
            sc_ax, ray_ax = cfg.mesh_axes
            pstep = make_parallel_train_step_grid(cfg, nerf, mvs, tx, mesh,
                                                  sc_ax, ray_ax)
            if cfg.steps_per_dispatch > 1:
                pstep_scan = make_parallel_train_step_grid_scan(
                    cfg, nerf, mvs, tx, mesh, sc_ax, ray_ax)
        else:
            raise ValueError(f"unknown parallel_mode {cfg.parallel_mode!r}"
                             " (rays | scenes | grid)")

        def step(state, batches_keys, _key):
            batch, keys = batches_keys
            return pstep(state, batch, keys)
    else:
        step = make_train_step(cfg, nerf, mvs, tx)
        if cfg.steps_per_dispatch > 1:
            from ucnerf_tpu.train.loop import make_train_step_scan
            step_scan = make_train_step_scan(cfg, nerf, mvs, tx)

    ckpt_dir = os.path.join(cfg.basedir, cfg.expname, "ckpts")
    from ucnerf_tpu.utils.profiling import RateMeter, trace
    from ucnerf_tpu.utils.writer import MetricWriter
    writer = MetricWriter(os.path.join(cfg.basedir, cfg.expname, "tb"),
                          use_wandb=cfg.log)
    meter = RateMeter()
    global_step = int(state.step)
    last_saved = -1
    from ucnerf_tpu.utils.prefetch import ThreadPrefetcher
    # scene-batched modes ("scenes": one scene per device; "grid": one
    # scene per scene-axis row, rays sharded along the ray axis)
    scene_dp = n_par > 1 and cfg.parallel_mode in ("scenes", "grid")
    n_scenes = ((cfg.mesh_shape[0] if cfg.parallel_mode == "grid" else n_par)
                if scene_dp else 1)
    scenes_per_step = n_scenes
    K = cfg.steps_per_dispatch
    for epoch in range(cfg.num_epochs):
        order = np.random.permutation(len(train_ds))
        if scene_dp:
            from ucnerf_tpu.parallel.sharding import (shard_scene_batch,
                                                      shard_scene_batch_scan,
                                                      stack_batches)
            if len(order) < n_scenes:
                raise ValueError(
                    f"{len(order)} train samples < {n_scenes} scenes/step; "
                    "raise --samples_per_scene or shrink --mesh_shape")
            # groups of K*n_scenes samples run as one lax.scan dispatch of K
            # mesh-sharded scene steps; the tail runs as single K=1 steps.
            group = K * n_scenes
            n_groups = len(order) // group if K > 1 else 0
            items = [order[i * group:(i + 1) * group]
                     for i in range(n_groups)]
            tail = order[n_groups * group:]
            items += [tail[i:i + n_scenes] for i in
                      range(0, len(tail) - n_scenes + 1, n_scenes)]
            # the last < n_scenes samples of the shuffle are skipped this
            # epoch (a different subset each epoch); scene-DP needs full
            # device groups and the usual 200*scans epoch divides evenly

            def load_group(g):
                b = stack_batches([train_ds[int(j)] for j in g])
                if len(g) == n_scenes:
                    return ("one", shard_scene_batch(b, mesh))
                b = jax.tree.map(
                    lambda x: x.reshape(K, n_scenes, *x.shape[1:]), b)
                return ("scan", shard_scene_batch_scan(b, mesh))
            loader = ThreadPrefetcher(
                (lambda g=g: load_group(g) for g in items), depth=2)
        elif K > 1:
            # K steps per dispatch (lax.scan): group the epoch order,
            # stacking K samples per host call; the tail that doesn't fill
            # a group runs as single steps.  (Used by the serial AND the
            # ray-DP path — ray-DP has the same one-scene batch shapes.)
            n_groups = len(order) // K

            def load_item(idxs):
                samples = [train_ds[int(j)] for j in idxs]
                if len(samples) == 1:
                    return ("one", to_device_batch(samples[0]))
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *samples)
                return ("scan", to_device_batch(stacked))
            items = [order[i * K:(i + 1) * K] for i in range(n_groups)]
            items += [[j] for j in order[n_groups * K:]]
            loader = ThreadPrefetcher(
                (lambda g=g: load_item(g) for g in items), depth=2)
        else:
            loader = ThreadPrefetcher(
                (lambda i=i: ("one", to_device_batch(train_ds[int(i)]))
                 for i in order), depth=2)
        for batch in loader:
            key, sub = jax.random.split(key)
            kind, payload = batch
            if scene_dp:
                if kind == "scan":
                    n_steps = K
                    subs = jax.random.split(sub, K * n_scenes).reshape(
                        K, n_scenes, -1)
                    run = lambda: pstep_scan(state, payload, subs)
                else:
                    n_steps = 1
                    subs = jax.random.split(sub, n_scenes)
                    run = lambda: step(state, (payload, subs), subs)
            else:
                if kind == "scan":
                    n_steps = K
                    subs = jax.random.split(sub, n_steps)
                    run = lambda: step_scan(state, payload, subs)
                else:
                    n_steps = 1
                    run = lambda: step(state, payload, sub)
            # trace exactly the dispatch covering step 10 for any n_steps
            if (cfg.profile_dir
                    and global_step <= 10 < global_step + n_steps):
                with trace(cfg.profile_dir):
                    state, metrics = run()
                    jax.block_until_ready(metrics)
            else:
                state, metrics = run()
            meter.update(cfg.n_train_rays * n_steps * scenes_per_step)
            prev = global_step
            global_step += n_steps
            if global_step // 50 != prev // 50:
                m = jax.tree.map(float, metrics)
                writer.write(global_step,
                             {f"train/{k}": v for k, v in m.items()})
                print(f"step {global_step} epoch {epoch} "
                      f"loss {m['loss']:.4f} psnr {m['psnr']:.2f} "
                      f"rays/s {meter.rate:,.0f}")
            if global_step // 5000 != prev // 5000:
                # async: orbax commits in the background while training
                # keeps dispatching; the final save below waits for all
                checkpoint_io.save_checkpoint(ckpt_dir, state, global_step,
                                              wait=False,
                                              keep=cfg.keep_ckpts)
                last_saved = global_step
        if (epoch + 1) % cfg.val_every_epochs == 0:
            validator(state.params, global_step)

    if global_step != last_saved:
        checkpoint_io.save_checkpoint(ckpt_dir, state, global_step,
                                      keep=cfg.keep_ckpts)
    else:
        checkpoint_io.wait_for_checkpoints()
    validator(state.params, global_step)
    writer.close()


if __name__ == "__main__":
    main()
