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
import sys

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
        # Store-fed validation (round-5): without it each val view ships a
        # ~35 MB host-assembled sample over the tunnel before its render —
        # measured 1.5-8.8 s/view against a ~0.3 s render (the spread is
        # tunnel/checkpoint-IO contention on the 1-core host).  With the
        # val scenes resident, a view's input is a ~10 KB index payload
        # gathered on device; GT arrays for metrics stay host-side.
        self.store = self._gather = None
        if cfg.device_dataset:
            from ucnerf_tpu.data.device_store import build_store, \
                gather_batch
            store = build_store(self.val_ds)
            if mesh is not None and int(np.prod(cfg.mesh_shape)) > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P
                store = jax.device_put(store, NamedSharding(mesh, P()))
            self.store = store
            self._gather = jax.jit(gather_batch)

        if cfg.mvs_only:
            # depth-only validation: Consistency-Learner forward, no NeRF
            import jax as _jax

            @_jax.jit
            def mvs_depth(params, batch):
                near = batch["near_fars"][0, 0]
                far = batch["near_fars"][0, 1]
                out = mvs.apply({"params": params["mvs"]},
                                batch["images"][1:], batch["affine_mat"],
                                batch["affine_mat_inv"], near, far,
                                pad=cfg.pad)
                return (out["stage3"]["depth"],
                        out["stage3"]["photometric_confidence"])
            self.mvs_depth = mvs_depth
            self.render_view = None
            self._lpips_fn = None
            return
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
        if self._lpips_fn is None and not getattr(self, "_lpips_tried",
                                                  False):
            self._lpips_tried = True
            self._lpips_fn = load_lpips()
            if self._lpips_fn is None:
                print(
                    "WARNING: LPIPS weights not found "
                    "(pretrained_weights/lpips_alex.npz or "
                    "$UCNERF_LPIPS_WEIGHTS) — the LPIPS column of the eval "
                    "table will be nan, NOT a bug.  Convert once with:\n"
                    "  python convert_weights.py lpips "
                    "<lpips_alex_state.pth> pretrained_weights/"
                    "lpips_alex.npz\n"
                    "(save the state on any machine with the lpips "
                    "package: torch.save(lpips.LPIPS(net='alex')"
                    ".state_dict(), 'lpips_alex.pth'))", file=sys.stderr)
        return self._lpips_fn

    def val_batch(self, i: int):
        """(device_batch, host_gt) for val view i.

        Store path: the device batch is gathered from the resident store
        (no host image upload); GT arrays for metrics come straight from
        the dataset's scene arrays (no ``__getitem__`` assembly)."""
        val_ds = self.val_ds
        if self.store is not None:
            from ucnerf_tpu.data.device_store import sample_indices
            scan, ref, _ = val_ds.metas[i]
            sc = val_ds.scene[scan]
            H, W = val_ds.img_wh[1], val_ds.img_wh[0]
            gt = dict(
                image=np.asarray(sc["images"][ref], np.float32),
                depth=(np.asarray(sc["depths"][ref], np.float32)
                       if sc.get("depths") is not None
                       else np.zeros((H, W), np.float32)),
                scan_idx=val_ds.scans.index(scan))
            batch = self._gather(self.store,
                                 to_device_batch(sample_indices(val_ds, i)))
            return batch, gt
        sample = val_ds[i]
        gt = dict(image=sample["images"][0], depth=sample["depths_h"],
                  scan_idx=int(sample["scan_idx"]))
        return to_device_batch(sample), gt

    def __call__(self, params, step_idx: int, final: bool = False):
        if self.cfg.mvs_only:
            return run_mvs_validation(self.cfg, self, params, step_idx)
        return run_validation(self.cfg, self, params, step_idx, final=final)


def run_mvs_validation(cfg, validator: Validator, params, step_idx: int):
    """--mvs_only validation: MVS depth vs GT depth over the val split
    (the depth half of the reference's validation_step,
    ``train.py:238-243`` + ``utils/evaluation.py:29-74``)."""
    val_ds = validator.val_ds
    out_dir = os.path.join(cfg.basedir, cfg.expname, "test_results")
    os.makedirs(out_dir, exist_ok=True)
    gts, pending = [], []
    for i in range(len(val_ds)):
        batch, gt = validator.val_batch(i)
        gts.append(gt)
        pending.append(validator.mvs_depth(params, batch))
    gt_depths = np.stack([g["depth"] for g in gts])
    pred = np.stack([np.asarray(d) for d, _ in pending])
    masks = (gt_depths > 0).astype(np.float32)
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    metrics = {}
    if masks.any():
        derr = depth_evaluation(gt_depths, pred, masks)
        metrics = dict(zip(names, np.asarray(derr).tolist()))
        print("mvs_only depth:",
              ", ".join(f"{n}: {v:.4f}" for n, v in metrics.items()))
    with open(os.path.join(out_dir, "mvs_evaluation.txt"), "w") as fh:
        fh.write(json.dumps(metrics, indent=1))
    return metrics


def run_validation(cfg, validator: Validator, params, step_idx: int,
                   final: bool = False):
    import queue
    import threading
    import time
    t_val = time.perf_counter()
    val_ds = validator.val_ds
    render_view = validator.render_view
    out_dir = os.path.join(cfg.basedir, cfg.expname, "test_results")
    os.makedirs(out_dir, exist_ok=True)
    panels = (cfg.val_panels == "all"
              or (cfg.val_panels == "final" and final))

    # Panel PNG encode+write runs on a worker thread: the cv2/libpng work
    # releases the GIL, so it overlaps the remaining device fetches and
    # the metric computation instead of serializing on the 1-core host
    # (round-4 measured 850-1250 ms/view of which the render is ~320 ms —
    # host image IO dominated).
    panel_q, panel_err = queue.Queue(), []

    def _panel_worker():
        while True:
            job = panel_q.get()
            if job is None:
                return
            try:
                save_val_panel(*job)
            except Exception as e:      # re-raised after join
                panel_err.append(e)

    panel_th = None
    if panels:
        panel_th = threading.Thread(target=_panel_worker, daemon=True)
        panel_th.start()

    # Pipeline: dispatch every view before fetching any — jax dispatch is
    # async, so the host loads/saves view k while the device renders k+1.
    # (Validator.val_batch keeps the ~35 MB/view sample upload off the
    # tunnel when the store is on.)
    gts, pending = [], []
    for i in range(len(val_ds)):
        batch, gt = validator.val_batch(i)
        gts.append(gt)
        pending.append(render_view(params, batch))

    gt_rgbs, pred_rgbs, gt_depths, pred_depths, masks, scans = \
        [], [], [], [], [], []
    for i, (gt_i, (rgb, depth, conf)) in enumerate(zip(gts, pending)):
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        from ucnerf_tpu.data.base import unnormalize_image
        gt = np.clip(unnormalize_image(gt_i["image"]), 0, 1)
        gt_rgbs.append(gt)
        pred_rgbs.append(rgb)
        gt_depths.append(gt_i["depth"])
        pred_depths.append(depth)
        masks.append((gt_i["depth"] > 0).astype(np.float32))
        scans.append(int(gt_i["scan_idx"]))
        if panels:
            panel_q.put((os.path.join(out_dir,
                                      f"{step_idx:08d}_{i:02d}.png"),
                         gt, rgb, gt_i["depth"], depth))

    # per-scene metrics averaged across scenes (reference
    # on_validation_epoch_end groups val views per scan, train.py:342-379)
    lpips_fn = validator.lpips_fn
    scans = np.asarray(scans)
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    rgb_rows, depth_rows, per_scan = [], [], {}
    for s in sorted(set(scans.tolist())):
        sel = np.where(scans == s)[0]
        print(val_ds.scans[s])
        psnr_v, ssim_v, lpips_v = rgb_evaluation(
            np.stack([gt_rgbs[j] for j in sel]),
            np.stack([pred_rgbs[j] for j in sel]), lpips_fn=lpips_fn)
        rgb_rows.append([psnr_v, ssim_v, lpips_v])
        row = dict(psnr=psnr_v, ssim=ssim_v, lpips=lpips_v)
        gt_d = np.stack([gt_depths[j] for j in sel])
        if (gt_d > 0).any():
            derr_s = depth_evaluation(
                gt_d, np.stack([pred_depths[j] for j in sel]),
                np.stack([masks[j] for j in sel]))
            depth_rows.append(derr_s)
            row.update(dict(zip(names, np.asarray(derr_s).tolist())))
        per_scan[val_ds.scans[s]] = row
    psnr_v, ssim_v, lpips_v = np.stack(rgb_rows).mean(axis=0).tolist()
    print(f"psnr: {psnr_v}, ssim: {ssim_v}, lpips: {lpips_v}")
    metrics = dict(psnr=psnr_v, ssim=ssim_v, lpips=lpips_v)
    if depth_rows:
        derr = np.stack(depth_rows).mean(axis=0)
        print(", ".join(f"{n}: {v}" for n, v in zip(names, derr)))
        metrics.update(dict(zip(names, derr.tolist())))
    if len(per_scan) > 1:
        # multi-scene run: record the per-scan spread next to the means
        # (reference groups val views per scan too, train.py:342-379)
        metrics["per_scan"] = per_scan
        for name, row in per_scan.items():
            print(f"  {name}: " + ", ".join(
                f"{k}: {v:.4f}" for k, v in row.items()
                if np.isfinite(v)))
    with open(os.path.join(out_dir, "rgb_evaluation.txt"), "w") as fh:
        fh.write(json.dumps(metrics, indent=1))
    if panel_th is not None:
        panel_q.put(None)
        panel_th.join()
        if panel_err:
            raise panel_err[0]
    wall = time.perf_counter() - t_val
    print(f"validation: {len(val_ds)} views in {wall:.2f}s "
          f"({wall / max(len(val_ds), 1) * 1e3:.0f} ms/view incl. "
          "panels+metrics)")
    return metrics


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.mvs_only:
        if cfg.finetune is not None:
            raise ValueError("--mvs_only trains ONLY the MVS net; "
                             "--finetune freezes it — pick one")
        if (int(np.prod(cfg.mesh_shape)) > 1
                and cfg.parallel_mode != "scenes"):
            raise ValueError("--mvs_only has no rays to shard; use "
                             "--parallel_mode scenes for multi-chip")
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
            # merge over the initialized trees: a ucnerf.tar replaces both
            # nets, a bare casmvsnet.ckpt seeds ONLY the MVS tree (the
            # reference's bootstrap, network/models.py:240-248) and any
            # extra collections (appearance) keep their init
            conv = checkpoint_io.convert_reference_checkpoint(cfg.ckpt)
            params = {**params,
                      **jax.tree.map(jnp.asarray, conv)}
        elif cfg.ckpt.endswith(".npz"):
            conv = checkpoint_io.load_params_npz(cfg.ckpt)
            params = {**params, **jax.tree.map(jnp.asarray, conv)}
        else:
            # restore the params subtree only — structure-independent of
            # whatever optimizer the saved run used, so checkpoints seed
            # across objective changes (mvs_only -> full -> finetune)
            params = jax.tree.map(jnp.asarray,
                                  checkpoint_io.load_params(cfg.ckpt,
                                                            params))
        print(f"restored params from {cfg.ckpt}"
              + (" (params only)" if cfg.ckpt_params_only else ""))

    n_par = int(np.prod(cfg.mesh_shape))
    mesh = None
    if n_par > 1:
        from ucnerf_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))

    validator = Validator(cfg, nerf, mvs, mesh=mesh)
    if cfg.eval:
        validator(params, 0, final=True)
        return

    tx = make_optimizer(cfg, steps_per_epoch=len(train_ds))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if (cfg.ckpt and not cfg.ckpt_params_only
            and not cfg.ckpt.endswith((".tar", ".ckpt", ".pth", ".npz"))):
        # orbax checkpoints resume the FULL state (params + optimizer +
        # step).  For cross-objective seeding (mvs_only boot -> full run,
        # full -> finetune) pass --ckpt_params_only instead: a full resume
        # would fast-position past the restored step count, which is wrong
        # across a phase boundary (see config.py).
        state = checkpoint_io.load_checkpoint(cfg.ckpt, state)
        print(f"resumed full train state at step {int(state.step)}")

    if n_par > 1 and cfg.parallel_mode == "rays":
        # ray-data-parallel: one scene/step (the reference's regime), its
        # ray batch sharded over the mesh (SURVEY §2.4(a)).  Same loader
        # shapes as the serial path, so it reuses that branch below —
        # including the device scene store (replicated over the mesh).
        from ucnerf_tpu.parallel.sharding import (
            make_parallel_train_step_rays, make_parallel_train_step_rays_scan,
            make_parallel_train_step_rays_store,
            make_parallel_train_step_rays_scan_store, replicate_state)
        state = replicate_state(state, mesh)
        if cfg.device_dataset:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ucnerf_tpu.data.device_store import (build_store,
                                                      store_nbytes)
            # place the store replicated ONCE at build time — relying on
            # the step's with_sharding_constraint alone would re-broadcast
            # the (possibly hundreds of MB) store inside every dispatch
            store = jax.device_put(build_store(train_ds),
                                   NamedSharding(mesh, P()))
            print(f"device scene store: {store_nbytes(store) / 1e6:.0f} MB "
                  "replicated over the mesh")
            pstep = make_parallel_train_step_rays_store(cfg, nerf, mvs, tx,
                                                        mesh)
            step = lambda state, inds, key: pstep(state, store, inds, key)
            if cfg.steps_per_dispatch > 1:
                pscan = make_parallel_train_step_rays_scan_store(
                    cfg, nerf, mvs, tx, mesh)
                step_scan = lambda state, inds, keys: pscan(state, store,
                                                            inds, keys)
        else:
            step = make_parallel_train_step_rays(cfg, nerf, mvs, tx, mesh)
            if cfg.steps_per_dispatch > 1:
                step_scan = make_parallel_train_step_rays_scan(
                    cfg, nerf, mvs, tx, mesh)
    elif n_par > 1:
        # scene-batched modes, mean-reduced gradients — an n_scenes-fold
        # effective batch vs the reference (SURVEY §2.4(b); see the
        # mesh_shape note in config.py for LR guidance):
        # - "scenes": n_par scenes/step, one scene per device;
        # - "grid":   2D mesh (scene_axis, ray_axis) — mesh_shape[0]
        #   scenes/step, each scene's rays sharded mesh_shape[1]-way.
        # With --device_dataset (default) the S-scene batch is gathered
        # from the mesh-replicated store inside the jit — no K*S*~35 MB
        # host staging per dispatch.
        from ucnerf_tpu.parallel import sharding as psh
        state = psh.replicate_state(state, mesh)
        if cfg.parallel_mode == "scenes":
            step_args = (cfg, nerf, mvs, tx, mesh)
        elif cfg.parallel_mode == "grid":
            if len(cfg.mesh_shape) != 2:
                raise ValueError("--parallel_mode grid needs a 2D mesh, "
                                 f"e.g. --mesh_shape 2 4 --mesh_axes data "
                                 f"rays (got mesh_shape={cfg.mesh_shape})")
            sc_ax, ray_ax = cfg.mesh_axes
            step_args = (cfg, nerf, mvs, tx, mesh, sc_ax, ray_ax)
        else:
            raise ValueError(f"unknown parallel_mode {cfg.parallel_mode!r}"
                             " (rays | scenes | grid)")
        grid = cfg.parallel_mode == "grid"
        if cfg.device_dataset:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ucnerf_tpu.data.device_store import (build_store,
                                                      store_nbytes)
            store = jax.device_put(build_store(train_ds),
                                   NamedSharding(mesh, P()))
            print(f"device scene store: {store_nbytes(store) / 1e6:.0f} MB "
                  "replicated over the mesh")
            mk_one = (psh.make_parallel_train_step_grid_store if grid
                      else psh.make_parallel_train_step_store)
            raw = mk_one(*step_args)
            pstep = lambda state, inds, keys: raw(state, store, inds, keys)
            if cfg.steps_per_dispatch > 1:
                mk_scan = (psh.make_parallel_train_step_grid_scan_store
                           if grid else
                           psh.make_parallel_train_step_scan_store)
                raw_scan = mk_scan(*step_args)
                pstep_scan = lambda state, inds, keys: raw_scan(
                    state, store, inds, keys)
        else:
            pstep = (psh.make_parallel_train_step_grid(*step_args) if grid
                     else psh.make_parallel_train_step(*step_args))
            if cfg.steps_per_dispatch > 1:
                pstep_scan = (
                    psh.make_parallel_train_step_grid_scan(*step_args)
                    if grid else
                    psh.make_parallel_train_step_scan(*step_args))

        def step(state, batches_keys, _key):
            batch, keys = batches_keys
            return pstep(state, batch, keys)
    elif cfg.device_dataset:
        # single-device: scene arrays resident on device, index-only
        # samples (data/device_store.py) — bit-exact vs host loading
        from ucnerf_tpu.data.device_store import build_store, store_nbytes
        from ucnerf_tpu.train.loop import (make_train_step_store,
                                           make_train_step_scan_store)
        store = build_store(train_ds)
        print(f"device scene store: {store_nbytes(store) / 1e6:.0f} MB "
              f"({len(train_ds.scans)} scan(s)) resident")
        sstep = make_train_step_store(cfg, nerf, mvs, tx)
        step = lambda state, inds, key: sstep(state, store, inds, key)
        if cfg.steps_per_dispatch > 1:
            sscan = make_train_step_scan_store(cfg, nerf, mvs, tx)
            step_scan = lambda state, inds, keys: sscan(state, store, inds,
                                                        keys)
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
    if cfg.device_dataset:
        # EVERY mode runs store-fed: the host ships ~10 KB index payloads
        # and the jitted step gathers the sample(s) from the resident store
        from ucnerf_tpu.data.device_store import sample_indices
        fetch = lambda j: sample_indices(train_ds, j)
    else:
        fetch = lambda j: train_ds[j]
    n_scenes = ((cfg.mesh_shape[0] if cfg.parallel_mode == "grid" else n_par)
                if scene_dp else 1)
    scenes_per_step = n_scenes
    K = cfg.steps_per_dispatch

    def _dispatch_counts(n):
        """Per-dispatch step counts for one epoch — must mirror the loader
        grouping below (used to fast-position a resumed run)."""
        if scene_dp:
            group = K * n_scenes
            n_groups = n // group if K > 1 else 0
            tail = n - n_groups * group
            n_tail = (tail - n_scenes) // n_scenes + 1 if tail >= n_scenes \
                else 0
            return [K] * n_groups + [1] * n_tail
        if K > 1:
            n_groups = n // K
            return [K] * n_groups + [1] * (n - n_groups * K)
        return [1] * n

    # Exact resume: every source of randomness is stateless —
    # - epoch shuffle: rng seeded by (cfg.seed, epoch);
    # - per-dispatch device keys: fold_in(key, global_step);
    # - per-sample dataset draws: (dataset seed, epoch, idx) via set_epoch —
    # so a run killed and resumed from an orbax checkpoint replays NOTHING
    # and continues bit-identically to an uninterrupted run (tested).  The
    # reference restarts from scratch on crash (no optimizer state saved,
    # train.py:404-413).
    start_epoch, skip_dispatches = 0, 0
    if global_step > 0:
        done, start_epoch = 0, cfg.num_epochs   # fully-trained fallthrough
        for ep in range(cfg.num_epochs):
            counts = _dispatch_counts(len(train_ds))
            if done + sum(counts) <= global_step:
                done += sum(counts)
                continue
            nd = 0
            for c in counts:
                if done + c <= global_step:
                    done += c
                    nd += 1
                else:
                    break
            if done != global_step:
                raise ValueError(
                    f"cannot resume at step {global_step}: not on a "
                    f"dispatch boundary for steps_per_dispatch={K} "
                    f"({sum(counts)} steps/epoch) — resume with the "
                    "original --steps_per_dispatch/--samples_per_scene")
            start_epoch, skip_dispatches = ep, nd
            break
        if start_epoch > 0 or skip_dispatches > 0:
            print(f"resume: continuing at epoch {start_epoch}, "
                  f"dispatch {skip_dispatches} (step {global_step})")

    for epoch in range(start_epoch, cfg.num_epochs):
        if hasattr(train_ds, "set_epoch"):
            train_ds.set_epoch(epoch)
        order = np.random.default_rng(np.random.SeedSequence(
            [cfg.seed % 2 ** 32, 1 + epoch])).permutation(len(train_ds))
        skip = skip_dispatches if epoch == start_epoch else 0
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
                b = stack_batches([fetch(int(j)) for j in g])
                if cfg.device_dataset:
                    # tiny index payloads — ship as-is; the jitted step
                    # gathers + scene-shards from the replicated store
                    if len(g) != n_scenes:
                        b = jax.tree.map(
                            lambda x: x.reshape(K, n_scenes, *x.shape[1:]),
                            b)
                    return ("one" if len(g) == n_scenes else "scan",
                            to_device_batch(b))
                if len(g) == n_scenes:
                    return ("one", shard_scene_batch(b, mesh))
                b = jax.tree.map(
                    lambda x: x.reshape(K, n_scenes, *x.shape[1:]), b)
                return ("scan", shard_scene_batch_scan(b, mesh))
            loader = ThreadPrefetcher(
                (lambda g=g: load_group(g) for g in items[skip:]), depth=2)
        elif K > 1:
            # K steps per dispatch (lax.scan): group the epoch order,
            # stacking K samples per host call; the tail that doesn't fill
            # a group runs as single steps.  (Used by the serial AND the
            # ray-DP path — ray-DP has the same one-scene batch shapes.)
            n_groups = len(order) // K

            def load_item(idxs):
                samples = [fetch(int(j)) for j in idxs]
                if len(samples) == 1:
                    return ("one", to_device_batch(samples[0]))
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *samples)
                return ("scan", to_device_batch(stacked))
            items = [order[i * K:(i + 1) * K] for i in range(n_groups)]
            items += [[j] for j in order[n_groups * K:]]
            loader = ThreadPrefetcher(
                (lambda g=g: load_item(g) for g in items[skip:]), depth=2)
        else:
            loader = ThreadPrefetcher(
                (lambda i=i: ("one", to_device_batch(fetch(int(i))))
                 for i in order[skip:]), depth=2)
        for batch in loader:
            # stateless: the dispatch key is a pure function of the step
            # counter, so resumed and uninterrupted runs see identical keys
            sub = jax.random.fold_in(key, global_step)
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
                quality = (f"depth_abs {m['depth_abs']:.4f}"
                           if "depth_abs" in m else f"psnr {m['psnr']:.2f}")
                print(f"step {global_step} epoch {epoch} "
                      f"loss {m['loss']:.4f} {quality} "
                      f"rays/s {meter.rate:,.0f}")
            if global_step // 5000 != prev // 5000:
                # async: orbax commits in the background while training
                # keeps dispatching; the final save below waits for all
                checkpoint_io.save_checkpoint(ckpt_dir, state, global_step,
                                              wait=False,
                                              keep=cfg.keep_ckpts)
                last_saved = global_step
            if cfg.stop_after_steps and global_step >= cfg.stop_after_steps:
                break
        if cfg.stop_after_steps and global_step >= cfg.stop_after_steps:
            # simulated mid-run kill: checkpoint and exit (no final val).
            # If the periodic async save above already targeted this exact
            # step, don't issue a second save of the same path while the
            # first commit may still be in flight — just drain it.
            print(f"stop_after_steps: halting at step {global_step}")
            if last_saved == global_step:
                checkpoint_io.wait_for_checkpoints()
            else:
                checkpoint_io.save_checkpoint(ckpt_dir, state, global_step,
                                              keep=cfg.keep_ckpts)
            writer.close()
            return
        if (epoch + 1) % cfg.val_every_epochs == 0:
            validator(state.params, global_step)

    if global_step != last_saved:
        checkpoint_io.save_checkpoint(ckpt_dir, state, global_step,
                                      keep=cfg.keep_ckpts)
    else:
        checkpoint_io.wait_for_checkpoints()
    validator(state.params, global_step, final=True)
    writer.close()


if __name__ == "__main__":
    main()
