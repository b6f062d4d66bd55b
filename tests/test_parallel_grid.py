"""2D grid-parallel training (scene axis × ray axis) on the virtual
8-device CPU mesh arranged (2, 4): 2 scenes/step, each scene's rays
sharded 4-way.  Semantics must equal a single-device vmap evaluation of
the same 2-scene batch (scene-DP objective), like the 1D-mode tests in
``test_parallel.py``."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as g
    from ucnerf_tpu.train.loop import make_optimizer

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    return cfg, ds, nerf, mvs, params, tx


def _grid_mesh():
    from ucnerf_tpu.parallel.mesh import make_mesh
    return make_mesh((2, 4), ("data", "rays"))


def test_grid_matches_vmap_serial(tiny):
    """grid(2x4) step == single-device vmap over the same 2-scene batch."""
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step_grid,
                                              replicate_state,
                                              shard_scene_batch,
                                              stack_batches)
    from ucnerf_tpu.train.loop import TrainState, scene_loss
    import optax

    cfg, ds, nerf, mvs, params, tx = tiny
    samples = [ds[0], ds[1 % len(ds)]]       # fetch ONCE (dataset rng)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    batch_host = stack_batches(samples)

    def loss_fn(p, batch, ks):
        losses, metrics = jax.vmap(
            lambda b, k: scene_loss(cfg, nerf, mvs, p, b, k))(batch, ks)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    (loss_s, m_s), grads_s = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        params, jax.tree.map(jnp.asarray, batch_host), keys)
    updates, _ = tx.update(grads_s, tx.init(params), params)
    params_s = optax.apply_updates(params, updates)

    mesh = _grid_mesh()
    state = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    gstep = make_parallel_train_step_grid(cfg, nerf, mvs, tx, mesh,
                                          "data", "rays")
    state, m_g = gstep(state, shard_scene_batch(batch_host, mesh), keys)

    np.testing.assert_allclose(float(loss_s), float(m_g["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_s["psnr"]), float(m_g["psnr"]),
                               rtol=1e-3)
    # post-Adam params within the first-step sign-flip bound (see
    # test_parallel.py for the calibration of 3·lr)
    for a, b in zip(jax.tree.leaves(params_s),
                    jax.tree.leaves(state.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_grid_pads_non_divisible_ray_counts(tiny):
    """Ray counts that don't divide the 4-way ray axis exercise the
    pad-and-truncate branch of ``_grid_loss_fn``."""
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step_grid,
                                              replicate_state,
                                              shard_scene_batch,
                                              stack_batches)
    from ucnerf_tpu.train.loop import TrainState, make_optimizer, scene_loss

    cfg, ds, nerf, mvs, params, _ = tiny
    cfg = cfg.replace(batch_size=85)
    assert cfg.n_train_rays % 4 != 0, cfg.n_train_rays
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    samples = [ds[0], ds[1 % len(ds)]]
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    batch_host = stack_batches(samples)

    def loss_fn(p, batch, ks):
        losses, _ = jax.vmap(
            lambda b, k: scene_loss(cfg, nerf, mvs, p, b, k))(batch, ks)
        return jnp.mean(losses)

    loss_s = float(jax.jit(loss_fn)(
        params, jax.tree.map(jnp.asarray, batch_host), keys))

    mesh = _grid_mesh()
    state = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    gstep = make_parallel_train_step_grid(cfg, nerf, mvs, tx, mesh,
                                          "data", "rays")
    _, m_g = gstep(state, shard_scene_batch(batch_host, mesh), keys)
    np.testing.assert_allclose(loss_s, float(m_g["loss"]), rtol=1e-4)


def test_grid_scan_matches_sequential(tiny):
    """K grid steps in one lax.scan dispatch == K sequential grid steps."""
    from ucnerf_tpu.parallel.sharding import (
        make_parallel_train_step_grid, make_parallel_train_step_grid_scan,
        replicate_state, shard_scene_batch, shard_scene_batch_scan,
        stack_batches)
    from ucnerf_tpu.train.loop import TrainState

    cfg, ds, nerf, mvs, params, tx = tiny
    K, S = 2, 2
    samples = [ds[i % len(ds)] for i in range(K * S)]
    keys = jax.random.split(jax.random.PRNGKey(17), K * S).reshape(K, S, -1)
    mesh = _grid_mesh()

    state_a = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    gstep = make_parallel_train_step_grid(cfg, nerf, mvs, tx, mesh,
                                          "data", "rays")
    for k in range(K):
        b = shard_scene_batch(stack_batches(samples[k * S:(k + 1) * S]),
                              mesh)
        state_a, m_a = gstep(state_a, b, keys[k])

    state_b = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    sstep = make_parallel_train_step_grid_scan(cfg, nerf, mvs, tx, mesh,
                                               "data", "rays")
    stacked = stack_batches(samples)
    stacked = jax.tree.map(lambda x: x.reshape(K, S, *x.shape[1:]), stacked)
    state_b, m_b = sstep(state_b, shard_scene_batch_scan(stacked, mesh),
                         keys)

    assert int(state_b.step) == K
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-2)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_grid_cli_end_to_end(tmp_path):
    """The train-CLI surface with --parallel_mode grid: exercises the
    scene-batched loader with n_scenes (=2) != n_devices (=8), the scan
    group path (K=2 -> groups of 4 samples), the 2D-mesh validator, and
    checkpointing."""
    import train as train_cli

    train_cli.main([
        "--dataset_name", "synthetic", "--num_epochs", "1",
        "--samples_per_scene", "8", "--view_num", "4", "--N_samples", "9",
        "--batch_size", "80", "--patch_size", "4", "--patch_num", "4",
        "--chunk", "256", "--img_wh", "64", "32",
        "--mesh_shape", "2", "4", "--mesh_axes", "data", "rays",
        "--parallel_mode", "grid", "--steps_per_dispatch", "2",
        "--expname", "grid_e2e", "--basedir", str(tmp_path)])

    out = tmp_path / "grid_e2e"
    assert (out / "test_results" / "rgb_evaluation.txt").exists()
    ckpts = list((out / "ckpts").iterdir())
    assert ckpts, "no checkpoint written"


def test_grid_rejects_1d_mesh(tmp_path):
    import train as train_cli
    with pytest.raises(ValueError, match="2D mesh"):
        train_cli.main([
            "--dataset_name", "synthetic", "--num_epochs", "1",
            "--samples_per_scene", "4", "--view_num", "4",
            "--N_samples", "9", "--batch_size", "80", "--patch_size", "4",
            "--patch_num", "4", "--chunk", "256", "--img_wh", "64", "32",
            "--mesh_shape", "8", "--parallel_mode", "grid",
            "--expname", "grid_bad", "--basedir", str(tmp_path)])


def test_eval_render_on_2d_mesh_matches_single_device():
    """The eval render sharded over BOTH axes of a (2, 4) mesh (tile dim
    split over the product of the axes) == the single-device render."""
    from ucnerf_tpu.parallel.sharding import make_parallel_eval_render
    from ucnerf_tpu.train.loop import make_eval_render, to_device_batch
    import __graft_entry__ as g

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    H, W = ds.img_wh[1], ds.img_wh[0]
    batch = to_device_batch(ds[0])

    rgb_1, depth_1, conf_1 = make_eval_render(cfg, nerf, mvs, (H, W))(
        params, batch)
    mesh = _grid_mesh()
    render_g = make_parallel_eval_render(cfg, nerf, mvs, (H, W), mesh,
                                         axis=("data", "rays"))
    rgb_g, depth_g, conf_g = render_g(params, batch)

    np.testing.assert_allclose(np.asarray(rgb_1), np.asarray(rgb_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_1), np.asarray(depth_g),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf_1), np.asarray(conf_g),
                               rtol=1e-4, atol=1e-5)
