"""Scene-data-parallel train step on the virtual 8-device CPU mesh, and the
driver entry points."""

import numpy as np

import jax
import jax.numpy as jnp


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    rgb, depth = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(depth)).all()


def test_parallel_eval_render_matches_single_device():
    """Ray-sharded frame render on the 8-device mesh == single-device."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import make_parallel_eval_render
    from ucnerf_tpu.train.loop import make_eval_render, to_device_batch
    import __graft_entry__ as g

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    H, W = ds.img_wh[1], ds.img_wh[0]
    sample = ds[0]
    batch = to_device_batch(sample)

    render_1 = make_eval_render(cfg, nerf, mvs, (H, W))
    rgb_1, depth_1, conf_1 = render_1(params, batch)

    mesh = make_mesh((8,), ("data",))
    render_8 = make_parallel_eval_render(cfg, nerf, mvs, (H, W), mesh)
    rgb_8, depth_8, conf_8 = render_8(params, batch)

    assert rgb_8.shape == (H, W, 3) and depth_8.shape == (H, W)
    np.testing.assert_allclose(np.asarray(rgb_1), np.asarray(rgb_8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_1), np.asarray(depth_8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf_1), np.asarray(conf_8),
                               rtol=1e-4, atol=1e-5)


def test_parallel_matches_serial_gradients():
    """1-device parallel step == serial step on the same scene batch."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step,
                                              replicate_state,
                                              shard_scene_batch,
                                              stack_batches)
    from ucnerf_tpu.train.loop import (TrainState, make_optimizer,
                                       make_train_step, to_device_batch)
    import __graft_entry__ as g

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    key = jax.random.PRNGKey(3)
    sample = ds[0]  # fetch ONCE: __getitem__ advances the dataset rng
                    # (sparse-coord shuffle, reference data/scared.py:502)

    # serial
    state_s = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_s = make_train_step(cfg, nerf, mvs, tx)
    state_s, m_s = step_s(state_s, to_device_batch(sample), key)

    # parallel, 1 device, same scene + key
    mesh = make_mesh((1,), ("data",))
    state_p = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state_p = replicate_state(state_p, mesh)
    step_p = make_parallel_train_step(cfg, nerf, mvs, tx, mesh)
    batch = shard_scene_batch(stack_batches([sample]), mesh)
    state_p, m_p = step_p(state_p, batch, key[None])

    np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                               rtol=1e-4)
    # post-Adam params can differ by ~lr per element from f32 noise on tiny
    # gradients (first-step update ≈ lr·sign(g)); bound by 3·lr instead.
    leaves_s = jax.tree.leaves(state_s.params)
    leaves_p = jax.tree.leaves(state_p.params)
    for a, b in zip(leaves_s, leaves_p):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate
