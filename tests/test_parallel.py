"""Data-parallel train steps (ray-DP + scene-DP) on the virtual 8-device CPU
mesh, and the driver entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny():
    """Shared (cfg, ds, nerf, mvs, params, tx) — model init is jit-heavy."""
    import __graft_entry__ as g
    from ucnerf_tpu.train.loop import make_optimizer

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    return cfg, ds, nerf, mvs, params, tx


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


def test_ray_dp_matches_serial_8dev(tiny):
    """Ray-data-parallel step on the 8-device mesh == the serial step on the
    SAME one-scene batch and key (SURVEY §2.4(a)): the mode must preserve
    the reference's 1-scene/step training semantics exactly."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step_rays,
                                              replicate_state)
    from ucnerf_tpu.train.loop import (TrainState, make_train_step,
                                       to_device_batch)

    cfg, ds, nerf, mvs, params, tx = tiny
    key = jax.random.PRNGKey(3)
    sample = ds[0]  # fetch ONCE (dataset __getitem__ advances its rng)

    state_s = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_s = make_train_step(cfg, nerf, mvs, tx)
    state_s, m_s = step_s(state_s, to_device_batch(sample), key)

    mesh = make_mesh((8,), ("data",))
    state_p = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state_p = replicate_state(state_p, mesh)
    step_p = make_parallel_train_step_rays(cfg, nerf, mvs, tx, mesh)
    state_p, m_p = step_p(state_p, to_device_batch(sample), key)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_s.params),
                    jax.tree.leaves(state_p.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_ray_dp_pads_non_divisible_ray_counts(tiny):
    """Ray-DP when the ray count does NOT divide the mesh: 85+64+32=181
    rays over 8 devices exercises the pad-and-truncate branch of
    ``_ray_dp_loss_fn`` (every other test uses divisible counts).  Must
    still equal the serial step exactly — padded duplicate rays are
    truncated before the loss, so their gradients vanish."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step_rays,
                                              replicate_state)
    from ucnerf_tpu.train.loop import (TrainState, make_train_step,
                                       to_device_batch)

    cfg, ds, nerf, mvs, params, tx = tiny
    cfg = cfg.replace(batch_size=85)        # model is batch-size-agnostic
    assert cfg.n_train_rays % 8 != 0, cfg.n_train_rays
    key = jax.random.PRNGKey(11)
    sample = ds[0]

    state_s = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_s = make_train_step(cfg, nerf, mvs, tx)
    state_s, m_s = step_s(state_s, to_device_batch(sample), key)

    mesh = make_mesh((8,), ("data",))
    state_p = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state_p = replicate_state(state_p, mesh)
    step_p = make_parallel_train_step_rays(cfg, nerf, mvs, tx, mesh)
    state_p, m_p = step_p(state_p, to_device_batch(sample), key)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_s.params),
                    jax.tree.leaves(state_p.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_scene_dp_8dev_grads_match_vmap_serial():
    """The 8-way psum path computes the SAME gradients as a single-device
    vmap-serial evaluation of the same 8-scene batch (same keys) — direct
    gradient equality, not just loss finiteness."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step,
                                              replicate_state,
                                              shard_scene_batch,
                                              stack_batches)
    from ucnerf_tpu.train.loop import TrainState, make_optimizer, scene_loss
    import __graft_entry__ as g
    import optax

    # fresh setup, NOT the module fixture: the dataset rng advances on every
    # __getitem__, so fixture-shared draws depend on which other tests ran
    # first and the calibrated tolerance below would be comparing different
    # samples per pytest invocation subset.
    cfg, ds, nerf, mvs, params = g._tiny_setup()
    tx = make_optimizer(cfg, steps_per_epoch=len(ds))
    # f32 MLP for this test: the default bf16 NeRF compute makes the
    # mesh-vs-vmap reduction-order difference flip bf16 roundings, which
    # the deep backward amplifies to ~1e-1 relative on some samples —
    # that is bf16 noise, not a partitioning defect; pin f32 to compare
    # the partitioning itself tightly.
    from ucnerf_tpu.models.factory import create_models
    cfg = cfg.replace(nerf_dtype="float32")
    nerf, mvs = create_models(cfg)
    samples = [ds[i % len(ds)] for i in range(8)]
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    batch_host = stack_batches(samples)

    def loss_fn(p, batch, ks):
        losses, metrics = jax.vmap(
            lambda b, k: scene_loss(cfg, nerf, mvs, p, b, k))(batch, ks)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    # single-device vmap-serial gradients + update
    (loss_s, m_s), grads_s = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        params, jax.tree.map(jnp.asarray, batch_host), keys)
    updates, _ = tx.update(grads_s, tx.init(params), params)
    params_s = optax.apply_updates(params, updates)

    # 8-device mesh step
    mesh = make_mesh((8,), ("data",))
    state_p = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    step_p = make_parallel_train_step(cfg, nerf, mvs, tx, mesh)
    state_p, m_p = step_p(state_p, shard_scene_batch(batch_host, mesh), keys)

    np.testing.assert_allclose(float(loss_s), float(m_p["loss"]), rtol=1e-4)
    # direct gradient equality through the mesh (value_and_grad over the
    # sharded batch — XLA partitions the vmap and psums the grads)
    (loss_m, _), grads_m = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        params, shard_scene_batch(batch_host, mesh), keys)
    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_m)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-8)
        # psum-over-8 vs vmap-mean reduce in different orders; measured on
        # two 8-sample draws: worst 5.7e-3 and 4.3e-2 relative (vs tensor
        # max) on small-magnitude tensors through the full cascade backward
        # (f32, mean loss agreeing to 1e-7 rel).  The bound still catches
        # real partitioning defects (a missing/extra psum is 7x, a sign
        # flip 2x).
        assert np.abs(a - b).max() <= 1e-1 * scale
    # post-Adam params from the mesh step within the sign-flip bound
    for a, b in zip(jax.tree.leaves(params_s),
                    jax.tree.leaves(state_p.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_scene_dp_scan_matches_sequential(tiny):
    """K scene-DP steps in one lax.scan dispatch == K sequential parallel
    steps on the 8-device mesh (composes --steps_per_dispatch with
    --parallel_mode scenes)."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (make_parallel_train_step,
                                              make_parallel_train_step_scan,
                                              replicate_state,
                                              shard_scene_batch,
                                              shard_scene_batch_scan,
                                              stack_batches)
    from ucnerf_tpu.train.loop import TrainState

    cfg, ds, nerf, mvs, params, tx = tiny
    K, n = 2, 8
    samples = [ds[i % len(ds)] for i in range(K * n)]
    keys = jax.random.split(jax.random.PRNGKey(11), K * n).reshape(K, n, -1)
    mesh = make_mesh((n,), ("data",))

    state_a = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    pstep = make_parallel_train_step(cfg, nerf, mvs, tx, mesh)
    for k in range(K):
        b = shard_scene_batch(stack_batches(samples[k * n:(k + 1) * n]),
                              mesh)
        state_a, m_a = pstep(state_a, b, keys[k])

    state_b = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    sstep = make_parallel_train_step_scan(cfg, nerf, mvs, tx, mesh)
    stacked = stack_batches(samples)
    stacked = jax.tree.map(lambda x: x.reshape(K, n, *x.shape[1:]), stacked)
    state_b, m_b = sstep(state_b, shard_scene_batch_scan(stacked, mesh),
                         keys)

    assert int(state_b.step) == K
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-2)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate


def test_ray_dp_scan_matches_sequential(tiny):
    """K ray-DP steps in one scan dispatch == K sequential ray-DP steps."""
    from ucnerf_tpu.parallel.mesh import make_mesh
    from ucnerf_tpu.parallel.sharding import (
        make_parallel_train_step_rays, make_parallel_train_step_rays_scan,
        replicate_state, stack_batches)
    from ucnerf_tpu.train.loop import TrainState, to_device_batch

    cfg, ds, nerf, mvs, params, tx = tiny
    K = 2
    samples = [ds[i % len(ds)] for i in range(K)]
    keys = jax.random.split(jax.random.PRNGKey(13), K)
    mesh = make_mesh((8,), ("data",))

    state_a = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    rstep = make_parallel_train_step_rays(cfg, nerf, mvs, tx, mesh)
    for k in range(K):
        state_a, m_a = rstep(state_a, to_device_batch(samples[k]), keys[k])

    state_b = replicate_state(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), mesh)
    sstep = make_parallel_train_step_rays_scan(cfg, nerf, mvs, tx, mesh)
    state_b, m_b = sstep(state_b, to_device_batch(stack_batches(samples)),
                         keys)

    assert int(state_b.step) == K
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-2)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 3 * cfg.lrate
