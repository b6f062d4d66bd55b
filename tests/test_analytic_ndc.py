"""Analytic NDC (closed-form) vs the projection-based reference formulation."""

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.ops.rays import _assemble, _stage_near_far


def test_analytic_ndc_matches_projection():
    H, W = 32, 64
    key = jax.random.PRNGKey(0)
    K = jnp.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    # non-trivial target pose
    th = 0.3
    R = jnp.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    c2w = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
        jnp.array([0.2, -0.1, 0.05]))
    w2c = jnp.linalg.inv(c2w)
    planes = {k: (jnp.full((H // s, W // s), 0.7),
                  jnp.full((H // s, W // s), 2.3))
              for k, s in ((1, 4), (2, 2), (3, 1))}
    inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
    ys = jax.random.randint(key, (64,), 0, H)
    xs = jax.random.randint(jax.random.fold_in(key, 1), (64,), 0, W)

    a = _assemble(key, ys, xs, K, c2w, w2c, K, inv_scale, planes, 0.7, 2.3,
                  9, jitter=True, analytic_ndc=True)
    b = _assemble(key, ys, xs, K, c2w, w2c, K, inv_scale, planes, 0.7, 2.3,
                  9, jitter=True, analytic_ndc=False)
    for name in ("stage1", "stage2", "stage3", "ndc"):
        np.testing.assert_allclose(np.asarray(a["ndc"][name]),
                                   np.asarray(b["ndc"][name]),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(a["depth_candidates"]),
                                  np.asarray(b["depth_candidates"]))
