"""Direct unit tests for ops/composite.py (alpha compositing).

Two layers of checking:
- golden identities (single opaque sample, vacuum ray, white background)
  that pin the semantics independently of any oracle;
- random-input parity against the reference's OWN ``network/renderer.py``
  functions (``depth2dist`` :6-15, ``raw2alpha`` :25-36, ``raw2outputs``
  :109-140), imported with the CPU shims.

Until now compositing was only exercised end-to-end (whole-frame parity);
this pins the op in isolation per SURVEY §4's contract-test list.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ucnerf_tpu.ops.composite import depth2dist, raw2alpha, raw2outputs

torch = pytest.importorskip("torch")

from test_reference_parity import import_reference


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def test_single_opaque_sample_returns_its_color():
    # one huge-sigma sample -> alpha ~ 1, all weight on that sample
    raw = np.zeros((2, 5, 4), np.float32)
    raw[0, 2, :3] = [0.2, 0.5, 0.9]
    raw[0, 2, 3] = 1e4
    raw[1, 4, :3] = [1.0, 0.0, 0.25]
    raw[1, 4, 3] = 1e4
    z = np.tile(np.linspace(1.0, 3.0, 5, dtype=np.float32), (2, 1))
    rgb, depth, acc, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z))
    np.testing.assert_allclose(rgb[0], [0.2, 0.5, 0.9], atol=1e-6)
    np.testing.assert_allclose(rgb[1], [1.0, 0.0, 0.25], atol=1e-6)
    np.testing.assert_allclose(depth, [z[0, 2], z[1, 4]], rtol=1e-6)
    np.testing.assert_allclose(acc, 1.0, atol=1e-6)
    assert np.argmax(np.asarray(w[0])) == 2


def test_vacuum_ray_and_white_background():
    raw = np.zeros((1, 4, 4), np.float32)
    raw[..., :3] = 0.7  # colors present but zero density
    z = np.linspace(0.5, 2.0, 4, dtype=np.float32)[None]
    rgb, depth, acc, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z))
    np.testing.assert_allclose(rgb, 0.0, atol=1e-6)
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)
    rgb_w, _, _, _ = raw2outputs(jnp.asarray(raw), jnp.asarray(z),
                                 white_bkgd=True)
    np.testing.assert_allclose(rgb_w, 1.0, atol=1e-6)


def test_weights_are_alpha_times_transmittance():
    rng = np.random.default_rng(0)
    sigma = rng.uniform(0.0, 3.0, size=(8, 16)).astype(np.float32)
    alpha, w = raw2alpha(jnp.asarray(sigma))
    a = 1.0 - np.exp(-sigma)
    t = np.cumprod(np.concatenate([np.ones((8, 1), np.float32),
                                   1.0 - a + 1e-10], axis=1), axis=1)[:, :-1]
    # rtol 1e-5 / atol 1e-6: XLA's exp and fp32 cumprod association each
    # differ from numpy by ~1 ulp
    np.testing.assert_allclose(np.asarray(alpha), a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), a * t, rtol=1e-5, atol=1e-6)
    assert (np.asarray(w).sum(1) <= 1.0 + 1e-5).all()


def test_matches_reference_code_on_random_input(reference):
    rng = np.random.default_rng(1)
    n_rays, n_samples = 64, 90
    raw = rng.standard_normal((n_rays, n_samples, 4)).astype(np.float32)
    raw[..., 3] = np.abs(raw[..., 3])  # sigma >= 0 like a relu'd head
    z = np.sort(rng.uniform(0.2, 4.0, (n_rays, n_samples))
                ).astype(np.float32)
    cos = rng.uniform(0.8, 1.0, (n_rays,)).astype(np.float32)

    dists = depth2dist(jnp.asarray(z), jnp.asarray(cos))
    rgb, depth, acc, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z))

    with torch.no_grad():
        t_raw, t_z = torch.from_numpy(raw), torch.from_numpy(z)
        t_dists = reference.renderer.depth2dist(t_z, torch.from_numpy(cos))
        (t_rgb, _, t_acc, t_w, t_depth, _,
         _) = reference.renderer.raw2outputs(t_raw, t_z, t_dists)

    np.testing.assert_allclose(np.asarray(dists), t_dists.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), t_rgb.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), t_depth.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), t_acc.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), t_w.numpy(),
                               rtol=1e-5, atol=1e-6)
