"""Depth-folded 3D conv equivalence (ucnerf_tpu.models.layers.Folded).

The folded path executes the reference's CostRegNet 3D convs
(``network/mvs_models.py:412-443``) as 2D convs with depth folded into the
channel dimension.  Same math, same parameter tree; these tests pin that:

- per-layer exactness (conv stride 1/2, transposed conv) at f32 tolerance,
- identical flax param trees between folded/unfolded CostRegNet,
- whole-U-Net agreement (loose tol: ten BatchNorms amplify fp reordering),
- gradients flow and are finite through the folded net.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.models.layers import (ConvBNReLU, ConvTransposeBNReLU,
                                      fold_volume, unfold_volume)
from ucnerf_tpu.models.mvs import CostRegNet


@pytest.fixture(scope="module")
def vol():
    return jax.random.normal(jax.random.PRNGKey(1), (16, 16, 24, 32))


@pytest.mark.parametrize("stride", [1, 2])
def test_folded_conv_layer_exact(vol, stride):
    m = ConvBNReLU(8, 3, stride, 1)
    p = m.init(jax.random.PRNGKey(0), vol)["params"]
    yu = m.apply({"params": p}, vol)
    yf = unfold_volume(m.apply({"params": p}, fold_volume(vol)))
    assert yu.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=1e-4, atol=1e-5)


def test_folded_deconv_layer_exact(vol):
    m = ConvTransposeBNReLU(16)
    p = m.init(jax.random.PRNGKey(0), vol)["params"]
    yu = m.apply({"params": p}, vol)
    yf = unfold_volume(m.apply({"params": p}, fold_volume(vol)))
    assert yu.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=1e-4, atol=1e-5)


def test_folded_costregnet_matches_unfolded(vol):
    net_u = CostRegNet(8, None, folded=False)
    net_f = CostRegNet(8, None, folded=True)
    p = net_u.init(jax.random.PRNGKey(0), vol)["params"]
    pf = net_f.init(jax.random.PRNGKey(0), jnp.zeros_like(vol))["params"]
    # identical param trees: torch converters + checkpoints work unchanged
    assert jax.tree.map(jnp.shape, p) == jax.tree.map(jnp.shape, pf)
    cu, pu = net_u.apply({"params": p}, vol)
    cf, pr = net_f.apply({"params": p}, vol)
    assert cu.shape == cf.shape and pu.shape == pr.shape
    # ten batch-stat norms amplify fp reordering; bound the drift loosely
    np.testing.assert_allclose(np.asarray(cu), np.asarray(cf),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(pr),
                               rtol=0.05, atol=0.05)


def test_folded_costregnet_grads_finite(vol):
    net_f = CostRegNet(8, None, folded=True)
    p = net_f.init(jax.random.PRNGKey(0), vol)["params"]

    def loss(p, x):
        cost, prob = net_f.apply({"params": p}, x)
        return jnp.mean(cost ** 2) + jnp.mean(prob ** 2)

    g = jax.grad(loss)(p, vol)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


# ---- space-folded FeatureNet (layers.SpaceFolded) ----

@pytest.fixture(scope="module")
def img():
    return jax.random.normal(jax.random.PRNGKey(3), (64, 96, 3))


def test_space_fold_roundtrip(img):
    from ucnerf_tpu.models.layers import space_fold, space_unfold
    for f in (1, 2, 4):
        sf = space_fold(img, f)
        assert sf.x.shape == (64 // f, 96 // f, f * f * 3)
        np.testing.assert_array_equal(np.asarray(space_unfold(sf)),
                                      np.asarray(img))


@pytest.mark.parametrize("fold,kernel,stride,pad", [
    (4, 3, 1, 1), (4, 5, 2, 2), (2, 3, 1, 1), (2, 5, 2, 2), (1, 3, 1, 1)])
def test_space_folded_conv_layer_exact(img, fold, kernel, stride, pad):
    from ucnerf_tpu.models.layers import space_fold, space_unfold
    m = ConvBNReLU(16, kernel, stride, pad)
    p = m.init(jax.random.PRNGKey(0), img)["params"]
    yu = m.apply({"params": p}, img)
    yf = space_unfold(m.apply({"params": p}, space_fold(img, fold)))
    assert yu.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=1e-4, atol=1e-5)


def test_space_folded_featnet_matches_plain(img):
    """Forward + gradient parity, identical param tree (torch converters
    and pretrained checkpoints work unchanged)."""
    from ucnerf_tpu.models.mvs import FeatureNet
    plain = FeatureNet(8, None, space_folded=False)
    fold = FeatureNet(8, None, space_folded=True)
    p = plain.init(jax.random.PRNGKey(0), img)["params"]
    pf = fold.init(jax.random.PRNGKey(0), jnp.zeros_like(img))["params"]
    assert jax.tree.map(jnp.shape, p) == jax.tree.map(jnp.shape, pf)
    o_u = plain.apply({"params": p}, img)
    o_f = fold.apply({"params": p}, img)
    for k in ("stage1", "stage2", "stage3"):
        assert o_f[k].shape == o_u[k].shape
        np.testing.assert_allclose(np.asarray(o_u[k]), np.asarray(o_f[k]),
                                   rtol=1e-4, atol=1e-5)

    def loss(params, mod):
        o = mod.apply({"params": params}, img)
        return sum(jnp.sum(jnp.sin(v)) for v in o.values())

    g_u = jax.grad(lambda q: loss(q, plain))(p)
    g_f = jax.grad(lambda q: loss(q, fold))(p)
    # leaf-scale-normalized: 8 batch-stat norms amplify fp reordering on
    # near-cancelled elements, so per-element rtol is the wrong yardstick
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
