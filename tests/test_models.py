"""Model shape/semantics tests + torch parity for the tricky layers."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.models.layers import ConvTransposeBNReLU, BatchStatNorm
from ucnerf_tpu.models.mvs import CascadeMVSNet, _sliding_prob_mass4
from ucnerf_tpu.models.nerf import UCNeRFMLP
from ucnerf_tpu.models.factory import create_models, init_params


def test_conv_transpose_matches_torch(rng):
    """Our lhs-dilated conv == torch ConvTranspose3d(k3,s2,p1,op1)."""
    cin, cout, d, h, w = 3, 5, 4, 6, 5
    x = rng.standard_normal((d, h, w, cin)).astype(np.float32)
    m = ConvTransposeBNReLU(cout, use_bn=False, use_relu=False)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    # port our kernel (*k, Cout, Cin) into torch layout (Cin, Cout, *k)
    kern = np.asarray(params["params"]["kernel"])
    tw = torch.from_numpy(np.transpose(kern, (4, 3, 0, 1, 2)))
    tx = torch.from_numpy(x).permute(3, 0, 1, 2)[None]
    ref = F.conv_transpose3d(tx, tw, stride=2, padding=1, output_padding=1)
    ref = ref[0].permute(1, 2, 3, 0).numpy()
    assert y.shape == ref.shape == (2 * d, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_batch_stat_norm_matches_torch_train_bn(rng):
    x = rng.standard_normal((7, 9, 4)).astype(np.float32)
    m = BatchStatNorm()
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    bn = torch.nn.BatchNorm2d(4)
    bn.train()
    ref = bn(torch.from_numpy(x).permute(2, 0, 1)[None, :, :, :]
             .permute(0, 1, 2, 3))
    # torch BN normalizes over (N,H,W) per channel; emulate with [1,C,H,W]
    ref = bn(torch.from_numpy(x).permute(2, 0, 1)[None])
    ref = ref[0].permute(1, 2, 0).detach().numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_sliding_prob_mass4_matches_torch(rng):
    D, H, W = 9, 4, 5
    p = rng.uniform(size=(D, H, W)).astype(np.float32)
    ours = np.asarray(_sliding_prob_mass4(jnp.asarray(p)))
    tp = torch.from_numpy(p)[None, None]
    ref = 4 * F.avg_pool3d(F.pad(tp, (0, 0, 0, 0, 1, 2)), (4, 1, 1),
                           stride=1, padding=0)
    np.testing.assert_allclose(ours, ref[0, 0].numpy(), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(view_num=4, N_samples=9, batch_size=100, patch_size=2,
                  patch_num=4, n_depth_rays=16)


def test_cascade_mvs_shapes(tiny_cfg):
    cfg = tiny_cfg
    H, W = 32, 64  # must be divisible by 32 (reference data/scared.py:172)
    key = jax.random.PRNGKey(0)
    _, mvs = create_models(cfg)
    v1 = cfg.view_num - 1
    imgs = jax.random.normal(key, (v1, H, W, 3))
    # per-view per-stage affine mats: K_s @ w2c with w2c = identity-ish
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    affs = []
    for v in range(cfg.view_num):
        per_stage = []
        for s in range(3):
            m = np.eye(4, dtype=np.float32)
            Ks = K.copy()
            Ks[:2] /= 2 ** (2 - s)
            m[:3, :3] = Ks
            m[0, 3] = 0.1 * v
            per_stage.append(m)
        affs.append(per_stage)
    affine = jnp.asarray(np.stack(affs))
    affine_inv = jnp.asarray(np.linalg.inv(np.stack(affs)))

    params = mvs.init(key, imgs, affine, affine_inv, 0.5, 2.0)
    out = mvs.apply(params, imgs, affine, affine_inv, 0.5, 2.0)

    assert out["stage1"]["depth"].shape == (H // 4, W // 4)
    assert out["stage2"]["depth"].shape == (H // 2, W // 2)
    assert out["stage3"]["depth"].shape == (H, W)
    assert out["stage3"]["photometric_confidence"].shape == (H, W)
    assert out["stage1"]["volume_feature"].shape == (48, H // 4, W // 4, 8)
    assert out["stage3"]["depth_values"].shape == (8, H, W)
    assert out["img_feats"].shape == (v1, H, W, 8)
    conf = np.asarray(out["stage3"]["photometric_confidence"])
    assert conf.min() >= 0.0 and conf.max() <= 1.0
    d = np.asarray(out["stage3"]["depth"])
    assert d.min() >= 0.5 - 1e-5 and d.max() <= 2.0 + 1e-5
    prob = np.asarray(out["stage2"]["prob_volume"])
    np.testing.assert_allclose(prob.sum(0), 1.0, rtol=1e-4)


def test_nerf_mlp_shapes_and_blend(tiny_cfg):
    cfg = tiny_cfg
    nerf, _ = create_models(cfg)
    key = jax.random.PRNGKey(1)
    N, S = 11, cfg.N_samples
    pts = jax.random.normal(key, (N, S, 3))
    dirs = jax.random.normal(key, (N, 3))
    feats = jax.random.normal(key, (N, S, cfg.feat_dim))
    params = nerf.init(key, pts, dirs, feats)
    out = nerf.apply(params, pts, dirs, feats)
    assert out.shape == (N, S, 4)
    rgb = np.asarray(out[..., :3])
    alpha = np.asarray(out[..., 3])
    assert (rgb >= 0).all() and (rgb <= 1).all()   # sigmoid head
    assert (alpha >= 0).all()                      # relu head

    # full-confidence input (u=0) must make rgb depend only on the base head:
    # perturbing img_feats (adaptive path input) must not change rgb.
    feats_c1 = feats.at[..., -1].set(1.0)
    v1 = cfg.view_num - 1
    sl = slice(24 + 4 * v1, 24 + 12 * v1)
    feats_c1b = feats_c1.at[..., sl].add(3.0)
    o1 = nerf.apply(params, pts, dirs, feats_c1)
    o2 = nerf.apply(params, pts, dirs, feats_c1b)
    np.testing.assert_allclose(np.asarray(o1[..., :3]),
                               np.asarray(o2[..., :3]), atol=1e-6)


def test_init_params_tree(tiny_cfg):
    params = init_params(tiny_cfg, jax.random.PRNGKey(0), (32, 64))
    assert "nerf" in params and "mvs" in params
    n = sum(x.size for x in jax.tree.leaves(params["nerf"]))
    m = sum(x.size for x in jax.tree.leaves(params["mvs"]))
    assert n > 10_000 and m > 100_000


def test_homo_warp_packed_bit_identical():
    """pack>1 warp gathers (ops/warp.py) are bit-identical to pack=1."""
    import jax
    import jax.numpy as jnp
    from ucnerf_tpu.ops.warp import homo_warp

    src = jax.random.normal(jax.random.PRNGKey(0), (64, 80, 8))
    proj = jnp.eye(3, 4) + 1e-2 * jax.random.normal(jax.random.PRNGKey(1),
                                                    (3, 4))
    dvals = jnp.broadcast_to(jnp.linspace(0.8, 2.5, 6)[:, None, None],
                             (6, 64, 80))
    w1, m1 = homo_warp(src, proj, dvals, pad=0)
    for pack in (2, 4, 8):
        wp, mp = homo_warp(src, proj, dvals, pad=0, pack=pack)
        assert float(jnp.abs(w1 - wp).max()) == 0.0, pack
        assert float(jnp.abs(m1 - mp).max()) == 0.0, pack
    # padded target grid too
    dvals_p = jnp.broadcast_to(jnp.linspace(0.8, 2.5, 6)[:, None, None],
                               (6, 68, 84))
    w1, m1 = homo_warp(src, proj, dvals_p, pad=2)
    wp, mp = homo_warp(src, proj, dvals_p, pad=2, pack=4)
    assert float(jnp.abs(w1 - wp).max()) == 0.0
    assert float(jnp.abs(m1 - mp).max()) == 0.0


def test_homo_warp_asym_bwd_pack():
    """bwd_pack (ops/warp.py::_gather_select_asym): forward bit-identical
    to the symmetric path, gradient equal to plain AD (same scatter-add
    values, only the table layout differs)."""
    import jax
    import jax.numpy as jnp
    from ucnerf_tpu.ops.warp import homo_warp

    src = jax.random.normal(jax.random.PRNGKey(0), (64, 80, 8))
    proj = jnp.eye(3, 4) + 1e-2 * jax.random.normal(jax.random.PRNGKey(1),
                                                    (3, 4))
    dvals = jnp.broadcast_to(jnp.linspace(0.8, 2.5, 6)[:, None, None],
                             (6, 64, 80))

    def loss(s, **kw):
        w, m = homo_warp(s, proj, dvals, **kw)
        return jnp.sum(jnp.sin(w) * 0.1) + jnp.sum(m)

    w1, m1 = homo_warp(src, proj, dvals)
    g1 = jax.grad(loss)(src)
    for fp, bp in [(1, 2), (1, 4), (2, 4), (4, 1), (4, 8)]:
        wa, ma = homo_warp(src, proj, dvals, pack=fp, bwd_pack=bp)
        assert float(jnp.abs(w1 - wa).max()) == 0.0, (fp, bp)
        assert float(jnp.abs(m1 - ma).max()) == 0.0, (fp, bp)
        ga = jax.grad(loss)(src, pack=fp, bwd_pack=bp)
        assert float(jnp.abs(g1 - ga).max()) < 1e-6, (fp, bp)
    # padded target grid through the asym path too
    dvals_p = jnp.broadcast_to(jnp.linspace(0.8, 2.5, 6)[:, None, None],
                               (6, 68, 84))

    def loss_p(s, **kw):
        w, m = homo_warp(s, proj, dvals_p, pad=2, **kw)
        return jnp.sum(jnp.sin(w) * 0.1) + jnp.sum(m)

    gp1 = jax.grad(loss_p)(src)
    gpa = jax.grad(loss_p)(src, pack=1, bwd_pack=4)
    assert float(jnp.abs(gp1 - gpa).max()) < 1e-6


def test_cascade_features_split_exact(tiny_cfg):
    """features() + from_features() == __call__ bit-for-bit.

    The split is the serving-layout contract (render_path.py caches the
    target-independent FeatureNet forward across trajectory frames)."""
    cfg = tiny_cfg
    H, W = 32, 64
    key = jax.random.PRNGKey(3)
    _, mvs = create_models(cfg)
    v1 = cfg.view_num - 1
    imgs = jax.random.normal(key, (v1, H, W, 3))
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    affs = []
    for v in range(cfg.view_num):
        per_stage = []
        for s in range(3):
            m = np.eye(4, dtype=np.float32)
            Ks = K.copy()
            Ks[:2] /= 2 ** (2 - s)
            m[:3, :3] = Ks
            m[0, 3] = 0.1 * v
            per_stage.append(m)
        affs.append(per_stage)
    affine = jnp.asarray(np.stack(affs))
    affine_inv = jnp.asarray(np.linalg.inv(np.stack(affs)))

    params = mvs.init(key, imgs, affine, affine_inv, 0.5, 2.0)
    full = mvs.apply(params, imgs, affine, affine_inv, 0.5, 2.0)
    feats = mvs.apply(params, imgs, method="features")
    split = mvs.apply(params, feats, affine, affine_inv, 0.5, 2.0,
                      method="from_features")
    assert jax.tree.structure(full) == jax.tree.structure(split)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(full)]),
        np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(split)]))


def test_eval_render_with_cached_features_exact():
    """make_eval_render(mvs_apply=cached-features) == the stock render —
    the exact wiring render_path.py uses for its serving layout."""
    import __graft_entry__ as g
    from ucnerf_tpu.train.loop import make_eval_render, to_device_batch

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    H, W = ds.img_wh[1], ds.img_wh[0]
    batch = to_device_batch(ds[0])

    rgb_1, depth_1, conf_1 = make_eval_render(cfg, nerf, mvs, (H, W))(
        params, batch)

    src_feats = mvs.apply({"params": params["mvs"]}, batch["images"][1:],
                          method="features")

    def mvs_cached(params_mvs, imgs_src, aff, aff_inv, near, far, pad):
        del imgs_src
        return mvs.apply({"params": params_mvs}, src_feats, aff, aff_inv,
                         near, far, pad, method="from_features")

    rgb_c, depth_c, conf_c = make_eval_render(
        cfg, nerf, mvs, (H, W), mvs_apply=mvs_cached)(params, batch)
    np.testing.assert_array_equal(np.asarray(rgb_1), np.asarray(rgb_c))
    np.testing.assert_array_equal(np.asarray(depth_1), np.asarray(depth_c))
    np.testing.assert_array_equal(np.asarray(conf_1), np.asarray(conf_c))
