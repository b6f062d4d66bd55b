"""Objective-level parity against the REFERENCE's own loss code.

Two layers (closing the round-2 verdict's top gap — every earlier torch
comparison was forward-only under no_grad):

1. ``test_loss_terms_match_reference_modules`` /
   ``test_total_loss_assembly_matches_reference``: our ``train/losses.py``
   vs the reference's actual loss modules — ``GradientLoss`` +
   ``compute_scale_and_shift`` (reference ``utils/loss.py:54-112``),
   ``EdgePreservingSmoothnessLoss`` (``network/mvs_models.py:491-509``),
   ``cas_mvsnet_loss`` (``:512-533``), ``img2mse`` (``utils/loss.py:3``),
   the nerf-depth term and the 5-term weighted total
   (``train.py:164-188``) — term by term on controlled random inputs.

2. ``test_gradient_parity_vs_reference_pipeline``: ``jax.grad`` of our
   ACTUAL training objective w.r.t. both param trees vs torch autograd
   through the reference's own cascade + rendering + loss assembly on the
   fabricated scene.  Both sides consume the SAME ray batch (ours —
   legitimate because the reference detaches ray geometry from the cascade:
   ``grad_method="detach"`` at ``network/mvs_models.py:650,716-717``, so
   depth candidates/NDC carry no parameter gradient on either side), which
   removes the coordinate-level conditioning noise the frame-parity test
   has to tolerate.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import import_reference


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_loss_terms_match_reference_modules(reference, rng):
    import utils.loss as ref_loss
    from ucnerf_tpu.train.losses import (cas_mvsnet_loss,
                                         edge_preserving_smoothness,
                                         gradient_scaleinv_loss, img2mse)

    # --- edge-preserving smoothness (mvs_models.py:491-509)
    P, ps = 6, 5
    d = rng.standard_normal((P, ps, ps)).astype(np.float32)
    w = rng.standard_normal((P, ps, ps)).astype(np.float32)
    ours = float(edge_preserving_smoothness(jnp.asarray(d),
                                            jnp.asarray(w)[..., None]))
    ref = float(reference.mvs.EdgePreservingSmoothnessLoss()(
        _t(d), _t(w)[..., None]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # --- scale/shift-invariant gradient loss (utils/loss.py:54-112)
    pred = rng.standard_normal((P, ps, ps)).astype(np.float32) + 2.0
    target = rng.standard_normal((P, ps, ps)).astype(np.float32) + 2.0
    ours = float(gradient_scaleinv_loss(jnp.asarray(pred),
                                        jnp.asarray(target)))
    ref = float(ref_loss.GradientLoss()(_t(pred), _t(target),
                                        torch.ones(P, ps, ps)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # degenerate det==0 branch (constant-zero prediction): the reference
    # leaves s=t=0 via the nonzero() mask; ours must match
    pred0 = np.zeros((P, ps, ps), np.float32)
    ours0 = float(gradient_scaleinv_loss(jnp.asarray(pred0),
                                         jnp.asarray(target)))
    ref0 = float(ref_loss.GradientLoss()(_t(pred0), _t(target),
                                         torch.ones(P, ps, ps)))
    np.testing.assert_allclose(ours0, ref0, rtol=1e-5)

    # --- cas_mvsnet_loss (mvs_models.py:512-533): per-stage smooth-L1 with
    # point weights.  The gt and weight supports coincide (they are splatted
    # at the same pixels) — the precondition the reference's paired fancy
    # indexing depends on.
    mvs_out, gt_ms, w_ms, inputs_t, gt_t, w_t = {}, {}, {}, {}, {}, {}
    for k, (h, wdt) in zip((1, 2, 3), ((8, 10), (16, 20), (32, 40))):
        est = np.abs(rng.standard_normal((h, wdt))).astype(np.float32) * 3
        support = (rng.uniform(size=(h, wdt)) < 0.3).astype(np.float32)
        gt = np.abs(rng.standard_normal((h, wdt))).astype(np.float32) \
            * 3 * support
        wt = rng.uniform(0.5, 2.0, size=(h, wdt)).astype(np.float32) \
            * support
        mvs_out[f"stage{k}"] = {"depth": jnp.asarray(est)}
        gt_ms[f"stage{k}"] = jnp.asarray(gt)
        w_ms[f"stage{k}"] = jnp.asarray(wt)
        inputs_t[f"stage{k}"] = {"depth": _t(est)}
        gt_t[f"stage{k}"] = _t(gt)
        w_t[f"stage{k}"] = _t(wt)
    ours = float(cas_mvsnet_loss(mvs_out, gt_ms, w_ms))
    ref_total, _ = reference.mvs.cas_mvsnet_loss(inputs_t, gt_t, w_t)
    np.testing.assert_allclose(ours, float(ref_total), rtol=1e-5)

    # --- img2mse (utils/loss.py:3)
    a = rng.standard_normal((100, 3)).astype(np.float32)
    b = rng.standard_normal((100, 3)).astype(np.float32)
    np.testing.assert_allclose(float(img2mse(jnp.asarray(a),
                                             jnp.asarray(b))),
                               float(ref_loss.img2mse(_t(a), _t(b))),
                               rtol=1e-6)


def test_total_loss_assembly_matches_reference(reference, rng):
    """Our ``total_loss`` == the reference's train.py:164-188 assembly
    (same weights 0.05/0.05/0.05/0.008/5, same patch-half split, same
    sparse-ray depth term) on identical fabricated tensors."""
    import utils.loss as ref_loss
    from ucnerf_tpu.config import Config
    from ucnerf_tpu.train.losses import total_loss

    pn, ps, n_depth = 6, 4, 16
    patch_pts = pn * ps * ps
    n_fixed = patch_pts + 8                     # + 8 uniform rays
    n_total = n_fixed + n_depth
    cfg = Config(batch_size=n_fixed, patch_size=ps, patch_num=pn,
                 n_depth_rays=n_depth)

    rgb = rng.uniform(size=(n_total, 3)).astype(np.float32)
    target_rgb = rng.uniform(size=(n_total, 3)).astype(np.float32)
    depth_pred = rng.uniform(1.0, 4.0, size=(n_total,)).astype(np.float32)
    dpt_patches = rng.standard_normal((pn, ps, ps)).astype(np.float32)
    target_depths = rng.uniform(1.0, 4.0, size=(n_depth,)).astype(np.float32)
    target_weights = rng.uniform(0.2, 2.0, size=(n_depth,)).astype(np.float32)

    mvs_out, gt_ms, w_ms, inputs_t, gt_t, w_t = {}, {}, {}, {}, {}, {}
    for k, (h, w) in zip((1, 2, 3), ((8, 10), (16, 20), (32, 40))):
        est = np.abs(rng.standard_normal((h, w))).astype(np.float32) * 3
        support = (rng.uniform(size=(h, w)) < 0.3).astype(np.float32)
        gt = np.abs(rng.standard_normal((h, w))).astype(np.float32) \
            * 3 * support
        wt = rng.uniform(0.5, 2.0, size=(h, w)).astype(np.float32) * support
        mvs_out[f"stage{k}"] = {"depth": jnp.asarray(est)}
        gt_ms[f"stage{k}"] = jnp.asarray(gt)
        w_ms[f"stage{k}"] = jnp.asarray(wt)
        inputs_t[f"stage{k}"] = {"depth": _t(est)}
        gt_t[f"stage{k}"] = _t(gt)
        w_t[f"stage{k}"] = _t(wt)

    loss_j, metrics = total_loss(
        cfg, rgb=jnp.asarray(rgb), target_rgb=jnp.asarray(target_rgb),
        depth_pred=jnp.asarray(depth_pred), mvs_out=mvs_out,
        sparse_depth_ms=gt_ms, weight_ms=w_ms,
        target_depths=jnp.asarray(target_depths),
        target_weights=jnp.asarray(target_weights),
        depth_ray_mask=jnp.ones((n_total,), jnp.float32),
        dpt_patches=jnp.asarray(dpt_patches), n_rays_fixed=n_fixed)

    # the reference's assembly, verbatim math (train.py:164-188)
    depth_t = _t(depth_pred)
    patch_depth = depth_t[:patch_pts].reshape(-1, ps, ps)
    patch_dpt = _t(dpt_patches)
    smooth = reference.mvs.EdgePreservingSmoothnessLoss()(
        patch_depth[:pn // 2], patch_dpt[:pn // 2][..., None])
    scaleinv = ref_loss.GradientLoss()(
        patch_depth[pn // 2:], patch_dpt[pn // 2:],
        torch.ones_like(patch_depth[pn // 2:]))
    nerf_depth = torch.mean(
        (depth_t[n_fixed:] - _t(target_depths)) ** 2 * _t(target_weights))
    mvs_total, _ = reference.mvs.cas_mvsnet_loss(inputs_t, gt_t, w_t)
    img = ref_loss.img2mse(_t(rgb), _t(target_rgb))
    total_t = (nerf_depth * 0.05 + mvs_total * 0.05 + smooth * 0.05
               + scaleinv * 0.008 + img * 5.0)

    np.testing.assert_allclose(float(metrics["smooth"]), float(smooth),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["scaleinv"]), float(scaleinv),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["nerf_depth"]),
                               float(nerf_depth), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["mvs"]), float(mvs_total),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["img_mse"]), float(img),
                               rtol=1e-5)
    np.testing.assert_allclose(float(loss_j), float(total_t), rtol=1e-5)


def test_gradient_parity_vs_reference_pipeline(reference):
    """End-to-end gradient parity: jax.grad of our training objective vs
    torch autograd through the reference's cascade + rendering + loss on
    the same scene, same params, same ray batch."""
    import utils.loss as ref_loss
    import __graft_entry__ as g
    from ucnerf_tpu.train.loop import (scene_inputs, scene_loss,
                                       to_device_batch)
    from ucnerf_tpu.utils.checkpoint_io import (export_casmvsnet_state_dict,
                                                export_nerf_state_dict)

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    # multires=6: the 2^9 top PE band of the default multires=10 amplifies
    # ~1e-6 coordinate-level fp differences into ~1e-2..1e-1 RELATIVE
    # gradient noise through the MLP (measured; the conditioning is
    # characterized in test_reference_parity.py).  Dropping to 2^5 makes the
    # gradient comparison sharp while exercising the identical code paths.
    cfg = cfg.replace(nerf_dtype="float32", multires=6)
    from ucnerf_tpu.models.factory import create_models, init_params
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0),
                         (ds.img_wh[1], ds.img_wh[0]))
    # tame the random-init bias-multiply trunk like the frame-parity test
    db = params["nerf"]["nerf"]["pts_bias_depth_fine"]["Dense_0"]
    db["kernel"] = db["kernel"] * 0.05
    db["bias"] = db["bias"] * 0.05
    sample = ds[0]                 # fetch once (dataset rng)
    batch = to_device_batch(sample)
    key = jax.random.PRNGKey(21)
    V = cfg.view_num

    assert np.asarray(sample["sparse_mask"]).all(), \
        "test precondition: full sparse-ray buffer (else the reference's " \
        "dynamic mean over sparse rays is not comparable)"

    # ---- jax: loss, per-term metrics, gradients of the REAL objective
    (loss_j, metrics), grads = jax.jit(jax.value_and_grad(
        lambda p: scene_loss(cfg, nerf, mvs, p, batch, key),
        has_aux=True))(params)
    _, _, _, rays = scene_inputs(cfg, mvs, params, batch, key, train=True)
    rays = jax.tree.map(np.asarray, rays)

    # ---- torch: same params through the reference's own pipeline
    imgs = _t(sample["images"]).permute(0, 3, 1, 2)[None]     # [1,V,3,H,W]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_casmvsnet_state_dict(params["mvs"]).items()}
    ref_cas = reference.mvs.CascadeMVSNet(view_num=V)
    missing, unexpected = ref_cas.load_state_dict(sd, strict=False)
    assert not unexpected
    ref_cas.train()

    feat_dim = 24 + (V - 1) * 12 + 1
    ref_nerf = reference.models.UCNeRF(
        D=cfg.netdepth, W=cfg.netwidth,
        input_ch_pts=3 + 6 * cfg.multires, input_ch_views=27,
        input_ch_feat=feat_dim, skips=[4], net_type="v0", view_num=V)
    nsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in export_nerf_state_dict(params["nerf"]).items()}
    ref_nerf.load_state_dict(nsd, strict=False)
    ref_nerf.train()

    embed_fn, _ = reference.models.get_embedder(cfg.multires)
    embeddirs_fn, _ = reference.models.get_embedder(cfg.multires_views)
    network_query_fn = (
        lambda pts, viewdirs, rays_feats, network_fn:
        reference.renderer.run_network_mvs(
            pts, viewdirs, rays_feats, network_fn, embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn, netchunk=1024))

    args = types.SimpleNamespace(
        view_num=V, feat_dim=feat_dim, img_downscale=1.0,
        use_color_volume=False, net_type="v0", N_samples=cfg.N_samples,
        netchunk=1024, pad=cfg.pad, chunk=cfg.chunk, netdepth=cfg.netdepth,
        netwidth=cfg.netwidth, white_bkgd=False)

    near_fars = _t(sample["near_fars"])
    volume_feature, confidence_t, mvs_depth, outputs = ref_cas(
        imgs[:, 1:], _t(sample["affine_mat"]), _t(sample["affine_mat_inv"]),
        near_fars[0], pad=cfg.pad)

    # rendering consumes OUR ray batch (identical on both sides; ray
    # geometry is detached from the cascade by construction on both sides)
    from ucnerf_tpu.data.base import IMAGENET_MEAN, IMAGENET_STD
    mean = torch.tensor(IMAGENET_MEAN).view(1, 1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 1, 3, 1, 1)
    imgs_un = imgs * std + mean
    pose_ref = {"w2cs": _t(sample["w2cs"]), "c2ws": _t(sample["c2ws"]),
                "intrinsics": _t(sample["intrinsics"]),
                "near_fars": near_fars}
    rays_ndc = {k: _t(rays["ndc"][k]) for k in rays["ndc"]}
    rgb_t, depth_t = reference.renderer.rendering(
        args, pose_ref, _t(rays["points_world"]), rays_ndc,
        _t(rays["depth_candidates"]), _t(rays["rays_d"]), outputs,
        imgs_un[:, 1:], near_fars=near_fars[0],
        img_feat=outputs["stage3"]["img_feats"], confidence=confidence_t,
        network_fn=ref_nerf, network_query_fn=network_query_fn)

    # the reference's loss assembly (train.py:164-188) at our pixel coords
    pn, ps = cfg.patch_num, cfg.patch_size
    patch_pts = pn * ps * ps
    n_fixed = cfg.batch_size
    coords = rays["pixel_coords"]
    patch_depth = depth_t[:patch_pts].reshape(-1, ps, ps)
    patch_dpt = _t(sample["dpt"])[coords[:patch_pts, 0],
                                  coords[:patch_pts, 1]].reshape(
        pn, ps, ps, 1)
    dcoords = coords[n_fixed:]
    target_depths = _t(sample["sparse_depths"])[dcoords[:, 0], dcoords[:, 1]]
    target_weights = _t(sample["sparse_weights"])[dcoords[:, 0],
                                                  dcoords[:, 1]]

    smooth = reference.mvs.EdgePreservingSmoothnessLoss()(
        patch_depth[:pn // 2], patch_dpt[:pn // 2])
    scaleinv = ref_loss.GradientLoss()(
        patch_depth[pn // 2:], patch_dpt[pn // 2:].squeeze(-1),
        torch.ones_like(patch_depth[pn // 2:]))
    nerf_depth = torch.mean((depth_t[n_fixed:] - target_depths) ** 2
                            * target_weights)
    # the cascade's stage depths are [1, h, w] (batched); the dataloader
    # delivers the pyramids with the same leading dim (train.py:111-112)
    mvs_total, _ = reference.mvs.cas_mvsnet_loss(
        outputs,
        {k: _t(v)[None] for k, v in sample["sparse_depth_ms"].items()},
        {k: _t(v)[None] for k, v in sample["weight_ms"].items()})
    img = ref_loss.img2mse(rgb_t, _t(rays["colors"]))
    loss_t = (nerf_depth * 0.05 + mvs_total * 0.05 + smooth * 0.05
              + scaleinv * 0.008 + img * 5.0)
    loss_t.backward()

    # ---- per-term parity on the REAL pipeline tensors.  rtol 6e-3: both
    # sides render depth through their own full pipeline (f32 reduction
    # order + the 2^9 PE conditioning, see test_reference_parity.py), and
    # the TV-of-depth terms amplify per-pixel noise; the loss MODULES
    # themselves are compared at rtol 1e-5 in the two tests above.
    for name, ref_val in (("smooth", smooth), ("scaleinv", scaleinv),
                          ("nerf_depth", nerf_depth), ("mvs", mvs_total),
                          ("img_mse", img), ("loss", loss_t)):
        np.testing.assert_allclose(
            float(metrics[name]), float(ref_val), rtol=6e-3,
            err_msg=f"loss term {name!r} vs reference pipeline")

    # ---- gradient parity, per tensor.  The exporters are pure
    # transpose/reshape maps, so they apply to gradient trees verbatim.
    grads_mvs = export_casmvsnet_state_dict(
        jax.tree.map(np.asarray, grads["mvs"]))
    grads_nerf = export_nerf_state_dict(
        jax.tree.map(np.asarray, grads["nerf"]))
    torch_grads = {n: p.grad for n, p in ref_cas.named_parameters()}
    torch_grads.update({n: p.grad for n, p in ref_nerf.named_parameters()})

    rels = {}
    for name, gj in {**grads_mvs, **grads_nerf}.items():
        gt_ = torch_grads.get(name)
        if gt_ is None:            # layers defined-but-unused by the
            continue               # reference forward (feature_linear_1...)
        gt_ = gt_.numpy()
        scale = max(np.abs(gj).max(), np.abs(gt_).max(), 1e-10)
        rels[name] = np.abs(gj - gt_).max() / scale
    assert len(rels) > 50, f"only {len(rels)} gradient tensors compared"
    worst = max(rels, key=rels.get)
    med = float(np.median(list(rels.values())))
    print(f"gradient parity: {len(rels)} tensors, median rel {med:.2e}, "
          f"worst rel {rels[worst]:.2e} at {worst}")
    # distribution envelope (at multires=6; see the conditioning note above)
    assert med < 5e-3, f"median gradient rel {med:.2e}"
    for name, rel in rels.items():
        assert rel < 3e-2, f"gradient mismatch {name}: rel {rel:.2e}"
