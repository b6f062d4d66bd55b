"""Pinned-RNG training-dynamics A/B vs the reference's own training math.

Closes the last offline parity gap (round-2 verdict #6): optimization
itself.  Both sides start from IDENTICAL converted parameters and run N
Adam steps of the SAME objective on the SAME scene sample:

- ours: the real ``scene_loss`` (MVS fwd -> ray build -> render -> 5-term
  loss, reference ``train.py:110-211`` semantics) + ``optax.adam``.
- reference: its own ``CascadeMVSNet`` -> ``rendering`` -> loss assembly
  (``train.py:164-188``) -> ``torch.optim.Adam`` (``train.py:85-92``,
  betas (0.9, 0.999); constant lr on both sides so the schedules are
  identical).

RNG pinning: each step's ray batch (confidence-guided patches, uniform
pixels, sparse-depth rays, stratified jitter) is drawn ONCE by our
``scene_inputs`` under that step's PRNG key and fed verbatim to the
reference's ``rendering`` — so no discrete sampling divergence enters the
A/B and the comparison isolates the numerics of forward/backward/Adam.
(Legitimate because ray geometry is parameter-detached on both sides:
``grad_method="detach"``, reference ``network/mvs_models.py:650,716-717``.)

The trajectories cannot match bit-for-bit (f32 reduction order + the 2^9
PE conditioning measured in test_reference_parity.py, compounding through
Adam's rescaling); the assertion is an envelope: per-step relative loss
gap within a few percent over the whole run, and both sides actually
optimize (final img_mse well below initial).
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from test_reference_parity import import_reference

N_STEPS = 40
LR = 5e-4


@pytest.fixture(scope="module")
def reference():
    return import_reference()


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


def test_training_dynamics_match_reference(reference):
    import utils.loss as ref_loss
    import __graft_entry__ as g
    from ucnerf_tpu.train.loop import scene_inputs, scene_loss, \
        to_device_batch
    from ucnerf_tpu.utils.checkpoint_io import (export_casmvsnet_state_dict,
                                                export_nerf_state_dict)

    cfg, ds, nerf, mvs, params = g._tiny_setup()
    # multires=6 tames the 2^9 PE conditioning like in test_loss_parity —
    # at multires=10 the per-step gradient noise compounds through Adam
    # into transient ~2e-1 loss gaps (measured) without changing the math
    # under test.
    cfg = cfg.replace(nerf_dtype="float32", multires=6)
    from ucnerf_tpu.models.factory import create_models, init_params
    nerf, mvs = create_models(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0),
                         (ds.img_wh[1], ds.img_wh[0]))
    # tame the random-init bias-multiply trunk (see test_reference_parity)
    db = params["nerf"]["nerf"]["pts_bias_depth_fine"]["Dense_0"]
    db["kernel"] = db["kernel"] * 0.05
    db["bias"] = db["bias"] * 0.05
    sample = ds[0]                       # fetch once (dataset rng)
    batch = to_device_batch(sample)
    V = cfg.view_num

    # ---- ours: jitted grad step + plain Adam (matches torch defaults)
    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, k: scene_loss(cfg, nerf, mvs, p, batch, k),
        has_aux=True))
    rays_fn = jax.jit(
        lambda p, k: scene_inputs(cfg, mvs, p, batch, k, train=True)[3])

    # ---- reference: same params through its own modules
    imgs = _t(sample["images"]).permute(0, 3, 1, 2)[None]
    ref_cas = reference.mvs.CascadeMVSNet(view_num=V)
    sd = {k: _t(v) for k, v in
          export_casmvsnet_state_dict(params["mvs"]).items()}
    ref_cas.load_state_dict(sd, strict=False)
    ref_cas.train()

    feat_dim = 24 + (V - 1) * 12 + 1
    ref_nerf = reference.models.UCNeRF(
        D=cfg.netdepth, W=cfg.netwidth,
        input_ch_pts=3 + 6 * cfg.multires, input_ch_views=27,
        input_ch_feat=feat_dim, skips=[4], net_type="v0", view_num=V)
    nsd = {k: _t(v) for k, v in export_nerf_state_dict(params["nerf"]).items()}
    ref_nerf.load_state_dict(nsd, strict=False)
    ref_nerf.train()
    opt_t = torch.optim.Adam(
        list(ref_cas.parameters()) + list(ref_nerf.parameters()),
        lr=LR, betas=(0.9, 0.999), eps=1e-8)

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
    pose_ref = {"w2cs": _t(sample["w2cs"]), "c2ws": _t(sample["c2ws"]),
                "intrinsics": _t(sample["intrinsics"]),
                "near_fars": near_fars}
    from ucnerf_tpu.data.base import IMAGENET_MEAN, IMAGENET_STD
    mean = torch.tensor(IMAGENET_MEAN).view(1, 1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 1, 3, 1, 1)
    imgs_un = imgs * std + mean
    gt_ms = {k: _t(v)[None] for k, v in sample["sparse_depth_ms"].items()}
    w_ms = {k: _t(v)[None] for k, v in sample["weight_ms"].items()}
    dpt_t = _t(sample["dpt"])
    sparse_d_t = _t(sample["sparse_depths"])
    sparse_w_t = _t(sample["sparse_weights"])
    pn, ps = cfg.patch_num, cfg.patch_size
    patch_pts = pn * ps * ps
    n_fixed = cfg.batch_size

    def reference_step(rays):
        """One reference training step on our pinned ray batch; returns the
        loss (reference train.py:110-211 math, Adam update applied)."""
        opt_t.zero_grad()
        _, confidence_t, _, outputs = ref_cas(
            imgs[:, 1:], _t(sample["affine_mat"]),
            _t(sample["affine_mat_inv"]), near_fars[0], pad=cfg.pad)
        rays_ndc = {k: _t(rays["ndc"][k]) for k in rays["ndc"]}
        rgb_t, depth_t = reference.renderer.rendering(
            args, pose_ref, _t(rays["points_world"]), rays_ndc,
            _t(rays["depth_candidates"]), _t(rays["rays_d"]), outputs,
            imgs_un[:, 1:], near_fars=near_fars[0],
            img_feat=outputs["stage3"]["img_feats"],
            confidence=confidence_t,
            network_fn=ref_nerf, network_query_fn=network_query_fn)
        coords = rays["pixel_coords"]
        patch_depth = depth_t[:patch_pts].reshape(-1, ps, ps)
        patch_dpt = dpt_t[coords[:patch_pts, 0],
                          coords[:patch_pts, 1]].reshape(pn, ps, ps)
        dcoords = coords[n_fixed:]
        smooth = reference.mvs.EdgePreservingSmoothnessLoss()(
            patch_depth[:pn // 2], patch_dpt[:pn // 2][..., None])
        scaleinv = ref_loss.GradientLoss()(
            patch_depth[pn // 2:], patch_dpt[pn // 2:],
            torch.ones_like(patch_depth[pn // 2:]))
        nerf_depth = torch.mean(
            (depth_t[n_fixed:] - sparse_d_t[dcoords[:, 0], dcoords[:, 1]])
            ** 2 * sparse_w_t[dcoords[:, 0], dcoords[:, 1]])
        mvs_total, _ = reference.mvs.cas_mvsnet_loss(outputs, gt_ms, w_ms)
        img = ref_loss.img2mse(rgb_t, _t(rays["colors"]))
        loss_t = (nerf_depth * 0.05 + mvs_total * 0.05 + smooth * 0.05
                  + scaleinv * 0.008 + img * 5.0)
        loss_t.backward()
        opt_t.step()
        return float(loss_t), float(img)

    assert np.asarray(sample["sparse_mask"]).all(), \
        "precondition: full sparse buffer (reference takes a plain mean)"

    key = jax.random.PRNGKey(77)
    losses_j, losses_t, gaps = [], [], []
    img0 = imgN = None
    for step in range(N_STEPS):
        key, sub = jax.random.split(key)
        rays = jax.tree.map(np.asarray, rays_fn(params, sub))
        (loss_j, metrics), grads = grad_fn(params, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        loss_t, img_t = reference_step(rays)
        lj = float(loss_j)
        losses_j.append(lj)
        losses_t.append(loss_t)
        gaps.append(abs(lj - loss_t) / max(abs(loss_t), 1e-8))
        if step == 0:
            img0 = float(metrics["img_mse"])
        imgN = float(metrics["img_mse"])

    print(f"dynamics A/B over {N_STEPS} steps: loss_j "
          f"{losses_j[0]:.4f}->{losses_j[-1]:.4f}, loss_t "
          f"{losses_t[0]:.4f}->{losses_t[-1]:.4f}, rel gap "
          f"median {np.median(gaps):.2e} max {np.max(gaps):.2e}")

    # step-0 losses are the forward-parity bound; later steps compound
    # Adam-rescaled fp divergence — envelope, not equality.  Calibrated on
    # the fabricated scene: median 8e-3, transient max 9.2e-2 around the
    # mid-training knee, final-step gap 6e-2.
    assert gaps[0] < 6e-3, f"step-0 loss gap {gaps[0]:.2e}"
    assert np.median(gaps) < 2e-2, f"median loss gap {np.median(gaps):.2e}"
    assert max(gaps) < 1.5e-1, f"max loss gap {max(gaps):.2e}"
    assert gaps[-1] < 1e-1, f"final-step loss gap {gaps[-1]:.2e}"
    # both sides actually optimize the same objective (0.163 -> 0.085
    # measured in 40 steps at multires=6)
    assert losses_j[-1] < 0.6 * losses_j[0], (losses_j[0], losses_j[-1])
    assert losses_t[-1] < 0.6 * losses_t[0], (losses_t[0], losses_t[-1])
    assert imgN < img0, "photometric term did not improve"
