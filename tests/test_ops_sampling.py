"""Golden tests for grid_sample / interpolate / warp vs torch reference ops.

torch (CPU) is used only as a *test oracle* for the exact sampling semantics
the upstream repo relies on; nothing in the library imports torch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ucnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from ucnerf_tpu.ops.interpolate import (resize_bilinear, resize_trilinear,
                                        resize_nearest, upsample2x_nearest)
from ucnerf_tpu.ops.warp import homo_warp


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_2d_matches_torch(rng, mode, padding, align):
    H, W, C = 13, 17, 5
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(4, 9, 2))).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                     mode=mode, padding_mode=padding,
                                     align_corners=align))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]      # [1,C,H,W]
    t_grid = torch.from_numpy(grid)[None]                     # [1,4,9,2]
    ref = F.grid_sample(t_img, t_grid, mode=mode, padding_mode=padding,
                        align_corners=align)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_3d_matches_torch(rng, padding, align):
    D, H, W, C = 7, 11, 13, 4
    vol = rng.standard_normal((D, H, W, C)).astype(np.float32)
    grid = (rng.uniform(-1.2, 1.2, size=(3, 8, 3))).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                     padding_mode=padding,
                                     align_corners=align))

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]   # [1,C,D,H,W]
    t_grid = torch.from_numpy(grid)[None, None]               # [1,1,3,8,3]
    ref = F.grid_sample(t_vol, t_grid, mode="bilinear", padding_mode=padding,
                        align_corners=align)[0, :, 0]          # [C,3,8]
    ref = ref.permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(20, 28), (7, 9), (16, 16)])
def test_resize_bilinear_matches_torch(rng, out_hw):
    H, W, C = 16, 16, 3
    x = rng.standard_normal((H, W, C)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                        size=out_hw, mode="bilinear",
                        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_dhw", [(32, 20, 28), (8, 64, 80)])
def test_resize_trilinear_matches_torch(rng, out_dhw):
    D, H, W = 48, 24, 30
    x = rng.standard_normal((D, H, W, 1)).astype(np.float32)
    ours = np.asarray(resize_trilinear(jnp.asarray(x), out_dhw))
    ref = F.interpolate(torch.from_numpy(x[..., 0])[None, None],
                        size=out_dhw, mode="trilinear",
                        align_corners=False)[0, 0].numpy()
    np.testing.assert_allclose(ours[..., 0], ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(384, 480), (9, 13), (256, 320)])
def test_resize_bicubic_matches_torch(rng, out_hw):
    """a=-0.75 bicubic (the DPT pre/post resample, ADVICE r2) == torch
    ``interpolate(mode='bicubic', align_corners=False)`` up AND down."""
    from ucnerf_tpu.ops.interpolate import resize_bicubic
    H, W, C = 32, 40, 3
    x = rng.standard_normal((H, W, C)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                        size=out_hw, mode="bicubic",
                        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)
    # 2D map form (the DPT depth output path)
    ours2 = np.asarray(resize_bicubic(jnp.asarray(x[..., 0]), out_hw,
                                      h_axis=-2, w_axis=-1))
    np.testing.assert_allclose(ours2, ref[..., 0], rtol=1e-4, atol=5e-5)


def test_resize_nearest_matches_torch(rng):
    x = rng.standard_normal((10, 14, 2)).astype(np.float32)
    for out_hw in [(20, 28), (5, 7), (13, 3)]:
        ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
        ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                            size=out_hw,
                            mode="nearest")[0].permute(1, 2, 0).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_upsample2x_nearest_matches_torch(rng):
    x = rng.standard_normal((6, 5, 3)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                        scale_factor=2,
                        mode="nearest")[0].permute(1, 2, 0).numpy()
    np.testing.assert_array_equal(ours, ref)


def _torch_homo_warp(src_feat, proj_mat, depth_values, pad=0):
    """Literal re-statement of reference utils/utils.py:1105-1172 semantics."""
    B, C, H, W = src_feat.shape
    D = depth_values.shape[1]
    H_pad, W_pad = H + pad * 2, W + pad * 2
    R = proj_mat[:, :, :3]
    T = proj_mat[:, :, 3:]
    ys, xs = torch.meshgrid(torch.arange(H_pad, dtype=torch.float32),
                            torch.arange(W_pad, dtype=torch.float32),
                            indexing="ij")
    ref_grid = torch.stack([xs, ys], dim=0)[None] - pad       # (1,2,H,W)
    ref_grid = ref_grid.reshape(1, 2, -1).expand(B, -1, -1)
    ref_grid = torch.cat([ref_grid, torch.ones_like(ref_grid[:, :1])], 1)
    ref_grid_d = ref_grid.repeat(1, 1, D)
    src_grid_d = R @ ref_grid_d + T / depth_values.reshape(B, 1, -1)
    src_grid = src_grid_d[:, :2] / src_grid_d[:, 2:]
    src_grid[:, 0] = src_grid[:, 0] / ((W - 1) / 2) - 1
    src_grid[:, 1] = src_grid[:, 1] / ((H - 1) / 2) - 1
    src_grid = src_grid.permute(0, 2, 1)
    warped = F.grid_sample(src_feat, src_grid.view(B, D, W_pad * H_pad, 2),
                           mode="nearest", padding_mode="border",
                           align_corners=True)
    warped = warped.view(B, C, D, H_pad, W_pad)
    grid = src_grid.view(B, 1, D, H_pad, W_pad, 2)
    in_mask = ((grid > -1.0) * (grid < 1.0))
    in_mask = (in_mask[..., 0] * in_mask[..., 1]).float()
    return warped, in_mask


@pytest.mark.parametrize("pad", [0, 2])
def test_homo_warp_matches_reference_semantics(rng, pad):
    H, W, C, D = 12, 16, 6, 5
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    # a plausible relative projection: small rotation + translation
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    th = 0.05
    Rm = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([0.02, -0.01, 0.03], np.float32)
    P_src = K @ np.concatenate([Rm, t[:, None]], axis=1)
    P_ref4 = np.eye(4, dtype=np.float32)
    P_ref4[:3, :3] = K
    proj = (np.concatenate([P_src, [[0, 0, 0, 1]]]) @
            np.linalg.inv(P_ref4))[:3].astype(np.float32)
    depth = rng.uniform(0.5, 2.0,
                        size=(D, H + 2 * pad, W + 2 * pad)).astype(np.float32)

    warped, mask = homo_warp(jnp.asarray(feat), jnp.asarray(proj),
                             jnp.asarray(depth), pad=pad)

    ref_w, ref_m = _torch_homo_warp(
        torch.from_numpy(feat).permute(2, 0, 1)[None],
        torch.from_numpy(proj)[None],
        torch.from_numpy(depth)[None], pad=pad)
    ref_w = ref_w[0].permute(1, 2, 3, 0).numpy()     # [D,H,W,C]
    np.testing.assert_allclose(np.asarray(warped), ref_w, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask), ref_m[0, 0].numpy())


def test_sample_pdf_matches_reference_code(rng):
    """Inverse-CDF sampling == the reference's own sample_pdf
    (data/ray_utils.py:98-141, extracted by AST — the module's
    kornia/network imports are irrelevant to the function) in
    deterministic mode, where both sides use the same u grid."""
    import ast
    import os
    ref_path = "/root/reference/data/ray_utils.py"
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference tree not available")
    tree = ast.parse(open(ref_path).read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "sample_pdf")
    ns = {"torch": torch, "np": np, "searchsorted": torch.searchsorted}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), ref_path, "exec"),
         ns)

    from ucnerf_tpu.ops.sampling import sample_pdf

    N, B, S = 12, 9, 17
    bins = np.sort(rng.uniform(0.5, 3.0, size=(N, B)).astype(np.float32),
                   axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(N, B - 1)).astype(np.float32)
    weights[0, :3] = 0.0                       # degenerate mass corner

    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                 S, det=True))
    theirs = ns["sample_pdf"](torch.from_numpy(bins),
                              torch.from_numpy(weights), S,
                              det=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
