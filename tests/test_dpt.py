"""DPT-hybrid JAX port vs transformers torch implementation (random weights —
pretrained downloads are unavailable in this environment, and unnecessary:
architecture parity transfers to any weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ucnerf_tpu.models.dpt import (convert_dpt_torch_state_dict, dpt_forward,
                                   midas_to_metric_depth)


@pytest.fixture(scope="module")
def torch_dpt():
    import torch
    from transformers import DPTConfig, DPTForDepthEstimation
    torch.manual_seed(0)
    cfg = DPTConfig(is_hybrid=True, neck_hidden_sizes=[256, 512, 768, 768],
                    reassemble_factors=[1, 1, 1, 0.5],
                    backbone_out_indices=[2, 5, 8, 11],
                    readout_type="project",
                    backbone_featmap_shape=[1, 1024, 24, 24])
    m = DPTForDepthEstimation(cfg)
    m.eval()
    return m


def test_dpt_matches_transformers(torch_dpt, rng):
    import torch
    H = W = 384   # the hybrid config requires its native image size
    img = rng.uniform(-1, 1, size=(H, W, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_dpt(torch.from_numpy(img).permute(2, 0, 1)[None],
                        ).predicted_depth[0].numpy()

    params = convert_dpt_torch_state_dict(
        {k: v.numpy() for k, v in torch_dpt.state_dict().items()})
    ours = np.asarray(dpt_forward({k: jnp.asarray(v)
                                   for k, v in params.items()},
                                  jnp.asarray(img)))
    assert ours.shape == ref.shape == (H, W)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(ours - ref).max() / denom < 2e-3, (
        np.abs(ours - ref).max(), denom)


def test_midas_metric_conversion():
    pred = jnp.asarray([0.0, 100.0, 10000.0])
    d = np.asarray(midas_to_metric_depth(pred))
    assert (d > 0).all()
    assert d[0] > d[1] > d[2]   # larger inverse depth -> closer


def test_dpt_input_size_matches_reference_resize():
    """dpt_input_size == the reference Resize.get_size('minimal', x32)
    (preprocess/DPT/dpt/transforms.py:104-155, run_monodepth.py:66-74) —
    checked against the reference's own class on a grid of resolutions."""
    import sys
    if "/root/reference/preprocess/DPT" not in sys.path:
        sys.path.insert(0, "/root/reference/preprocess/DPT")
    from dpt.transforms import Resize
    import cv2

    from ucnerf_tpu.models.dpt import dpt_input_size

    ref = Resize(384, 384, resize_target=None, keep_aspect_ratio=True,
                 ensure_multiple_of=32, resize_method="minimal",
                 image_interpolation_method=cv2.INTER_CUBIC)
    for h, w in [(256, 320), (1024, 1280), (384, 384), (375, 500),
                 (480, 640), (300, 400), (1080, 1920), (123, 457)]:
        new_w, new_h = ref.get_size(w, h)   # reference returns (width, height)
        assert dpt_input_size(h, w) == (new_h, new_w), (h, w)
