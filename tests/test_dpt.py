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


@pytest.fixture(scope="module")
def torch_dpt_seg():
    import torch
    from transformers import DPTConfig, DPTForSemanticSegmentation
    torch.manual_seed(1)
    cfg = DPTConfig(is_hybrid=True, neck_hidden_sizes=[256, 512, 768, 768],
                    reassemble_factors=[1, 1, 1, 0.5],
                    backbone_out_indices=[2, 5, 8, 11],
                    readout_type="project",
                    backbone_featmap_shape=[1, 1024, 24, 24],
                    use_batch_norm_in_fusion_residual=True,
                    num_labels=9)
    m = DPTForSemanticSegmentation(cfg)
    # exercise the inference BN math with non-trivial running statistics
    # (fresh-init mean=0/var=1 would make BN a near-identity)
    with torch.no_grad():
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.uniform_(-0.5, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_dpt_seg_matches_transformers(torch_dpt_seg, rng):
    """Segmentation variant (reference ``DPTSegmentationModel``,
    ``preprocess/DPT/dpt/models.py:126-153``: BN'd fusion residual units +
    conv-BN-ReLU-conv seg head) vs transformers
    ``DPTForSemanticSegmentation`` with random weights."""
    import torch

    from ucnerf_tpu.models.dpt import dpt_seg_forward

    H = W = 384
    img = rng.uniform(-1, 1, size=(H, W, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_dpt_seg(torch.from_numpy(img).permute(2, 0, 1)[None]
                            ).logits[0].permute(1, 2, 0).numpy()

    params = convert_dpt_torch_state_dict(
        {k: v.numpy() for k, v in torch_dpt_seg.state_dict().items()})
    ours = np.asarray(dpt_seg_forward({k: jnp.asarray(v)
                                       for k, v in params.items()},
                                      jnp.asarray(img)))
    assert ours.shape == ref.shape == (H, W, 9)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(ours - ref).max() / denom < 2e-3, (
        np.abs(ours - ref).max(), denom)


def test_seg_input_size_matches_reference_resize():
    """The seg runner resizes toward 480 (run_segmentation.py:33,52-63) with
    the same 'minimal'/x32 rule — dpt_input_size(target=480) must match the
    reference Resize(480, 480, ...)."""
    import sys
    if "/root/reference/preprocess/DPT" not in sys.path:
        sys.path.insert(0, "/root/reference/preprocess/DPT")
    import cv2
    from dpt.transforms import Resize

    from ucnerf_tpu.models.dpt import dpt_input_size

    ref = Resize(480, 480, resize_target=None, keep_aspect_ratio=True,
                 ensure_multiple_of=32, resize_method="minimal",
                 image_interpolation_method=cv2.INTER_CUBIC)
    for h, w in [(256, 320), (1024, 1280), (480, 480), (375, 500),
                 (300, 400), (123, 457)]:
        new_w, new_h = ref.get_size(w, h)
        assert dpt_input_size(h, w, target=480) == (new_h, new_w), (h, w)


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


def test_dpt_bf16_tracks_f32(torch_dpt, rng):
    """The reduced-precision path (load_dpt(dtype="bfloat16") semantics:
    bf16 params/activations, f32 norm statistics + softmax + output) stays
    close to the f32 forward.  Mirrors the reference's fp16 CUDA inference
    (run_monodepth.py:82-84); the TPU runs bf16 on the MXU.

    Compared at the fusion-trunk output: with random weights the final
    ReLU'd depth head emits near-zero values (max ~0.015), which makes a
    relative metric there degenerate; the trunk is the deepest
    non-degenerate surface (BiT + 12 ViT layers + reassemble + 4 fusion
    blocks).  Measured rel-to-max error 3.4e-2 at bf16."""
    from ucnerf_tpu.models.dpt import _dpt_trunk

    H, W = 192, 256   # pos embeddings resize; any multiple-of-16 size works
    img = rng.uniform(-1, 1, size=(H, W, 3)).astype(np.float32)

    params = convert_dpt_torch_state_dict(
        {k: v.numpy() for k, v in torch_dpt.state_dict().items()})
    p32 = {k: jnp.asarray(v) for k, v in params.items()}
    p16 = {k: jnp.asarray(v, jnp.bfloat16) for k, v in params.items()}

    t32 = np.asarray(_dpt_trunk(p32, jnp.asarray(img)))
    t16 = np.asarray(_dpt_trunk(p16, jnp.asarray(img, jnp.bfloat16))
                     .astype(jnp.float32))
    assert t16.shape == t32.shape == (H // 2, W // 2, 256)
    denom = np.abs(t32).max() + 1e-6
    assert np.abs(t16 - t32).max() / denom < 6e-2, (
        np.abs(t16 - t32).max(), denom)

    # the full-forward output contract stays f32 regardless of param dtype
    out16 = np.asarray(dpt_forward(p16, jnp.asarray(img, jnp.bfloat16)))
    assert out16.dtype == np.float32 and out16.shape == (H, W)
    assert np.isfinite(out16).all()
