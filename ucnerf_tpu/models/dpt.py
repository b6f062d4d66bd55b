"""DPT-hybrid monocular depth estimation in pure JAX (reference component #26).

The reference ships DPT as an offline preprocessing tool
(``preprocess/DPT/run_monodepth.py:39-130``: ViT-hybrid
``vitb_rn50_384`` backbone, reassemble + fusion decoder, MiDaS scale/shift
inversion ``:53-61``).  This module reimplements that network TPU-natively:

- BiT (ResNet-v2 bottleneck, weight-standardized convs, GroupNorm-32, TF-SAME
  padding) stem + 3 stages -> features at /4 (256), /8 (512), /16 (1024);
- 1x1 projection to 768 tokens + cls token + bilinearly-resized position
  embeddings; 12 pre-LN ViT layers (GELU, 12 heads), hooks after layers 8/11;
- reassemble (project readout) -> 4-level fusion decoder (pre-act residual
  units, x2 bilinear align_corners=True upsampling) -> depth head.

Parameters are a flat dict keyed by the torch state-dict names of
``transformers.DPTForDepthEstimation`` (hybrid MiDaS config) with layouts
converted once (convs -> HWIO, linears -> (in, out)); inference-only, so no
Flax module machinery.  Numerics are parity-tested against transformers with
random weights (no downloads needed).
"""

from __future__ import annotations

import math
import os
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

HIDDEN = 768
N_LAYERS = 12
N_HEADS = 12
FUSION = 256
HOOKS = (8, 11)            # transformer layer outputs feeding the neck
BIT_DEPTHS = (3, 4, 9)
BIT_CHANNELS = (256, 512, 1024)


# ------------------------------------------------------------ primitive ops
def _tf_same_pad(x, k: int, s: int):
    """TF 'SAME' dynamic padding (transformers BitDynamicPad2d semantics)."""
    h, w = x.shape[0], x.shape[1]
    ph = max((math.ceil(h / s) - 1) * s + k - h, 0)
    pw = max((math.ceil(w / s) - 1) * s + k - w, 0)
    return jnp.pad(x, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                       (0, 0)))


def conv2d(x, w, b=None, stride: int = 1, pad: int = 0):
    """x [H,W,C], w [kh,kw,I,O]; symmetric integer padding."""
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return y if b is None else y + b


def ws_conv2d(x, w, stride: int = 1, eps: float = 1e-8):
    """Weight-standardized conv with TF-SAME padding (BiT
    ``WeightStandardizedConv2d``): per-out-channel standardization of the
    kernel with biased variance.  Standardization is computed in f32 even
    when the weights are stored bf16 (the variance is a cancellation-prone
    reduction), then cast to the activation dtype for the conv."""
    k = w.shape[0]
    wf = w.astype(jnp.float32)
    mean = jnp.mean(wf, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(wf, axis=(0, 1, 2), keepdims=True)
    w = ((wf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if stride == 1:
        return conv2d(x, w, stride=1, pad=(k - 1) // 2)
    x = _tf_same_pad(x, k, stride)
    return conv2d(x, w, stride=stride, pad=0)


def group_norm(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """x [H,W,C]; torch GroupNorm semantics.  Statistics in f32 (bf16-safe);
    result returned in the input dtype."""
    h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(0, 1, 3), keepdims=True)
    var = jnp.var(xg, axis=(0, 1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(h, w, c) * scale + bias).astype(x.dtype)


def layer_norm(x, scale, bias, eps: float = 1e-12):
    """Statistics in f32 (bf16-safe); result in the input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale
            + bias).astype(x.dtype)


def max_pool_same(x, k: int = 3, s: int = 2):
    x = _tf_same_pad(x, k, s)
    return jax.lax.reduce_window(x, jnp.asarray(-jnp.inf, x.dtype),
                                 jax.lax.max, (k, k, 1), (s, s, 1), "VALID")


def resize_bilinear_ac(x, out_hw):
    """align_corners=True bilinear resize of [H, W, C] (fusion/head
    upsampling in DPT).  Lerp weights are f32, so a bf16 input is
    interpolated in f32 and cast back to bf16 at return."""
    dt = x.dtype
    in_h, in_w = x.shape[:2]
    def axis(x, ax, out, in_size):
        if in_size == out:
            return x
        src = jnp.arange(out) * ((in_size - 1) / max(out - 1, 1))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        t = (src - i0).reshape([-1 if a == ax else 1 for a in range(x.ndim)])
        return (jnp.take(x, i0, axis=ax) * (1 - t)
                + jnp.take(x, i1, axis=ax) * t)
    x = axis(x, 0, out_hw[0], in_h)
    return axis(x, 1, out_hw[1], in_w).astype(dt)


# ------------------------------------------------------------ BiT backbone
def _bit_bottleneck(p, prefix, x, stride: int, first: bool):
    shortcut = x
    if first:
        shortcut = ws_conv2d(x, p[prefix + "downsample.conv.weight"],
                             stride=stride)
        shortcut = group_norm(shortcut,
                              p[prefix + "downsample.norm.weight"],
                              p[prefix + "downsample.norm.bias"])
    h = ws_conv2d(x, p[prefix + "conv1.weight"])
    h = jax.nn.relu(group_norm(h, p[prefix + "norm1.weight"],
                               p[prefix + "norm1.bias"]))
    h = ws_conv2d(h, p[prefix + "conv2.weight"], stride=stride)
    h = jax.nn.relu(group_norm(h, p[prefix + "norm2.weight"],
                               p[prefix + "norm2.bias"]))
    h = ws_conv2d(h, p[prefix + "conv3.weight"])
    h = group_norm(h, p[prefix + "norm3.weight"], p[prefix + "norm3.bias"])
    return jax.nn.relu(h + shortcut)


def _bit_forward(p, img):
    """img [H,W,3] -> (feat_4 [.,.,256], feat_8 [.,.,512], feat_16 [.,.,1024])"""
    pre = "dpt.embeddings.backbone.bit."
    x = ws_conv2d(img, p[pre + "embedder.convolution.weight"], stride=2)
    x = jax.nn.relu(group_norm(x, p[pre + "embedder.norm.weight"],
                               p[pre + "embedder.norm.bias"]))
    x = max_pool_same(x)
    feats = []
    for si, depth in enumerate(BIT_DEPTHS):
        stride = 1 if si == 0 else 2
        for li in range(depth):
            prefix = pre + f"encoder.stages.{si}.layers.{li}."
            x = _bit_bottleneck(p, prefix, x, stride if li == 0 else 1,
                                first=li == 0)
        feats.append(x)
    return feats


# ------------------------------------------------------------ ViT encoder
def _attention(p, prefix, x):
    n, c = x.shape
    hd = c // N_HEADS

    def proj(name):
        return x @ p[prefix + f"attention.attention.{name}.weight"] \
            + p[prefix + f"attention.attention.{name}.bias"]

    q = proj("query").reshape(n, N_HEADS, hd).transpose(1, 0, 2)
    k = proj("key").reshape(n, N_HEADS, hd).transpose(1, 0, 2)
    v = proj("value").reshape(n, N_HEADS, hd).transpose(1, 0, 2)
    logits = jnp.einsum("hnd,hmd->hnm", q, k) / math.sqrt(hd)
    # softmax in f32 regardless of the working dtype (bf16-safe)
    att = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("hnm,hmd->hnd", att, v).transpose(1, 0, 2).reshape(n, c)
    return out @ p[prefix + "attention.output.dense.weight"] \
        + p[prefix + "attention.output.dense.bias"]


def _vit_layer(p, prefix, x):
    h = layer_norm(x, p[prefix + "layernorm_before.weight"],
                   p[prefix + "layernorm_before.bias"])
    x = x + _attention(p, prefix, h)
    h = layer_norm(x, p[prefix + "layernorm_after.weight"],
                   p[prefix + "layernorm_after.bias"])
    h = jax.nn.gelu(h @ p[prefix + "intermediate.dense.weight"]
                    + p[prefix + "intermediate.dense.bias"], approximate=False)
    return x + h @ p[prefix + "output.dense.weight"] \
        + p[prefix + "output.dense.bias"]


def _resize_pos_embed(pos, gh: int, gw: int):
    """pos [1+N, C]; grid part bilinearly resized (align_corners=False)."""
    from ucnerf_tpu.ops.interpolate import resize_bilinear
    tok, grid = pos[:1], pos[1:]
    old = int(round(math.sqrt(grid.shape[0])))
    grid = resize_bilinear(grid.reshape(old, old, -1), (gh, gw))
    return jnp.concatenate([tok, grid.reshape(gh * gw, -1)], axis=0)


# ------------------------------------------------------------ neck + head
def _readout_project(p, idx, tokens, cls):
    t = jnp.concatenate(
        [tokens, jnp.broadcast_to(cls, tokens.shape)], axis=-1)
    w = p[f"neck.reassemble_stage.readout_projects.{idx}.0.weight"]
    b = p[f"neck.reassemble_stage.readout_projects.{idx}.0.bias"]
    return jax.nn.gelu(t @ w + b, approximate=False)


def batch_norm_inf(x, p, prefix, eps: float = 1e-5):
    """Inference-mode BatchNorm2d (running statistics; affine math in f32,
    result in the input dtype)."""
    scale = p[prefix + "weight"].astype(jnp.float32) * jax.lax.rsqrt(
        p[prefix + "running_var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p[prefix + "running_mean"]) * scale
            + p[prefix + "bias"]).astype(x.dtype)


def _pre_act_residual(p, prefix, x):
    """Pre-activated residual unit.  The segmentation variant BNs each conv
    and drops the conv biases (reference ``DPTSegmentationModel`` passes
    ``use_bn=True`` to the fusion blocks, ``preprocess/DPT/dpt/models.py:133``;
    transformers ``use_batch_norm_in_fusion_residual``) — both are detected
    from the parameter keys, so depth and seg share this code."""
    use_bn = prefix + "batch_norm1.running_mean" in p

    def conv(h, i):
        h = conv2d(h, p[prefix + f"convolution{i}.weight"],
                   p.get(prefix + f"convolution{i}.bias"), pad=1)
        if use_bn:
            h = batch_norm_inf(h, p, prefix + f"batch_norm{i}.")
        return h

    h = conv(jax.nn.relu(x), 1)
    h = conv(jax.nn.relu(h), 2)
    return x + h


def _fusion_layer(p, idx, x, residual=None):
    prefix = f"neck.fusion_stage.layers.{idx}."
    if residual is not None:
        if residual.shape[:2] != x.shape[:2]:
            from ucnerf_tpu.ops.interpolate import resize_bilinear
            residual = resize_bilinear(residual, x.shape[:2]).astype(x.dtype)
        x = x + _pre_act_residual(p, prefix + "residual_layer1.", residual)
    x = _pre_act_residual(p, prefix + "residual_layer2.", x)
    x = resize_bilinear_ac(x, (x.shape[0] * 2, x.shape[1] * 2))
    return conv2d(x, p[prefix + "projection.weight"],
                  p[prefix + "projection.bias"])


def _dpt_trunk(p: Dict[str, jnp.ndarray], img):
    """Shared DPT-hybrid trunk: BiT + ViT -> reassemble -> fusion decoder.
    img [H, W, 3] (H, W multiples of 16, already normalized) -> fused
    feature map [H/2, W/2, FUSION] (the decoder's ``path_1``)."""
    f4, f8, f16 = _bit_forward(p, img)

    gh, gw = f16.shape[0], f16.shape[1]
    tokens = conv2d(f16, p["dpt.embeddings.projection.weight"],
                    p["dpt.embeddings.projection.bias"]).reshape(gh * gw,
                                                                 HIDDEN)
    cls = p["dpt.embeddings.cls_token"].reshape(1, HIDDEN)
    x = jnp.concatenate([cls, tokens], axis=0)
    # the pos-embed resize lerps in f32; cast back to the working dtype
    x = x + _resize_pos_embed(
        p["dpt.embeddings.position_embeddings"].reshape(-1, HIDDEN),
        gh, gw).astype(x.dtype)

    hooks = {}
    for li in range(N_LAYERS):
        x = _vit_layer(p, f"dpt.encoder.layer.{li}.", x)
        if li in HOOKS:
            hooks[li] = x

    # reassemble hooks 2/3 (hybrid: levels 0/1 are the BiT maps, identity)
    feats = [f4, f8]
    for out_i, li in zip((2, 3), HOOKS):
        h = hooks[li]
        cls_tok, tok = h[:1], h[1:]
        t = _readout_project(p, out_i, tok, cls_tok)
        fm = t.reshape(gh, gw, HIDDEN)
        fm = conv2d(fm,
                    p[f"neck.reassemble_stage.layers.{out_i}.projection.weight"],
                    p[f"neck.reassemble_stage.layers.{out_i}.projection.bias"])
        if out_i == 3:      # factor 0.5 -> 3x3 stride-2 conv
            fm = conv2d(fm, p["neck.reassemble_stage.layers.3.resize.weight"],
                        p["neck.reassemble_stage.layers.3.resize.bias"],
                        stride=2, pad=1)
        feats.append(fm)

    feats = [conv2d(f, p[f"neck.convs.{i}.weight"], pad=1)
             for i, f in enumerate(feats)]

    # fusion: start from the deepest level
    fused = _fusion_layer(p, 0, feats[3])
    fused = _fusion_layer(p, 1, fused, feats[2])
    fused = _fusion_layer(p, 2, fused, feats[1])
    return _fusion_layer(p, 3, fused, feats[0])


def dpt_forward(p: Dict[str, jnp.ndarray], img):
    """img [H, W, 3] (H, W multiples of 16, already normalized) ->
    inverse-depth prediction [H, W] (MiDaS convention)."""
    fused = _dpt_trunk(p, img)
    h = conv2d(fused, p["head.head.0.weight"], p["head.head.0.bias"], pad=1)
    h = resize_bilinear_ac(h, (h.shape[0] * 2, h.shape[1] * 2))
    h = jax.nn.relu(conv2d(h, p["head.head.2.weight"], p["head.head.2.bias"],
                           pad=1))
    h = jax.nn.relu(conv2d(h, p["head.head.4.weight"],
                           p["head.head.4.bias"]))
    return h[..., 0].astype(jnp.float32)


def dpt_seg_forward(p: Dict[str, jnp.ndarray], img):
    """Semantic-segmentation head on the shared trunk (reference
    ``DPTSegmentationModel``, ``preprocess/DPT/dpt/models.py:126-153``;
    transformers ``DPTForSemanticSegmentation``): conv3x3 (no bias) -> BN ->
    ReLU -> [dropout: identity at inference] -> conv1x1 -> 2x bilinear
    align_corners=True upsample.  img [H, W, 3] normalized -> logits
    [H, W, num_labels].  (The training-only auxiliary head,
    ``models.py:145-151``, has no inference role and is not evaluated.)"""
    fused = _dpt_trunk(p, img)
    h = conv2d(fused, p["head.head.0.weight"], pad=1)
    h = jax.nn.relu(batch_norm_inf(h, p, "head.head.1."))
    h = conv2d(h, p["head.head.4.weight"], p["head.head.4.bias"])
    return resize_bilinear_ac(h, (h.shape[0] * 2,
                                  h.shape[1] * 2)).astype(jnp.float32)


def load_dpt_seg(weights_path=None, dtype=None):
    """Returns predict(img01 [H,W,3] in [0,1]) -> (labels [H,W] int32 in
    [1, num_labels], logits [H,W,num_labels]).

    Inference protocol matches the reference seg runner
    (``preprocess/DPT/run_segmentation.py:52-107``): keep-aspect 'minimal'
    resize toward 480 with multiple-of-32 dims via cv2-INTER_CUBIC-kernel
    bicubic, (x-0.5)/0.5 normalization, forward, bicubic
    align_corners=False upsample of the logits back to the input size,
    argmax + 1 (ADE20K labels are 1-based there).

    ``dtype="bfloat16"`` runs the network reduced-precision (the TPU
    analogue of the reference's fp16 CUDA inference); see
    ``_load_converted_params``.
    """
    params = _load_converted_params(
        weights_path, "UCNERF_DPT_SEG_WEIGHTS",
        "pretrained_weights/dpt_hybrid_seg.npz", dtype)
    in_dt = jnp.dtype(dtype) if dtype else jnp.float32

    # params as a jit ARGUMENT, not a closure: closed-over arrays embed as
    # HLO constants — ~0.5 GB serialized for DPT-hybrid, which the axon
    # remote-compile service rejects (HTTP 413) and any backend pays for
    fwd = jax.jit(dpt_seg_forward)

    from ucnerf_tpu.ops.interpolate import resize_bicubic

    def predict(img01):
        x = jnp.asarray(img01, jnp.float32)
        H, W = x.shape[:2]
        net_h, net_w = dpt_input_size(H, W, target=480)
        if (net_h, net_w) != (H, W):
            x = resize_bicubic(x, (net_h, net_w))
        x = ((x - 0.5) / 0.5).astype(in_dt)
        logits = fwd(params, x)
        if (net_h, net_w) != (H, W):
            logits = resize_bicubic(logits, (H, W))
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
        return np.asarray(labels), np.asarray(logits)

    return predict


# ------------------------------------------------------------ weights + API
def _load_converted_params(weights_path, env_var, default_path, dtype=None):
    """Load an .npz produced by ``convert_dpt_torch_state_dict`` (or convert
    a torch checkpoint on the fly).  ``dtype`` (e.g. "bfloat16") casts the
    float parameters for reduced-precision inference — the analogue of the
    reference's ``model.half()`` on CUDA (``run_monodepth.py:82-84``); the
    forward keeps normalization statistics, softmax and the output in f32.
    """
    if weights_path is None:
        weights_path = os.environ.get(env_var, default_path)
    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"DPT weights not found at {weights_path}; convert them once "
            "with ucnerf_tpu.models.dpt.convert_dpt_torch_state_dict")
    if weights_path.endswith((".pt", ".pth", ".bin")):
        import torch
        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        params = convert_dpt_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    else:
        data = np.load(weights_path)
        params = {k: data[k] for k in data.files}
    dt = jnp.dtype(dtype) if dtype else None
    return {k: jnp.asarray(v, dt if dt is not None
                           and np.issubdtype(np.asarray(v).dtype, np.floating)
                           else None)
            for k, v in params.items()}


def convert_dpt_torch_state_dict(sd) -> Dict[str, np.ndarray]:
    """transformers DPTForDepthEstimation (hybrid) state dict -> our layouts:
    conv (O,I,kh,kw) -> (kh,kw,I,O); linear (O,I) -> (I,O)."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith("weight") and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        elif (k.endswith("weight") and v.ndim == 2):
            v = v.T
        out[k] = v.astype(np.float32)
    return out


# MiDaS metric conversion used by the reference (run_monodepth.py:53-61)
MIDAS_SCALE = 0.000305
MIDAS_SHIFT = 0.1378


def midas_to_metric_depth(pred, scale: float = MIDAS_SCALE,
                          shift: float = MIDAS_SHIFT):
    d = scale * pred + shift
    return 1.0 / jnp.maximum(d, 1e-8)


def dpt_input_size(h: int, w: int, target: int = 384,
                   multiple: int = 32):
    """The reference's DPT inference resolution rule: keep-aspect 'minimal'
    resize toward ``target`` with multiple-of-32 output dims
    (reference ``preprocess/DPT/dpt/transforms.py:104-155`` configured by
    ``run_monodepth.py:66-74``).  Returns (new_h, new_w)."""
    scale_h = target / h
    scale_w = target / w
    # 'minimal': scale as little as possible — fit whichever axis is closer
    if abs(1 - scale_w) < abs(1 - scale_h):
        scale_h = scale_w
    else:
        scale_w = scale_h
    new_h = int(np.round(scale_h * h / multiple) * multiple)
    new_w = int(np.round(scale_w * w / multiple) * multiple)
    return new_h, new_w


def load_dpt(weights_path=None, metric: bool = True, dtype=None):
    """Returns predict(img01 [H,W,3] in [0,1]) -> depth [H,W].

    weights: an .npz produced by ``convert_dpt_torch_state_dict`` (or a torch
    checkpoint path, converted on the fly).  ImageNet normalization applied
    internally (the reference's DPT transform normalizes with 0.5/0.5; the
    transformers MiDaS config uses ImageNet stats — we follow the weights
    being loaded via the `norm` key if present, defaulting to 0.5/0.5).

    Inference protocol matches the reference (``run_monodepth.py:88-114``):
    the image is resized to the 384-grid via ``dpt_input_size`` with an
    a=-0.75 bicubic (the kernel cv2 INTER_CUBIC uses for the input resize;
    ``ops.interpolate.resize_bicubic``, torch-parity-tested), the net runs
    at that resolution, the metric conversion is applied (the reference
    bakes scale/shift/invert into ``DPTDepthModel``), and the depth map is
    bicubically upsampled back to the input resolution (torch bicubic,
    also a=-0.75).

    ``dtype="bfloat16"`` runs the network reduced-precision — the TPU
    analogue of the reference's fp16 inference (``model.half()``,
    ``run_monodepth.py:82-84``); normalization statistics, softmax and the
    output stay f32 (see ``_load_converted_params``).  Measured numbers in
    BASELINE.md.
    """
    params = _load_converted_params(
        weights_path, "UCNERF_DPT_WEIGHTS",
        "pretrained_weights/dpt_hybrid.npz", dtype)
    in_dt = jnp.dtype(dtype) if dtype else jnp.float32

    # params as a jit ARGUMENT, not a closure: closed-over arrays embed as
    # HLO constants — ~0.5 GB serialized for DPT-hybrid, which the axon
    # remote-compile service rejects (HTTP 413) and any backend pays for
    fwd = jax.jit(dpt_forward)

    from ucnerf_tpu.ops.interpolate import resize_bicubic

    def predict(img01):
        x = jnp.asarray(img01, jnp.float32)
        H, W = x.shape[:2]
        net_h, net_w = dpt_input_size(H, W)
        if (net_h, net_w) != (H, W):
            x = resize_bicubic(x, (net_h, net_w))
        x = ((x - 0.5) / 0.5).astype(in_dt)
        pred = fwd(params, x)
        pred = midas_to_metric_depth(pred) if metric else pred
        if (net_h, net_w) != (H, W):
            pred = resize_bicubic(pred, (H, W), h_axis=-2, w_axis=-1)
        return np.asarray(pred)

    return predict
