"""Building-block layers with torch-compatible semantics.

The reference's conv blocks (``network/mvs_models.py:21-196``) are
Conv{2,3}d / ConvTranspose{2,3}d + BatchNorm + ReLU.  Two torch details we
reproduce exactly:

1. **Explicit symmetric padding.** torch pads (p, p) per spatial dim; XLA
   'SAME' pads asymmetrically for stride 2, which shifts the output grid.
   All convs here use explicit torch-style padding tuples.
2. **Batch-statistics BatchNorm.** The reference always runs its nets in
   train mode — even during validation it calls ``Consist_Learner.train()``
   (reference ``train.py:226``) — so BatchNorm always normalizes with the
   current batch statistics (biased variance, eps=1e-5).  We therefore
   implement BN as a pure batch-stat normalizer with learnable scale/shift;
   running averages are tracked nowhere because the reference never consumes
   them.

Layout: channel-last (NHWC / NDHWC), the TPU-native choice.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


class Folded(NamedTuple):
    """A [D, H, W, C] volume stored depth-folded as [H, W, D*C].

    TPU-native layout for small-channel 3D convs: the MXU wants >=128-wide
    channel contractions, but the reference's CostRegNet runs C=8..64
    (``network/mvs_models.py:412-443``), which measures latency-bound on TPU
    (~34-38 ms per U-Net regardless of a 4-64x size difference).  Folding
    depth into channels turns every 3x3x3 conv into a 3x3 2D conv whose
    (D*Cin) x (D*Cout) channel matrix is block-tridiagonal in depth — we
    materialize it dense, trading ~D/3x redundant MXU FLOPs (cheap) for full
    lane utilization (the actual bottleneck).
    """
    x: jnp.ndarray   # [H, W, D*C]
    d: int           # static depth

    @property
    def channels(self) -> int:
        return self.x.shape[-1] // self.d

    def __add__(self, other: "Folded") -> "Folded":
        assert self.d == other.d
        return Folded(self.x + other.x, self.d)


def fold_volume(x: jnp.ndarray) -> Folded:
    """[D, H, W, C] -> Folded([H, W, D*C])."""
    d, h, w, c = x.shape
    return Folded(jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w, d * c), d)


def unfold_volume(f: Folded) -> jnp.ndarray:
    """Folded -> [D, H, W, C]."""
    h, w = f.x.shape[:2]
    c = f.channels
    return jnp.transpose(f.x.reshape(h, w, f.d, c), (2, 0, 1, 3))


class SpaceFolded(NamedTuple):
    """An [H, W, C] map stored space-to-depth folded as [H/f, W/f, f*f*C].

    Same motivation as ``Folded`` but for the FeatureNet FPN's 2D convs
    (C=3..32, reference ``mvs_models.py:309-410``): at C=8 a conv fills
    8/128 MXU lanes and the 11-conv FPN measures latency-bound.  Folding
    f x f fine pixels into channels (phase-major: channel index =
    (ay*f + ax)*C + c) runs every conv at one coarse resolution with
    f^2-wider channel contractions.  A fine (k, s, p) conv becomes a
    coarse conv whose kernel carries per-axis fold taps (``_space_taps``):
    fine output phase o and kernel tap q land at coarse offset qf and
    input phase a with  s*o + q - p == f_in*(qf - pf) + a,  separably in
    y and x.  Strides divide the fold: f_out = f_in // s.
    """
    x: jnp.ndarray   # [H/f, W/f, f*f*C]
    f: int           # static fold factor per spatial axis

    @property
    def channels(self) -> int:
        return self.x.shape[-1] // (self.f * self.f)

    def __add__(self, other: "SpaceFolded") -> "SpaceFolded":
        assert self.f == other.f
        return SpaceFolded(self.x + other.x, self.f)


def space_fold(x: jnp.ndarray, f: int) -> SpaceFolded:
    """[H, W, C] -> SpaceFolded([H/f, W/f, f*f*C]), phase-major channels."""
    if f == 1:
        return SpaceFolded(x, 1)
    h, w, c = x.shape
    x = x.reshape(h // f, f, w // f, f, c)
    return SpaceFolded(
        jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(h // f, w // f,
                                                  f * f * c), f)


def space_unfold(s: SpaceFolded) -> jnp.ndarray:
    """SpaceFolded -> [H, W, C]."""
    if s.f == 1:
        return s.x
    hb, wb = s.x.shape[:2]
    f, c = s.f, s.channels
    x = s.x.reshape(hb, wb, f, f, c)
    return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(hb * f, wb * f, c)


def _space_taps(f_in: int, k: int, stride: int,
                pad: int) -> Tuple[np.ndarray, int]:
    """Per-axis fold taps: T[q, qf, a, o] = 1 iff fine kernel tap q maps
    input phase a at coarse offset qf to output phase o, i.e.
    ``stride*o + q - pad == f_in*(qf - pf) + a``.  Returns (T, pf) with
    qf in [0, kf).  Requires f_in % stride == 0 (f_out = f_in // stride).
    """
    assert f_in % stride == 0
    f_out = f_in // stride
    r_lo = -pad                              # min of stride*o + q - pad
    r_hi = stride * (f_out - 1) + k - 1 - pad
    pf = -(r_lo // f_in) if r_lo < 0 else 0
    kf = (r_hi // f_in) + 1 + pf
    T = np.zeros((k, kf, f_in, f_out), np.float32)
    for q in range(k):
        for o in range(f_out):
            r = stride * o + q - pad
            qf, a = divmod(r, f_in)
            T[q, qf + pf, a, o] = 1.0
    return T, pf


def _space_fold_kernel(w, Ty, Tx):
    """Fine kernel (kh, kw, Cin, Cout) + per-axis taps -> coarse kernel
    (kfy, kfx, f_in^2*Cin, f_out^2*Cout), phase-major channel layout."""
    kh, kw, cin, cout = w.shape
    Ty = jnp.asarray(Ty, w.dtype)
    Tx = jnp.asarray(Tx, w.dtype)
    big = jnp.einsum("yYAO,xXBP,yxio->YXABiOPo", Ty, Tx, w)
    fy_in, fy_out = Ty.shape[2], Ty.shape[3]
    fx_in, fx_out = Tx.shape[2], Tx.shape[3]
    return big.reshape(Ty.shape[1], Tx.shape[1], fy_in * fx_in * cin,
                       fy_out * fx_out * cout)


def _depth_taps_conv(d_in: int, k: int, stride: int, pad: int) -> np.ndarray:
    """S[q, d_in, d_out] = 1 iff d_in == stride*d_out + q - pad (zero pad)."""
    d_out = (d_in + 2 * pad - k) // stride + 1
    S = np.zeros((k, d_in, d_out), np.float32)
    for q in range(k):
        for o in range(d_out):
            i = stride * o + q - pad
            if 0 <= i < d_in:
                S[q, i, o] = 1.0
    return S


def _depth_taps_convT(d_in: int, k: int, stride: int, pad: int,
                      output_padding: int) -> np.ndarray:
    """torch ConvTranspose depth taps: out[o] += w[q]*x[i], o = stride*i-p+q."""
    d_out = (d_in - 1) * stride - 2 * pad + k + output_padding
    S = np.zeros((k, d_in, d_out), np.float32)
    for q in range(k):
        for i in range(d_in):
            o = stride * i - pad + q
            if 0 <= o < d_out:
                S[q, i, o] = 1.0
    return S


def _fold_kernel(w, S):
    """(kd, kh, kw, Cin, Cout) + S[kd, Din, Dout] ->
    (kh, kw, Din*Cin, Dout*Cout) with folded channel index d*C + c."""
    kd, kh, kw, cin, cout = w.shape
    _, din, dout = S.shape
    big = jnp.einsum("zab,zyxio->yxaibo", jnp.asarray(S, w.dtype), w)
    return big.reshape(kh, kw, din * cin, dout * cout)


def _fold_kernel_T(w, S):
    """ConvTranspose weight (kd, kh, kw, Cout, Cin) + transpose-taps S ->
    spatially-flipped (kh, kw, Din*Cin, Dout*Cout) ready for the
    lhs-dilated direct conv."""
    big = jnp.einsum("zab,zyxoi->yxaibo", jnp.asarray(S, w.dtype), w)
    kh, kw = w.shape[1:3]
    din, dout = S.shape[1:]
    big = big.reshape(kh, kw, din * w.shape[4], dout * w.shape[3])
    return jnp.flip(big, axis=(0, 1))


class ParamHolder(nn.Module):
    """Declares a single 'kernel' param — used to keep the flax param path
    identical (e.g. 'Conv_0/kernel') when a layer's math is executed by
    hand instead of by nn.Conv."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kaiming_uniform_conv, self.shape)


class ConvParams(nn.Module):
    """Declares 'kernel' (+ optional 'bias') params with nn.Conv's paths and
    inits — for hand-executed convs (e.g. the space-folded FPN) whose param
    tree must match the ``nn.Conv`` layers they replace."""
    shape: Tuple[int, ...]          # fine kernel shape (*k, Cin, Cout)
    bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_kaiming_uniform_conv, self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
             if self.bias else None)
        return k, b


def torch_kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch default conv init: kaiming_uniform(a=sqrt(5)) on the weight.

    shape = (*kernel_spatial, Cin, Cout); fan_in = Cin * prod(kernel_spatial).
    """
    fan_in = shape[-2]
    for s in shape[:-2]:
        fan_in *= s
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BatchStatNorm(nn.Module):
    """BatchNorm that always uses current-batch statistics (see module doc).

    With ``d`` set, the input is a depth-folded [..., D*C] tensor (see
    ``Folded``); stats and affine params are per original channel C, reducing
    over depth too — identical math to BN on the [D, H, W, C] volume.
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, d: int = None):
        if d is not None:
            c = x.shape[-1] // d
            xs = x.reshape(x.shape[:-1] + (d, c))
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axis=axes, keepdims=True)
            var = jnp.var(xs, axis=axes, keepdims=True)
            y = (xs - mean) * jax.lax.rsqrt(var + self.eps)
            return (y * scale + bias).reshape(x.shape)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)  # biased, like torch train
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class ConvBNReLU(nn.Module):
    """Conv + optional BN + optional ReLU (reference ``Conv2d``/``Conv3d``,
    ``mvs_models.py:21-56,110-146``).  Spatial rank inferred from input."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = None  # default: bias iff no bn (torch `bias=(not bn)`)
    dtype: object = None   # conv compute dtype (bf16 on TPU); BN stats f32

    @nn.compact
    def __call__(self, x):
        if isinstance(x, Folded):
            return self._call_folded(x)
        if isinstance(x, SpaceFolded):
            return self._call_space_folded(x)
        ndim = x.ndim - 1  # spatial rank (no batch dim; channel-last)
        k = (self.kernel,) * ndim
        pad = [(self.padding, self.padding)] * ndim
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        y = nn.Conv(self.features, k, strides=(self.stride,) * ndim,
                    padding=pad, use_bias=bias, dtype=self.dtype,
                    kernel_init=torch_kaiming_uniform_conv)(x[None])[0]
        if self.use_bn:
            y = BatchStatNorm()(y.astype(jnp.float32))
        if self.use_relu:
            y = jax.nn.relu(y)
        return y

    def _call_space_folded(self, sf: SpaceFolded) -> SpaceFolded:
        """Space-folded 2D conv (see ``SpaceFolded``): one coarse conv whose
        channel matrix carries the fold taps.  Exact same math + param tree
        as the 2D ``nn.Conv`` path."""
        k, s, p = self.kernel, self.stride, self.padding
        cin = sf.channels
        w = ParamHolder(((k,) * 2) + (cin, self.features), name="Conv_0")()
        T, pf = _space_taps(sf.f, k, s, p)
        big = _space_fold_kernel(w, T, T)
        f_out = sf.f // s
        x = sf.x
        if self.dtype is not None:
            x = x.astype(self.dtype)
            big = big.astype(self.dtype)
        kf = T.shape[1]
        y = jax.lax.conv_general_dilated(
            x[None], big, window_strides=(1, 1),
            padding=[(pf, kf - 1 - pf)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        assert not bias, "space-folded conv path only supports bias-free convs"
        if self.use_bn:
            y = BatchStatNorm()(y.astype(jnp.float32), d=f_out * f_out)
        if self.use_relu:
            y = jax.nn.relu(y)
        return SpaceFolded(y, f_out)

    def _call_folded(self, f: Folded) -> Folded:
        """Depth-folded 3D conv (see ``Folded``): one 2D conv whose channel
        matrix carries the depth taps.  Exact same math + param tree as the
        3D ``nn.Conv`` path."""
        k, s, p = self.kernel, self.stride, self.padding
        cin = f.channels
        w = ParamHolder(((k,) * 3) + (cin, self.features), name="Conv_0")()
        S = _depth_taps_conv(f.d, k, s, p)
        big = _fold_kernel(w, S)
        d_out = S.shape[2]
        x = f.x
        if self.dtype is not None:
            x = x.astype(self.dtype)
            big = big.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x[None], big, window_strides=(s, s), padding=[(p, p)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        assert not bias, "folded conv path only supports bias-free convs"
        if self.use_bn:
            y = BatchStatNorm()(y.astype(jnp.float32), d=d_out)
        if self.use_relu:
            y = jax.nn.relu(y)
        return Folded(y, d_out)


class ConvTransposeBNReLU(nn.Module):
    """torch-exact ConvTranspose + BN + ReLU (reference ``Deconv2d``/
    ``Deconv3d``, ``mvs_models.py:64-102,154-195``).

    Implemented as ``lax.conv_general_dilated`` with lhs_dilation=stride and
    padding (k-1-p, k-1-p+output_padding), which is the standard equivalence
    to torch's ConvTranspose (weight layout (*k, Cout, Cin), spatially
    flipped at call time).
    """
    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bn: bool = True
    use_relu: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if isinstance(x, Folded):
            return self._call_folded(x)
        ndim = x.ndim - 1
        cin = x.shape[-1]
        k = self.kernel
        # fan_in for torch ConvTranspose default init = Cout * prod(k)
        # (torch stores weight (Cin, Cout, *k) and uses weight.size(1..) );
        # but pretrained weights dominate — keep conv-style init.
        w = self.param("kernel", torch_kaiming_uniform_conv,
                       ((k,) * ndim) + (self.features, cin))
        w_flip = w
        for ax in range(ndim):
            w_flip = jnp.flip(w_flip, axis=ax)
        # (*k, Cout, Cin) -> (*k, Cin, Cout) for 'IO' kernel spec
        w_flip = jnp.swapaxes(w_flip, -1, -2)
        pad_lo = k - 1 - self.padding
        pad_hi = k - 1 - self.padding + self.output_padding
        dn_spatial = "DHW"[-ndim:] if ndim <= 3 else None
        dn = ("N" + dn_spatial + "C", dn_spatial + "IO", "N" + dn_spatial + "C")
        if self.dtype is not None:
            # compute fully in the low-precision dtype (cast back after) —
            # preferred_element_type=f32 breaks the conv VJP (f32 cotangent
            # vs bf16 operands)
            x = x.astype(self.dtype)
            w_flip = w_flip.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x[None], w_flip, window_strides=(1,) * ndim,
            padding=[(pad_lo, pad_hi)] * ndim,
            lhs_dilation=(self.stride,) * ndim,
            dimension_numbers=dn)[0]
        if self.use_bn:
            y = BatchStatNorm()(y.astype(jnp.float32))
        else:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        if self.use_relu:
            y = jax.nn.relu(y)
        return y

    def _call_folded(self, f: Folded) -> Folded:
        """Depth-folded 3D transposed conv: depth upsampling moves into the
        channel matrix (``_depth_taps_convT``), the H/W part stays the
        standard lhs-dilated direct conv with spatially flipped kernel."""
        assert self.use_bn, "folded deconv path only supports BN variants"
        k, s, p, op = (self.kernel, self.stride, self.padding,
                       self.output_padding)
        cin = f.channels
        w = self.param("kernel", torch_kaiming_uniform_conv,
                       ((k,) * 3) + (self.features, cin))
        S = _depth_taps_convT(f.d, k, s, p, op)
        big = _fold_kernel_T(w, S)
        d_out = S.shape[2]
        x = f.x
        if self.dtype is not None:
            x = x.astype(self.dtype)
            big = big.astype(self.dtype)
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x[None], big, window_strides=(1, 1),
            padding=[(pad_lo, pad_hi)] * 2, lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        y = BatchStatNorm()(y.astype(jnp.float32), d=d_out)
        if self.use_relu:
            y = jax.nn.relu(y)
        return Folded(y, d_out)


def torch_linear_default_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(±1/sqrt(fan_in)).  shape = (in, out)."""
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_default_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    """torch ``kaiming_normal_`` (fan_in, relu gain) on (in, out) kernels —
    reference ``weights_init`` (``network/models.py:13-17``)."""
    std = jnp.sqrt(2.0 / shape[0])
    return std * jax.random.normal(key, shape, dtype)


class TorchDense(nn.Module):
    """nn.Dense with torch Linear init conventions.

    kaiming=True  -> kaiming_normal weights, zero bias (reference
                     ``weights_init``, applied to most UC-NeRF layers).
    kaiming=False -> torch default U(±1/sqrt(fan_in)) for both (the layers
                     the reference forgot to apply ``weights_init`` to:
                     ``pts_bias_confidence``, ``alpha_linear_1``).
    """
    features: int
    kaiming: bool = True
    dtype: object = None   # compute dtype (bf16 on TPU); params stay f32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.kaiming:
            kinit = kaiming_normal_init
            binit = nn.initializers.zeros
        else:
            kinit = torch_linear_default_init
            binit = torch_linear_default_bias_init(fan_in)
        return nn.Dense(self.features, kernel_init=kinit, bias_init=binit,
                        dtype=self.dtype)(x)
