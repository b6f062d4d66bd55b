"""NeRF frequency positional encoding.

Matches the reference's *vectorized* embedding path (``Embedder.embed``,
reference ``network/models.py:50-54``): output layout is
``[x, sin(x*f_0)..sin(x*f_{K-1}), cos(x*f_0)..cos(x*f_{K-1})]`` with the
frequency axis major inside each sin/cos block (``scaled[..., k*d + j] =
x_j * f_k``).  Frequencies are log-sampled ``2**linspace(0, multires-1,
multires)`` (``network/models.py:37``).

The reference precomputes freq_bands on `.cuda()` (``network/models.py:40``),
breaking CPU runs — here they are plain constants traced into the jaxpr.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def positional_encoding(x, multires: int):
    """x [..., d] -> [..., d*(1+2*multires)]."""
    if multires <= 0:
        return x
    freqs = jnp.asarray(2.0 ** np.linspace(0.0, multires - 1, multires),
                        dtype=x.dtype)
    # scaled[..., k, j] = x_j * f_k  -> flatten freq-major
    scaled = x[..., None, :] * freqs[:, None]
    scaled = scaled.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
