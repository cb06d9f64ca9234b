"""Windowed-sinc 2x resampling (polyphase), as used by HD-DEMUCS.

Re-derived from reference Models/hddemucas.py:22-82 (Smith & Gossett
sinc interpolation, zeros=56, odd-sample Hann window): upsample2
interleaves the input with a sinc-interpolated mid-point signal;
downsample2 averages even samples with sinc-filtered odd samples.
Filters are host-precomputed constants; the convs are 1-D valid
convolutions XLA maps to the MXU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sinc_kernel_np(zeros: int = 56) -> np.ndarray:
    n = 4 * zeros + 1
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))  # symmetric hann
    winodd = win[1::2]
    t = np.linspace(-zeros + 0.5, zeros - 0.5, 2 * zeros) * math.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / t) * winodd
    return kernel.astype(np.float32)


def _conv1d_single(x: jnp.ndarray, kernel: np.ndarray, padding: int) -> jnp.ndarray:
    """x (..., L) * kernel (K,) with symmetric zero padding -> (..., L + 2p - K + 1)."""
    lead = x.shape[:-1]
    xr = x.reshape(-1, x.shape[-1], 1)
    # conv requires matching dtypes; follow the input so bf16
    # activations (compute_dtype) don't crash the trace
    k = jnp.asarray(kernel).astype(x.dtype)[:, None, None]
    y = jax.lax.conv_general_dilated(
        xr, k, window_strides=(1,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y.reshape(*lead, -1)


def upsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """(..., L) -> (..., 2L) sinc upsampling (hddemucas.py:40-52)."""
    kernel = _sinc_kernel_np(zeros)
    out = _conv1d_single(x, kernel, padding=zeros)[..., 1:]
    y = jnp.stack([x, out], axis=-1)
    return y.reshape(*x.shape[:-1], -1)


def downsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """(..., L) -> (..., ceil(L/2)) sinc downsampling (hddemucas.py:66-82)."""
    if x.shape[-1] % 2 != 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    xeven = x[..., ::2]
    xodd = x[..., 1::2]
    kernel = _sinc_kernel_np(zeros)
    out = xeven + _conv1d_single(xodd, kernel, padding=zeros)[..., :-1]
    return out * 0.5
