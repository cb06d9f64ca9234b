"""Constant-Q transform via direct log-spaced complex convolution.

The reference's CQT discriminator wraps nnAudio's CQT2010v2
(Models/models.py:404-413, output_format="Complex"). nnAudio is not
available here; this is a direct-convolution CQT (the CQT1992v2
formulation): one complex windowed-sinusoid kernel per bin, log-spaced
centre frequencies, convolved at the hop. Numerically equivalent up to
the early-downsampling approximation nnAudio's 2010 variant makes for
speed; on TPU one strided conv over a (max_len, 2*n_bins) kernel bank
is already MXU-shaped, so the speed trick is unnecessary.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _cqt_kernels_np(sr: int, n_bins: int, bins_per_octave: int, fmin: float,
                    max_kernel_len: int = 16384):
    """-> (kernel_len, 2*n_bins) real kernel bank [cos | -sin], float32.

    Kernel lengths are capped at max_kernel_len (full-Q low-frequency
    kernels would be ~64k samples and dominate HBM; truncation costs a
    little resolution in the lowest octave — nnAudio's 2010 variant
    makes a comparable early-downsampling approximation).
    """
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.minimum(np.ceil(Q * sr / freqs).astype(int), max_kernel_len)
    max_len = int(2 ** np.ceil(np.log2(lengths.max())))
    bank = np.zeros((max_len, 2 * n_bins), dtype=np.float64)
    for k, (f, L) in enumerate(zip(freqs, lengths)):
        L = min(L, max_len)
        start = (max_len - L) // 2
        n = np.arange(L)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * (n + 0.5) / L)
        phase = 2.0 * np.pi * f / sr * (n - L / 2.0)
        norm = 1.0 / L
        bank[start : start + L, k] = win * np.cos(phase) * norm
        bank[start : start + L, n_bins + k] = -win * np.sin(phase) * norm
    return bank.astype(np.float32), max_len


def cqt(
    x: jnp.ndarray,
    sr: int,
    hop_length: int,
    n_bins: int,
    bins_per_octave: int,
    fmin: float = 32.70319566257483,
):
    """x (B, L) -> (real, imag), each (B, n_bins, T). Constant pad."""
    bank, klen = _cqt_kernels_np(sr, n_bins, bins_per_octave, fmin)
    pad = klen // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))[..., None]  # (B, L', 1)
    out = jax.lax.conv_general_dilated(
        # conv requires matching dtypes (bf16 input under compute_dtype)
        xp, jnp.asarray(bank).astype(x.dtype)[:, None, :],
        window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # (B, T, 2*n_bins)
    out = jnp.swapaxes(out, -1, -2)
    return out[:, :n_bins, :], out[:, n_bins:, :]
