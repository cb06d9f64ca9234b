"""Spectral losses: amplitude, anti-wrapped phase, STFT consistency, mel.

Numerics from reference Models/models.py:116-141 and :595-669. The
reference computes group-delay / time-differences with tri-diagonal
difference matmuls; the same linear maps are expressed here as shifted
subtractions (cheaper, identical values including the boundary column
the matrices produce).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import mel_spectrogram

TWO_PI = 2.0 * np.pi


def anti_wrapping_function(x: jnp.ndarray) -> jnp.ndarray:
    """|x - round(x / 2π) * 2π| (Models/models.py:595-596)."""
    return jnp.abs(x - jnp.round(x / TWO_PI) * TWO_PI)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Mean of x (B, F, T); with a (T,) 0/1 frame mask, only masked time
    columns contribute (full-utterance validation on padded buckets)."""
    if mask is None:
        return jnp.mean(x)
    m = mask.reshape((1,) * (x.ndim - 1) + (-1,))
    denom = (x.size // x.shape[-1]) * jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * m) / denom


def amplitude_loss(log_amplitude_r: jnp.ndarray, log_amplitude_g: jnp.ndarray,
                   mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """MSE on log-amplitude spectra (Models/models.py:599-604)."""
    return _masked_mean((log_amplitude_r - log_amplitude_g) ** 2, mask)


def _gd(phase: jnp.ndarray) -> jnp.ndarray:
    """Difference along frequency, replicating the GD matrix product.

    The reference's GD_matrix (Models/models.py:117-125) maps
    out[..., f] = phase[..., f-1] - phase[..., f] for f>=1 and
    out[..., 0] = -phase[..., 0]; phase is (B, F, T).
    """
    return jnp.concatenate([-phase[:, :1, :], phase[:, :-1, :] - phase[:, 1:, :]], axis=1)


def _ptd(phase: jnp.ndarray) -> jnp.ndarray:
    """Difference along time (PTD matrix, Models/models.py:127-135)."""
    return jnp.concatenate([-phase[:, :, :1], phase[:, :, :-1] - phase[:, :, 1:]], axis=2)


def phase_loss(phase_r: jnp.ndarray, phase_g: jnp.ndarray,
               mask: jnp.ndarray | None = None):
    """(IP, GD, PTD) anti-wrapped phase losses (Models/models.py:116-141).

    With a frame mask, time columns outside it are excluded; the PTD
    time-difference at a masked column t uses φ[t-1]−φ[t], and both
    operands are valid whenever column t is (masks are prefixes).
    """
    ip = _masked_mean(anti_wrapping_function(phase_r - phase_g), mask)
    gd = _masked_mean(anti_wrapping_function(_gd(phase_r) - _gd(phase_g)), mask)
    ptd = _masked_mean(anti_wrapping_function(_ptd(phase_r) - _ptd(phase_g)), mask)
    return ip, gd, ptd


def stft_consistency_loss(rea_r, rea_g, imag_r, imag_g,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean squared complex-STFT distance (Models/models.py:664-669)."""
    return _masked_mean((rea_r - rea_g) ** 2 + (imag_r - imag_g) ** 2, mask)


def mel_loss(
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
) -> jnp.ndarray:
    """L1 between mel spectrograms of two waveforms."""
    m1 = mel_spectrogram(y, n_fft, num_mels, sampling_rate, hop_size, win_size, fmin, fmax)
    m2 = mel_spectrogram(y_hat, n_fft, num_mels, sampling_rate, hop_size, win_size, fmin, fmax)
    return jnp.mean(jnp.abs(m1 - m2))


_MRML_RESOLUTIONS = (
    (32, 8, 32, 5),
    (64, 16, 64, 10),
    (128, 32, 128, 20),
    (256, 64, 256, 40),
    (512, 128, 512, 80),
    (1024, 256, 1024, 160),
    (2048, 512, 2048, 320),
)


def multi_resolution_mel_loss(
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    sampling_rate: int = 24000,
    resolutions=_MRML_RESOLUTIONS,
) -> jnp.ndarray:
    """7-resolution mel L1 (Models/models.py:145-184)."""
    total = 0.0
    for n_fft, hop, win, mels in resolutions:
        total += mel_loss(y, y_hat, n_fft, mels, sampling_rate, hop, win, 0, sampling_rate / 2)
    return total / len(resolutions)
