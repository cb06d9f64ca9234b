"""Discriminators: multi-period, multi-scale, multi-resolution.

Architectures re-derived from reference Models/models.py (MPD :15-113,
MSD :187-246, MRD :250-379). All operate on raw waveforms (B, L) and
return (logits, feature-map list) per sub-discriminator; wrappers run
real and generated waves through every sub-discriminator.

TPU notes: the period reshape is a pure reshape (reflect-pad to a
multiple of the period first); spectrograms for MRD use the matmul-DFT
stft so the whole discriminator stack is conv/matmul work on the MXU.
Internally NHWC; waveform conv stacks are NWC.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import stft_ri
from .layers import LRELU_SLOPE, Conv1d, Conv2d, SNConv1d, get_padding, leaky_relu


class DiscriminatorP(nn.Module):
    """Period discriminator (Models/models.py:15-84).

    Reshapes the wave into (time/period, period) and applies 5 strided
    (k,1) Conv2d + post conv, all weight-normalised. Note the reference
    hard-codes get_padding(5,1)=2 for every conv regardless of kernel.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        fmap = []
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        channels = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for cin, cout in channels:
            x = Conv2d(
                cin, cout, (self.kernel_size, 1), stride=(self.stride, 1),
                padding=(get_padding(5, 1), 0), use_weight_norm=True,
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2d(1024, 1024, (self.kernel_size, 1), stride=(1, 1),
                   padding=(2, 0), use_weight_norm=True)(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2d(1024, 1, (3, 1), padding=(1, 0), use_weight_norm=True)(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """MPD over periods h.mpd_reshapes (Models/models.py:87-113)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(period=p)
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator (Models/models.py:187-214).

    7 grouped Conv1d stages + post conv; the first MSD instance uses
    spectral norm, the rest weight norm (Models/models.py:220-224).
    """

    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = True):
        fmap = []
        x = x[..., None]  # (B, L, 1)
        spec = [
            (1, 128, 15, 1, 1, 7),
            (128, 128, 41, 2, 4, 20),
            (128, 256, 41, 2, 16, 20),
            (256, 512, 41, 4, 16, 20),
            (512, 1024, 41, 4, 16, 20),
            (1024, 1024, 41, 1, 16, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        for cin, cout, k, s, g, p in spec:
            if self.use_spectral_norm:
                x = SNConv1d(cin, cout, k, stride=s, groups=g, padding=p)(x, update_stats)
            else:
                x = Conv1d(cin, cout, k, stride=s, groups=g, padding=p, use_weight_norm=True)(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if self.use_spectral_norm:
            x = SNConv1d(1024, 1, 3, stride=1, padding=1)(x, update_stats)
        else:
            x = Conv1d(1024, 1, 3, stride=1, padding=1, use_weight_norm=True)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d_4_2_pad2(x: jnp.ndarray) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) with count_include_pad=True on (B, L)."""
    xp = jnp.pad(x, ((0, 0), (2, 2)))
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 4), (1, 2), "VALID")
    return s / 4.0


class MultiScaleDiscriminator(nn.Module):
    """MSD: raw + two 2x avg-pooled scales (Models/models.py:217-246)."""

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, update_stats: bool = True):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = _avg_pool1d_4_2_pad2(y)
                y_hat = _avg_pool1d_4_2_pad2(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0))
            y_d_r, fmap_r = d(y, update_stats)
            y_d_g, fmap_g = d(y_hat, update_stats)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorR(nn.Module):
    """Resolution discriminator on |STFT| (Models/models.py:283-379).

    Rectangular-window magnitude spectrogram treated as a 1-channel
    image (freq, time), 5 weight-norm Conv2d + post conv.
    """

    resolution: tuple[int, int, int]  # (n_fft, hop, win)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        fmap = []
        n_fft, hop, win = self.resolution
        re, im = stft_ri(x, n_fft, hop, win, window=None, center=True)
        mag = jnp.sqrt(re * re + im * im + 1e-12)
        z = mag[..., None]  # (B, F, T, 1)

        convspec = [
            (1, 64, (7, 5), (2, 2), (3, 2)),
            (64, 64, (5, 3), (2, 1), (2, 1)),
            (64, 64, (5, 3), (2, 2), (2, 1)),
            (64, 64, (3, 3), (2, 1), (1, 1)),
            (64, 64, (3, 3), (2, 2), (1, 1)),
        ]
        for cin, cout, k, s, p in convspec:
            z = Conv2d(cin, cout, k, stride=s, padding=p, use_weight_norm=True)(z)
            z = leaky_relu(z, LRELU_SLOPE)
            fmap.append(z)
        z = Conv2d(64, 1, (3, 3), padding=(1, 1), use_weight_norm=True)(z)
        fmap.append(z)
        return z.reshape(z.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """MRD at (1024/256), (2048/512), (512/128) (Models/models.py:250-280)."""

    resolutions: Sequence[tuple[int, int, int]] = (
        (1024, 256, 1024),
        (2048, 512, 2048),
        (512, 128, 512),
    )

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for r in self.resolutions:
            d = DiscriminatorR(resolution=tuple(r))
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
