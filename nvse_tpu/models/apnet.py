"""APNet family: parallel amplitude + phase spectrum predictors.

Three T-F generators re-derived from the reference:
  * APNet  (Models/apnet.py:90-157)  — HiFiGAN-style weight-norm MRF
    ResBlock trunks per branch.
  * APNet2 (Models/apnet2.py:69-188) — ConvNeXt-v2 trunks (depthwise
    conv k7 + LN + MLP 512->1536 + GRN), 8 blocks per branch,
    normal(0.02) init, no weight norm.
  * FreeV  (Models/freeV.py:69-187)  — APNet2 phase branch, but the
    amplitude branch consumes the log pseudo-inverse mel spectrum
    directly through a single ConvNeXt block at dim 513 ("free lunch").

All return (logamp, pha, rea, imag, wav) with wav via iSTFT.
ConvNeXt blocks run natively channels-last (B, T, C): the reference's
transpose-dance around torch Conv1d disappears — depthwise conv, LN,
and the MLP all act on the same layout.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import hann_window, inverse_mel, istft_ri
from .hifigan import ResBlock1
from .layers import Conv1d, LayerNorm, Linear, get_padding, leaky_relu, normal_init


class GRN(nn.Module):
    """Global response norm over time (apnet2.py:13-24).

    Note: on (B, T, C) the reference takes the L2 norm over dim=1 (time)
    and normalises by its mean over channels — replicated exactly.

    The norm's backward needs the subgradient-at-zero guard: a hidden
    unit whose GELU output underflows to exact zero for every frame
    (x ≲ -14 makes erf round to -1 in f32) gives sum(x²) = 0, where
    d sqrt/dx = x/sqrt(·) is 0/0 = NaN. torch.norm defines this
    subgradient as 0, so the reference trains through dead channels;
    the double-where below replicates that (this exact event took the
    FreeV GAN run down at step ~5.4k — diagnosed via
    scripts/nan_hunt.py + nan_dissect.py).
    """

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        sq = jnp.sum(x * x, axis=1, keepdims=True)                  # (B, 1, C)
        gx = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        gx = jnp.where(sq > 0, gx, 0.0)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtBlock(nn.Module):
    """Depthwise k7 conv + LN + MLP(dim->mid->dim) + GRN (apnet2.py:27-66)."""

    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # normal(0.02) weights / zero bias: APNet2._init_weights applies
        # trunc_normal_(std=0.02) to every Conv1d and Linear
        # (apnet2.py:146-149) — with torch's default ABSOLUTE cutoffs
        # a=-2, b=2 (= +/-100 sigma at std 0.02), so it is numerically a
        # plain normal(0.02)
        ni, zi = normal_init(0.02), nn.initializers.zeros
        residual = x
        x = Conv1d(self.dim, self.dim, 7, padding=3, groups=self.dim,
                   kernel_init=ni, bias_init=zi)(x)
        x = LayerNorm(self.dim, eps=1e-6)(x)
        x = Linear(self.dim, self.intermediate_dim, kernel_init=ni, bias_init=zi)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim)(x)
        x = Linear(self.intermediate_dim, self.dim, kernel_init=ni, bias_init=zi)(x)
        return residual + x


def _tf_outputs(logamp, pha_R, pha_I, n_fft, hop_size, win_size):
    """Recombine exp(logamp)·e^{j·atan2(I,R)} and synthesise (apnet.py:145-155)."""
    pha = jnp.arctan2(pha_I, pha_R)
    amp = jnp.exp(logamp)
    rea = amp * jnp.cos(pha)
    imag = amp * jnp.sin(pha)
    wav = istft_ri(rea, imag, n_fft, hop_size, win_size, window=hann_window(win_size))
    return logamp, pha, rea, imag, wav


class APNet(nn.Module):
    """mel (B, M, T) -> (logamp, pha, rea, imag, wav). apnet.py:90-157."""

    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    ASP_channel: int = 512
    ASP_input_conv_kernel_size: int = 7
    ASP_output_conv_kernel_size: int = 7
    ASP_resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    ASP_resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    PSP_channel: int = 512
    PSP_input_conv_kernel_size: int = 7
    PSP_output_R_conv_kernel_size: int = 7
    PSP_output_I_conv_kernel_size: int = 7
    PSP_resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    PSP_resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3

    @classmethod
    def from_config(cls, h) -> "APNet":
        return cls(
            num_mels=h.num_mels, n_fft=h.n_fft, hop_size=h.hop_size, win_size=h.win_size,
            ASP_channel=h.ASP_channel,
            ASP_input_conv_kernel_size=h.ASP_input_conv_kernel_size,
            ASP_output_conv_kernel_size=h.ASP_output_conv_kernel_size,
            ASP_resblock_kernel_sizes=tuple(h.ASP_resblock_kernel_sizes),
            ASP_resblock_dilation_sizes=tuple(tuple(d) for d in h.ASP_resblock_dilation_sizes),
            PSP_channel=h.PSP_channel,
            PSP_input_conv_kernel_size=h.PSP_input_conv_kernel_size,
            PSP_output_R_conv_kernel_size=h.PSP_output_R_conv_kernel_size,
            PSP_output_I_conv_kernel_size=h.PSP_output_I_conv_kernel_size,
            PSP_resblock_kernel_sizes=tuple(h.PSP_resblock_kernel_sizes),
            PSP_resblock_dilation_sizes=tuple(tuple(d) for d in h.PSP_resblock_dilation_sizes),
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        x = jnp.swapaxes(mel, -1, -2)  # (B, T, M)
        F_bins = self.n_fft // 2 + 1

        def branch(x, ch, k_in, ks, ds):
            y = Conv1d(self.num_mels, ch, k_in, padding=get_padding(k_in),
                       use_weight_norm=True)(x)
            acc = None
            for k, d in zip(ks, ds):
                out = ResBlock1(ch, k, tuple(d))(y)
                acc = out if acc is None else acc + out
            y = acc / len(ks)
            return leaky_relu(y, 0.01)  # F.leaky_relu default (apnet.py:131,141)

        a = branch(x, self.ASP_channel, self.ASP_input_conv_kernel_size,
                   self.ASP_resblock_kernel_sizes, self.ASP_resblock_dilation_sizes)
        logamp = Conv1d(self.ASP_channel, F_bins, self.ASP_output_conv_kernel_size,
                        padding=get_padding(self.ASP_output_conv_kernel_size),
                        use_weight_norm=True)(a)

        p = branch(x, self.PSP_channel, self.PSP_input_conv_kernel_size,
                   self.PSP_resblock_kernel_sizes, self.PSP_resblock_dilation_sizes)
        R = Conv1d(self.PSP_channel, F_bins, self.PSP_output_R_conv_kernel_size,
                   padding=get_padding(self.PSP_output_R_conv_kernel_size),
                   use_weight_norm=True)(p)
        I = Conv1d(self.PSP_channel, F_bins, self.PSP_output_I_conv_kernel_size,
                   padding=get_padding(self.PSP_output_I_conv_kernel_size),
                   use_weight_norm=True)(p)

        return _tf_outputs(
            jnp.swapaxes(logamp, -1, -2), jnp.swapaxes(R, -1, -2),
            jnp.swapaxes(I, -1, -2), self.n_fft, self.hop_size, self.win_size,
        )


class APNet2(nn.Module):
    """APNet with ConvNeXt-v2 trunks (apnet2.py:69-188)."""

    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    ASP_channel: int = 512
    ASP_input_conv_kernel_size: int = 7
    ASP_output_conv_kernel_size: int = 7
    PSP_channel: int = 512
    PSP_input_conv_kernel_size: int = 7
    PSP_output_R_conv_kernel_size: int = 7
    PSP_output_I_conv_kernel_size: int = 7
    dim: int = 512
    num_layers: int = 8
    intermediate_dim: int = 1536

    @classmethod
    def from_config(cls, h) -> "APNet2":
        return cls(
            num_mels=h.num_mels, n_fft=h.n_fft, hop_size=h.hop_size, win_size=h.win_size,
            ASP_channel=h.ASP_channel,
            ASP_input_conv_kernel_size=h.ASP_input_conv_kernel_size,
            ASP_output_conv_kernel_size=h.ASP_output_conv_kernel_size,
            PSP_channel=h.PSP_channel,
            PSP_input_conv_kernel_size=h.PSP_input_conv_kernel_size,
            PSP_output_R_conv_kernel_size=h.PSP_output_R_conv_kernel_size,
            PSP_output_I_conv_kernel_size=h.PSP_output_I_conv_kernel_size,
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        x = jnp.swapaxes(mel, -1, -2)
        F_bins = self.n_fft // 2 + 1
        ni = normal_init(0.02)

        a = Conv1d(self.num_mels, self.ASP_channel, self.ASP_input_conv_kernel_size,
                   padding=get_padding(self.ASP_input_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(x)
        a = LayerNorm(self.dim, eps=1e-6)(a)
        for _ in range(self.num_layers):
            a = ConvNeXtBlock(self.dim, self.intermediate_dim)(a)
        a = LayerNorm(self.dim, eps=1e-6)(a)
        logamp = Conv1d(self.ASP_channel, F_bins, self.ASP_output_conv_kernel_size,
                        padding=get_padding(self.ASP_output_conv_kernel_size),
                        kernel_init=ni, bias_init=nn.initializers.zeros)(a)

        p = Conv1d(self.num_mels, self.PSP_channel, self.PSP_input_conv_kernel_size,
                   padding=get_padding(self.PSP_input_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(x)
        p = LayerNorm(self.dim, eps=1e-6)(p)
        for _ in range(self.num_layers):
            p = ConvNeXtBlock(self.dim, self.intermediate_dim)(p)
        p = LayerNorm(self.dim, eps=1e-6)(p)
        R = Conv1d(512, F_bins, self.PSP_output_R_conv_kernel_size,
                   padding=get_padding(self.PSP_output_R_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(p)
        I = Conv1d(512, F_bins, self.PSP_output_I_conv_kernel_size,
                   padding=get_padding(self.PSP_output_I_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(p)

        return _tf_outputs(
            jnp.swapaxes(logamp, -1, -2), jnp.swapaxes(R, -1, -2),
            jnp.swapaxes(I, -1, -2), self.n_fft, self.hop_size, self.win_size,
        )


class FreeV(nn.Module):
    """APNet2 phase branch + pseudo-inverse-mel amplitude seed (freeV.py:69-187)."""

    sampling_rate: int = 22050
    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0
    ASP_channel: int = 513
    PSP_channel: int = 512
    PSP_input_conv_kernel_size: int = 7
    PSP_output_R_conv_kernel_size: int = 7
    PSP_output_I_conv_kernel_size: int = 7
    dim: int = 512
    num_layers: int = 8
    intermediate_dim: int = 1536

    @classmethod
    def from_config(cls, h) -> "FreeV":
        return cls(
            sampling_rate=h.sampling_rate, num_mels=h.num_mels, n_fft=h.n_fft,
            hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax,
            ASP_channel=h.ASP_channel, PSP_channel=h.PSP_channel,
            PSP_input_conv_kernel_size=h.PSP_input_conv_kernel_size,
            PSP_output_R_conv_kernel_size=h.PSP_output_R_conv_kernel_size,
            PSP_output_I_conv_kernel_size=h.PSP_output_I_conv_kernel_size,
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray, inv_mel_amp: jnp.ndarray | None = None):
        if inv_mel_amp is None:
            inv_amp = inverse_mel(mel, self.n_fft, self.num_mels, self.sampling_rate,
                                  self.hop_size, self.win_size, self.fmin, self.fmax)
            inv_amp = jnp.clip(jnp.abs(inv_amp), 1e-5, None)
        else:
            inv_amp = inv_mel_amp
        F_bins = self.n_fft // 2 + 1
        ni = normal_init(0.02)

        # amplitude branch: one ConvNeXt block straight on the log
        # pseudo-inverse spectrum (freeV.py:156-158); (B, F, T)->(B, T, F)
        a = jnp.swapaxes(jnp.log(inv_amp), -1, -2)
        a = ConvNeXtBlock(self.ASP_channel, self.intermediate_dim)(a)
        logamp = jnp.swapaxes(a, -1, -2)

        x = jnp.swapaxes(mel, -1, -2)
        p = Conv1d(self.num_mels, self.PSP_channel, self.PSP_input_conv_kernel_size,
                   padding=get_padding(self.PSP_input_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(x)
        p = LayerNorm(self.dim, eps=1e-6)(p)
        for _ in range(self.num_layers):
            p = ConvNeXtBlock(self.dim, self.intermediate_dim)(p)
        p = LayerNorm(self.dim, eps=1e-6)(p)
        R = Conv1d(512, F_bins, self.PSP_output_R_conv_kernel_size,
                   padding=get_padding(self.PSP_output_R_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(p)
        I = Conv1d(512, F_bins, self.PSP_output_I_conv_kernel_size,
                   padding=get_padding(self.PSP_output_I_conv_kernel_size), kernel_init=ni, bias_init=nn.initializers.zeros)(p)

        return _tf_outputs(
            logamp, jnp.swapaxes(R, -1, -2), jnp.swapaxes(I, -1, -2),
            self.n_fft, self.hop_size, self.win_size,
        )
