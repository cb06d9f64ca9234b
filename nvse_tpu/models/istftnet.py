"""iSTFTNet generator: MRF trunk upsamples x64, tiny iSTFT head does x4.

Re-derived from reference Models/istftnet.py:271-328: two upsample
stages (8,8), reflection pad (1,0), conv_post -> n_fft+2 = 18 channels;
magnitude = exp(first 9 ch), phase = sin(last 9 ch); inverse STFT with
n_fft=16, hop=4 synthesises the waveform. The reference's conv-basis
STFT class (istftnet.py:65-164) is legacy/unused; we go straight to the
shared istft op (matmul-DFT on TPU).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import hann_window, istft_ri
from .hifigan import MRFUpsampler
from .layers import Conv1d, leaky_relu


class ISTFTNet(nn.Module):
    """mel (B, num_mels, T) -> wave (B, L)."""

    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_type: str = "1"
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4

    @classmethod
    def from_config(cls, h) -> "ISTFTNet":
        return cls(
            num_mels=h.num_mels,
            upsample_initial_channel=h.upsample_initial_channel,
            upsample_rates=tuple(h.upsample_rates),
            upsample_kernel_sizes=tuple(h.upsample_kernel_sizes),
            resblock_kernel_sizes=tuple(h.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in h.resblock_dilation_sizes),
            resblock_type=h.resblock,
            gen_istft_n_fft=h.gen_istft_n_fft,
            gen_istft_hop_size=h.gen_istft_hop_size,
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(mel, -1, -2)
        x = MRFUpsampler(
            self.num_mels,
            self.upsample_initial_channel,
            self.upsample_rates,
            self.upsample_kernel_sizes,
            self.resblock_kernel_sizes,
            self.resblock_dilation_sizes,
            self.resblock_type,
        )(x)
        ch = self.upsample_initial_channel // (2 ** len(self.upsample_rates))
        x = leaky_relu(x, 0.01)  # istftnet.py:311 F.leaky_relu default
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")  # ReflectionPad1d((1,0))
        nf = self.gen_istft_n_fft
        x = Conv1d(ch, nf + 2, 7, padding=3, use_weight_norm=True)(x)
        x = jnp.swapaxes(x, -1, -2)  # (B, nf+2, T)
        F_bins = nf // 2 + 1
        mag = jnp.exp(x[:, :F_bins, :])
        phase = jnp.sin(x[:, F_bins:, :])
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
        return istft_ri(re, im, nf, self.gen_istft_hop_size, nf, window=hann_window(nf))
