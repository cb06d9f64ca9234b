"""Vocos vocoder (bonus model).

The reference paper's comparison table includes Vocos (13.5M params,
BASELINE.md) but the reference repo ships no implementation
(SURVEY.md §6 footnote). Provided here for completeness, built from the
same blocks as APNet2: mel -> embedding Conv1d -> LayerNorm -> N
ConvNeXt blocks -> LayerNorm -> Linear head predicting (log-magnitude,
phase) -> iSTFT. Follows the published Vocos architecture (Siuzdak,
2023): dim 512, intermediate 1536, 8 blocks, head = Linear(dim, n_fft+2).

Trains under the "tf" domain contract: returns the standard 5-tuple.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops import hann_window, istft_ri
from .apnet import ConvNeXtBlock
from .layers import Conv1d, LayerNorm, Linear, get_padding, normal_init


class Vocos(nn.Module):
    """mel (B, M, T) -> (logamp, pha, rea, imag, wav)."""

    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    dim: int = 512
    num_layers: int = 8
    intermediate_dim: int = 1536

    @classmethod
    def from_config(cls, h) -> "Vocos":
        return cls(
            num_mels=h.num_mels, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size,
            dim=h.get("vocos_dim", 512),
            num_layers=h.get("vocos_num_layers", 8),
            intermediate_dim=h.get("vocos_intermediate_dim", 1536),
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        x = jnp.swapaxes(mel, -1, -2)                      # (B, T, M)
        ni = normal_init(0.02)
        x = Conv1d(self.num_mels, self.dim, 7, padding=get_padding(7),
                   kernel_init=ni, bias_init=nn.initializers.zeros)(x)
        x = LayerNorm(self.dim, eps=1e-6)(x)
        for _ in range(self.num_layers):
            x = ConvNeXtBlock(self.dim, self.intermediate_dim)(x)
        x = LayerNorm(self.dim, eps=1e-6)(x)

        F_bins = self.n_fft // 2 + 1
        head = Linear(self.dim, self.n_fft + 2, kernel_init=ni,
                      bias_init=nn.initializers.zeros)(x)   # (B, T, n_fft+2)
        logamp = jnp.swapaxes(head[..., :F_bins], -1, -2)   # (B, F, T)
        phase = jnp.swapaxes(head[..., F_bins:], -1, -2)
        # Vocos clips the magnitude for stability (exp of raw logits)
        amp = jnp.exp(jnp.clip(logamp, None, 12.0))
        rea = amp * jnp.cos(phase)
        imag = amp * jnp.sin(phase)
        wav = istft_ri(rea, imag, self.n_fft, self.hop_size, self.win_size,
                       window=hann_window(self.win_size))
        return jnp.log(jnp.clip(amp, 1e-5, None)), phase, rea, imag, wav
