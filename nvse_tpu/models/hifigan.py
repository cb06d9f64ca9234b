"""HiFiGAN generator (time-domain mel->wav).

Architecture re-derived from reference Models/hifigan.py:19-133: MRF
ResBlocks (k 3/7/11, dilations 1/3/5) around a transposed-conv upsample
pyramid (rates 8,8,2,2), weight norm everywhere, tanh output.

Init note: the reference calls apply(init_weights) (N(0, 0.01)) on the
upsamplers / resblock convs / post conv AFTER wrapping them in
weight_norm — in torch that mutates the stale computed `weight` tensor,
not weight_v/weight_g, so it is a no-op and the effective reference
init is the torch Conv1d default (kaiming-uniform v, g = ||v||). The
weight-normed convs here therefore use the default torch_conv_init.

Layout: input mel follows the reference contract (B, num_mels, T);
internally everything is channels-last (B, T, C) for TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    LRELU_SLOPE,
    Conv1d,
    ConvTranspose1d,
    get_padding,
    leaky_relu,
)


class ResBlock1(nn.Module):
    """3x (dilated conv + plain conv) residual stages (hifigan.py:19-57)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        for d in self.dilation:
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(c, c, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        use_weight_norm=True)(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(c, c, self.kernel_size, dilation=1,
                        padding=get_padding(self.kernel_size, 1),
                        use_weight_norm=True)(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2x dilated conv residual stages (hifigan.py:59-76)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        for d in self.dilation:
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(c, c, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        use_weight_norm=True)(xt)
            x = xt + x
        return x


class MRFUpsampler(nn.Module):
    """conv_pre + upsample/MRF trunk shared by HiFiGAN and iSTFTNet.

    (B, T, num_mels) -> (B, T * prod(rates), C_final). hifigan.py:89-119.
    """

    num_mels: int
    upsample_initial_channel: int
    upsample_rates: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    resblock_type: str = "1"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv1d(self.num_mels, self.upsample_initial_channel, 7, padding=3,
                   use_weight_norm=True)(x)
        resblock = ResBlock1 if self.resblock_type == "1" else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            cin = self.upsample_initial_channel // (2**i)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(cin, ch, k, stride=u, padding=(k - u) // 2,
                                use_weight_norm=True)(x)
            xs = None
            for kr, dr in zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes):
                out = resblock(ch, kr, tuple(dr))(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        return x


class HiFiGAN(nn.Module):
    """mel (B, num_mels, T) -> wave (B, T * prod(upsample_rates))."""

    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_type: str = "1"

    @classmethod
    def from_config(cls, h) -> "HiFiGAN":
        return cls(
            num_mels=h.num_mels,
            upsample_initial_channel=h.upsample_initial_channel,
            upsample_rates=tuple(h.upsample_rates),
            upsample_kernel_sizes=tuple(h.upsample_kernel_sizes),
            resblock_kernel_sizes=tuple(h.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in h.resblock_dilation_sizes),
            resblock_type=h.resblock,
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(mel, -1, -2)  # (B, T, num_mels)
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
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default, hifigan.py:120
        x = Conv1d(ch, 1, 7, padding=3, use_weight_norm=True)(x)
        x = jnp.tanh(x)
        return x[..., 0]  # (B, L)
