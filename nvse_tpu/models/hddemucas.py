"""HD-DEMUCS restorer over a phase-initialised waveform.

Re-derived from reference Models/hddemucas.py:127-370: pseudo-inverse
mel -> Griffin-Lim/zero/rand phase init waveform -> sinc 4x resample ->
5 GLU conv encoder stages -> 2-layer BLSTM bottleneck -> two decoders
(suppression masks with sigmoid gates; refinement maps with dilated
transposed convs that consume the suppression outputs as skips) ->
learned fusion block -> 4x sinc downsample.

Init parity: the reference rescales every encoder/decoder conv weight by
(std/0.1)^0.5 at construction (hddemucas.py:115-124); replicated with
rescaling initialisers (empirical std for kernels, analytic for biases).
Fusion-block convs are created after the rescale call and keep torch
defaults — replicated too.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import downsample2, griffin_lim, hann_window, inverse_mel, istft_ri, upsample2
from .layers import LSTM, Conv1d, ConvTranspose1d, Linear, leaky_relu


def _rescaled_kernel_init(fan_in: int, reference: float):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.uniform(key, shape, dtype, -bound, bound)
        scale = (jnp.std(w) / reference) ** 0.5
        return w / scale

    return init


def _rescaled_bias_init(fan_in: int, reference: float):
    bound = 1.0 / math.sqrt(fan_in)
    scale = ((bound / math.sqrt(3.0)) / reference) ** 0.5  # analytic U(-b,b) std

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound) / scale

    return init


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class BLSTM(nn.Module):
    """2-layer (bi)LSTM bottleneck (hddemucas.py:95-110): bidirectional
    + 2dim->dim projection normally; h.causal flips it to a plain
    unidirectional stack with no projection (reference bi=not causal,
    hddemucas.py:228)."""

    dim: int
    bi: bool = True

    @nn.compact
    def __call__(self, x):
        if self.bi:
            y = LSTM(self.dim, self.dim, bidirectional=True)(x)
            y = LSTM(2 * self.dim, self.dim, bidirectional=True)(y)
            return Linear(2 * self.dim, self.dim)(y)
        y = LSTM(self.dim, self.dim)(x)
        return LSTM(self.dim, self.dim)(y)


class HDDemucas(nn.Module):
    """mel (B, M, T) -> wave (B, L)."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    chin: int = 1
    chout: int = 1
    hidden: int = 48
    depth: int = 5
    kernel_size: int = 8
    stride: int = 4
    resample: int = 4
    growth: float = 2.0
    max_hidden: int = 10_000
    normalize: bool = False
    rescale: float = 0.1
    init_phase: str = "griffin_lim"
    causal: bool = False

    @classmethod
    def from_config(cls, h) -> "HDDemucas":
        return cls(
            sampling_rate=h.sampling_rate, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size, num_mels=h.num_mels, fmin=h.fmin, fmax=h.fmax,
            chin=h.chin, chout=h.chout, hidden=h.hidden, depth=h.depth,
            kernel_size=h.kernel_size, stride=h.stride, resample=h.resample,
            growth=h.growth, max_hidden=h.max_hidden, normalize=h.normalize,
            rescale=h.rescale, init_phase=h.init_phase,
            causal=bool(h.get("causal", False)),
        )

    def valid_length(self, length: int) -> int:
        """Nearest conv-friendly length (hddemucas.py:247-262)."""
        length = math.ceil(length * self.resample)
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel_size) / self.stride) + 1
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        return int(math.ceil(length / self.resample))

    def _initial_wave(self, inv_amp):
        mode = self.init_phase.lower()
        if mode == "zero":
            return istft_ri(inv_amp, jnp.zeros_like(inv_amp), self.n_fft,
                            self.hop_size, self.win_size,
                            window=hann_window(self.win_size))
        if mode == "rand":
            # fresh per-forward draw like the reference's rand_like
            # (hddemucas.py:287) under a 'phase' rng; fixed key otherwise
            key = (self.make_rng("phase") if self.has_rng("phase")
                   else jax.random.PRNGKey(0))
            theta = jax.random.uniform(key, inv_amp.shape,
                                       minval=-jnp.pi, maxval=jnp.pi)
            return istft_ri(inv_amp * jnp.cos(theta), inv_amp * jnp.sin(theta),
                            self.n_fft, self.hop_size, self.win_size,
                            window=hann_window(self.win_size))
        return griffin_lim(inv_amp, self.n_fft, self.hop_size, self.win_size, n_iter=32)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, inv_mel_amp: jnp.ndarray | None = None):
        if inv_mel_amp is None:
            inv_amp = inverse_mel(mel, self.n_fft, self.num_mels, self.sampling_rate,
                                  self.hop_size, self.win_size, self.fmin, self.fmax)
            inv_amp = jnp.clip(jnp.abs(inv_amp), 1e-5, None)
        else:
            inv_amp = inv_mel_amp
        mix = self._initial_wave(inv_amp)[..., None]       # (B, L, 1)

        if self.normalize:
            mean = jnp.mean(mix, axis=(1, 2), keepdims=True)
            std = jnp.std(mix, axis=(1, 2), keepdims=True)
            mix = (mix - mean) / (1e-5 + std)
        else:
            mean, std = 0.0, 1.0
        length = mix.shape[1]

        x = jnp.pad(mix, ((0, 0), (0, self.valid_length(length) - length), (0, 0)))
        if self.resample >= 2:
            x = upsample2(jnp.swapaxes(x, 1, 2))
            if self.resample == 4:
                x = upsample2(x)
            x = jnp.swapaxes(x, 1, 2)
        x_us = x

        # channel plan per depth
        chans = []
        chin, chout, hidden = self.chin, self.chout, self.hidden
        for _ in range(self.depth):
            chans.append((chin, chout, hidden))
            chout = hidden
            chin = hidden
            hidden = min(int(self.growth * hidden), self.max_hidden)

        k, s, ref = self.kernel_size, self.stride, self.rescale
        dilation_factor = [1, 3, 5, 7, 9]

        skips_mask = []
        for ci, _co, hi in chans:
            x = Conv1d(ci, hi, k, stride=s,
                       kernel_init=_rescaled_kernel_init(ci * k, ref),
                       bias_init=_rescaled_bias_init(ci * k, ref))(x)
            x = jax.nn.relu(x)
            x = Conv1d(hi, hi * 2, 1,
                       kernel_init=_rescaled_kernel_init(hi, ref),
                       bias_init=_rescaled_bias_init(hi, ref))(x)
            x = _glu(x)
            skips_mask.append(x)

        bottleneck_dim = chans[-1][2]
        x = BLSTM(bottleneck_dim, bi=not self.causal)(x)

        # decoders, constructed coarse->fine (reverse of reference's
        # insert(0, ...) indexing; construction index = depth-1-step)
        skips_map = []
        x_mask = x
        for step in range(self.depth):
            idx = self.depth - 1 - step
            ci, co, hi = chans[idx]
            x_mask = x_mask + skips_mask[idx]
            x_mask = Conv1d(hi, 2 * hi, 1,
                            kernel_init=_rescaled_kernel_init(hi, ref),
                            bias_init=_rescaled_bias_init(hi, ref))(x_mask)
            x_mask = _glu(x_mask)
            x_mask = ConvTranspose1d(hi, co, k, stride=s,
                                     kernel_init=_rescaled_kernel_init(co * k, ref),
                                     bias_init=_rescaled_bias_init(co * k, ref))(x_mask)
            if idx > 0:
                x_mask = jax.nn.sigmoid(x_mask)
            skips_map.append(x_mask)

        x_map = x
        for step in range(self.depth):
            idx = self.depth - 1 - step
            ci, co, hi = chans[idx]
            x_map = Conv1d(hi, 2 * hi, 1,
                           kernel_init=_rescaled_kernel_init(hi, ref),
                           bias_init=_rescaled_bias_init(hi, ref))(x_map)
            x_map = _glu(x_map)
            x_map = ConvTranspose1d(hi, co, k, stride=s,
                                    dilation=dilation_factor[idx],
                                    padding=7 * idx,
                                    kernel_init=_rescaled_kernel_init(co * k, ref),
                                    bias_init=_rescaled_bias_init(co * k, ref))(x_map)
            if idx > 0:
                x_map = jax.nn.relu(x_map)
            x_map = x_map + skips_map[step]

        d_s = x_mask * x_us                                 # (B, L', 1)
        d_r = x_map
        x_fb = jnp.concatenate([d_s, d_r], axis=-1)         # (B, L', 2)
        x_fb = leaky_relu(Conv1d(2, 2, 3, padding=1)(x_fb), 0.01)
        x_fb = leaky_relu(Conv1d(2, 2, 3, padding=1)(x_fb), 0.01)
        x_fb = jax.nn.sigmoid(Conv1d(2, 2, 3, padding=1)(x_fb))

        w = self.param("weight", nn.initializers.constant(0.5), ())
        out = d_s * (1.0 - w) * x_fb[..., :1] + d_r * w * x_fb[..., 1:]

        out = jnp.swapaxes(out, 1, 2)                       # (B, 1, L')
        if self.resample >= 2:
            out = downsample2(out)
            if self.resample == 4:
                out = downsample2(out)
        out = out[..., :length] * std + mean
        return out[:, 0, :]
