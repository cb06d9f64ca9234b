"""BSRNN band-split RNN vocoder / enhancer (flagship model).

Re-derived from reference Models/bsrnn.py (mel->wav via pseudo-inverse
mel) and Models/bsrnn_24k.py (log-spectrum input for joint
denoise+vocoder). Band plan (bsrnn.py:98-110): 10x~100Hz + 12x~250Hz +
8x~500Hz + 3x~1kHz bands + remainder = 34 bands.

TPU-first redesign: the reference loops 34 tiny per-band LayerNorm+Linear
modules in Python (bsrnn.py:112-141, the slow shape). Here bands are
grouped by width into 5 groups and each group's encoder/decoder is ONE
batched einsum with stacked per-band parameters — 5 MXU matmuls instead
of 34 small ones, with identical per-band math and parameter counts.
The dual-path separator keeps the reference's time-LSTM + band-BiLSTM
structure; each LSTM hoists its input projection into a single large
matmul and scans only the hidden recurrence.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import hann_window, inverse_mel, istft_ri
from .layers import LSTM, LayerNorm, Linear


def band_plan(sampling_rate: int, n_fft: int) -> list[int]:
    """Band widths in FFT bins (reference bsrnn.py:98-108)."""
    reso = sampling_rate / n_fft
    widths = [int(np.floor(100 / reso))] * 10
    widths += [int(np.floor(250 / reso))] * 12
    widths += [int(np.floor(500 / reso))] * 8
    widths += [int(np.floor(1000 / reso))] * 3
    widths.append(n_fft // 2 + 1 - int(np.sum(widths)))
    return widths


def _band_groups(widths: Sequence[int]):
    """Group consecutive equal-width bands: [(width, count, bin_offset)]."""
    groups = []
    off = 0
    i = 0
    while i < len(widths):
        w = widths[i]
        j = i
        while j < len(widths) and widths[j] == w:
            j += 1
        groups.append((w, j - i, off))
        off += w * (j - i)
        i = j
    return groups


def _uinit(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _sp_constrain(x: jnp.ndarray, axis: str | None, dim: int) -> jnp.ndarray:
    """Sequence-parallel sharding hint: shard `dim` of x over mesh axis
    `axis`, leave the batch dim unconstrained (it may be data-sharded),
    replicate the rest. No-op when axis is None (single-device / pure DP).

    The dual-path trunk alternates which axis is a pure batch axis: the
    time-direction LSTM is independent per band and the band-direction
    LSTM independent per frame, so constraining bands before the time
    pass and frames before the band pass makes each scan fully local;
    GSPMD materializes the switch as one all-to-all at the transpose.
    """
    if axis is None:
        return x
    from jax.sharding import PartitionSpec as P

    # Outside a mesh context (param init, single-device apply) the hint
    # is meaningless — and bare PartitionSpecs would fail to resolve.
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or axis not in mesh.axis_names:
        return x
    spec = [None] * x.ndim
    spec[0] = P.UNCONSTRAINED
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


class _GroupedBandEncoder(nn.Module):
    """Per-band LayerNorm(bw) + Linear(bw->C), batched per width group.

    Equivalent to reference bsrnn.py:112-119 with stacked parameters.
    Input log-spectrum (B, F, T) -> features (B, nband, T, C).
    """

    widths: tuple[int, ...]
    feature_dim: int

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        outs = []
        C = self.feature_dim
        for gi, (w, n, off) in enumerate(_band_groups(self.widths)):
            x = spec[:, off : off + n * w, :]                    # (B, n*w, T)
            B, _, T = x.shape
            x = x.reshape(B, n, w, T).transpose(0, 1, 3, 2)       # (B, n, T, w)
            scale = self.param(f"ln_scale_{gi}", nn.initializers.ones, (n, 1, w))
            bias = self.param(f"ln_bias_{gi}", nn.initializers.zeros, (n, 1, w))
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            bound = 1.0 / math.sqrt(w)
            wgt = self.param(f"w_{gi}", _uinit(bound), (n, w, C))
            b = self.param(f"b_{gi}", _uinit(bound), (n, 1, C))
            outs.append(jnp.einsum("bntw,nwc->bntc", x, wgt) + b)
        return jnp.concatenate(outs, axis=1)                      # (B, nband, T, C)


class _GroupedBandDecoder(nn.Module):
    """Per-band LN(C) + Linear(C->4C) + GELU + Linear(4C->out_mult*bw).

    Equivalent to reference bsrnn.py:124-141, batched per width group.
    Input (B, nband, T, C) -> (B, T, out_mult * F) laid out band-major.
    """

    widths: tuple[int, ...]
    feature_dim: int
    out_mult: int  # 1 for magnitude residual, 2 for (real, imag) phase

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        C = self.feature_dim
        outs = []
        band0 = 0
        for gi, (w, n, _off) in enumerate(_band_groups(self.widths)):
            x = feats[:, band0 : band0 + n, :, :]                 # (B, n, T, C)
            band0 += n
            scale = self.param(f"ln_scale_{gi}", nn.initializers.ones, (n, 1, C))
            bias = self.param(f"ln_bias_{gi}", nn.initializers.zeros, (n, 1, C))
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            b1 = 1.0 / math.sqrt(C)
            w1 = self.param(f"w1_{gi}", _uinit(b1), (n, C, 4 * C))
            bias1 = self.param(f"b1_{gi}", _uinit(b1), (n, 1, 4 * C))
            x = jnp.einsum("bntc,nch->bnth", x, w1) + bias1
            x = jax.nn.gelu(x, approximate=False)                 # torch GELU
            b2 = 1.0 / math.sqrt(4 * C)
            w2 = self.param(f"w2_{gi}", _uinit(b2), (n, 4 * C, self.out_mult * w))
            bias2 = self.param(f"b2_{gi}", _uinit(b2), (n, 1, self.out_mult * w))
            x = jnp.einsum("bnth,nhk->bntk", x, w2) + bias2       # (B, n, T, mult*w)
            outs.append(x)
        return outs  # list of (B, n, T, out_mult*w) per group


class ResRNN(nn.Module):
    """LayerNorm + (bi)LSTM + projection with residual (bsrnn.py:7-41)."""

    input_size: int
    hidden_size: int
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, state=None, return_state: bool = False,
                 carry_idx: int | None = None):
        # x: (B, G, S, C) — LSTM runs over axis S for every (B, G).
        # Streaming (state/return_state): state is the forward-direction
        # LSTM (h, c), each (B, G, H), carried across chunks.
        B, G, S, C = x.shape
        y = LayerNorm(C)(x)
        y = y.reshape(B * G, S, C)
        lstm = LSTM(C, self.hidden_size, bidirectional=not self.causal)
        streaming = state is not None or return_state
        if streaming:
            st = None if state is None else tuple(
                s.reshape(B * G, -1) for s in state)
            y, new_st = lstm(y, initial_state=st, return_state=True,
                             carry_idx=carry_idx)
            new_state = tuple(s.reshape(B, G, -1) for s in new_st)
        else:
            y = lstm(y)
        y = Linear(y.shape[-1], self.input_size)(y)
        out = x + y.reshape(B, G, S, C)
        return (out, new_state) if streaming else out


class BSNet(nn.Module):
    """Dual-path block: time LSTM then band BiLSTM (bsrnn.py:44-77)."""

    feature_dim: int
    causal: bool = False
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, state=None, return_state: bool = False,
                 carry_idx: int | None = None):
        # x: (B, nband, T, C). Streaming state belongs to the TIME
        # direction only; the band BiLSTM runs across bands within each
        # frame and needs no carry.
        x = _sp_constrain(x, self.sp_axis, 1)     # bands local to each shard
        streaming = state is not None or return_state
        time_rnn = ResRNN(self.feature_dim, self.feature_dim, causal=self.causal)
        if streaming:
            x, new_state = time_rnn(x, state=state, return_state=True,
                                    carry_idx=carry_idx)
        else:
            x = time_rnn(x)
        x = jnp.swapaxes(x, 1, 2)                 # (B, T, nband, C)
        x = _sp_constrain(x, self.sp_axis, 1)     # frames local (all-to-all)
        x = ResRNN(self.feature_dim, self.feature_dim, causal=False)(x)
        x = jnp.swapaxes(x, 1, 2)
        out = LayerNorm(self.feature_dim)(x)
        return (out, new_state) if streaming else out


class BSRNNCore(nn.Module):
    """Shared band-split trunk: log-spectrum (B, F, T) -> TF outputs.

    Returns (logamp, pha, rea, imag, wav) exactly as reference
    bsrnn.py:143-217 / bsrnn_24k.py:139-194 (residual exp-magnitude on
    the input log-spectrum, atan2 phase, iSTFT synthesis).
    """

    sampling_rate: int
    n_fft: int
    hop_size: int
    win_size: int
    feature_dim: int = 128
    num_repeat: int = 8
    causal: bool = False
    sp_axis: str | None = None

    @nn.compact
    def __call__(self, log_spec: jnp.ndarray, stream_state=None,
                 return_state: bool = False, carry_idx: int | None = None):
        """Streaming decode (stream_state/return_state): stream_state is
        a tuple of num_repeat per-BSNet time-LSTM states, each a
        ((B, nband, C), (B, nband, C)) pair; carry_idx is the chunk
        length in frames at which the next chunk's state is snapshotted
        (lookahead frames beyond it refine this window's output but are
        not consumed into the carry). Returns (outputs, new_states)."""
        widths = tuple(band_plan(self.sampling_rate, self.n_fft))
        feats = _GroupedBandEncoder(widths, self.feature_dim)(log_spec)
        streaming = stream_state is not None or return_state
        new_states = []
        for r in range(self.num_repeat):
            blk = BSNet(self.feature_dim, causal=self.causal,
                        sp_axis=self.sp_axis)
            if streaming:
                st = None if stream_state is None else stream_state[r]
                feats, ns = blk(feats, state=st, return_state=True,
                                carry_idx=carry_idx)
                new_states.append(ns)
            else:
                feats = blk(feats)

        # decoders are per-band einsums — band-sharded is fully local
        feats = _sp_constrain(feats, self.sp_axis, 1)
        mag_groups = _GroupedBandDecoder(widths, self.feature_dim, out_mult=1)(feats)
        pha_groups = _GroupedBandDecoder(widths, self.feature_dim, out_mult=2)(feats)

        B, _, T, _ = feats.shape
        resi = jnp.concatenate(
            [g.transpose(0, 2, 1, 3).reshape(B, T, -1) for g in mag_groups], axis=-1
        )                                          # (B, T, F)
        pha_parts = []
        for g, (w, n, _o) in zip(pha_groups, _band_groups(widths)):
            re_p, im_p = g[..., :w], g[..., w:]
            pha = jnp.arctan2(im_p, re_p)          # (B, n, T, w)
            pha_parts.append(pha.transpose(0, 2, 1, 3).reshape(B, T, -1))
        phase = jnp.concatenate(pha_parts, axis=-1)

        mag = jnp.exp(jnp.swapaxes(resi, -1, -2) + log_spec)   # (B, F, T)
        phase = jnp.swapaxes(phase, -1, -2)

        # the reference's clamp_min_ is IN-PLACE (bsrnn.py:204), so the
        # clamped magnitude also feeds rea/imag and the iSTFT
        mag = jnp.clip(mag, 1e-5, None)
        logamp = jnp.log(mag)
        rea = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        wav = istft_ri(rea, imag, self.n_fft, self.hop_size, self.win_size,
                       window=hann_window(self.win_size))
        outs = (logamp, phase, rea, imag, wav)
        return (outs, tuple(new_states)) if streaming else outs


class BSRNN(nn.Module):
    """mel (B, M, T) -> (logamp, pha, rea, imag, wav). Reference bsrnn.py:80-217."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    feature_dim: int = 128
    num_repeat: int = 8
    causal: bool = False
    sp_axis: str | None = None

    @classmethod
    def from_config(cls, h) -> "BSRNN":
        return cls(
            sampling_rate=h.sampling_rate, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size, num_mels=h.num_mels, fmin=h.fmin, fmax=h.fmax,
            feature_dim=h.feature_dim, num_repeat=h.num_repeat, causal=h.causal,
            sp_axis=h.get("sp_axis"),
        )

    # the engine's state-carrying chunked decoder recognises this flag
    supports_stream_state = True

    @nn.compact
    def __call__(self, mel: jnp.ndarray, inv_mel_amp: jnp.ndarray | None = None,
                 stream_state=None, return_state: bool = False,
                 carry_idx: int | None = None):
        if inv_mel_amp is None:
            inv_amp = inverse_mel(
                mel, self.n_fft, self.num_mels, self.sampling_rate,
                self.hop_size, self.win_size, self.fmin, self.fmax,
            )
            inv_amp = jnp.clip(jnp.abs(inv_amp), 1e-5, None)
        else:
            inv_amp = inv_mel_amp
        log_spec = jnp.log(inv_amp)
        return BSRNNCore(
            self.sampling_rate, self.n_fft, self.hop_size, self.win_size,
            self.feature_dim, self.num_repeat, self.causal, self.sp_axis,
        )(log_spec, stream_state=stream_state, return_state=return_state,
          carry_idx=carry_idx)


class BSRNN_24k(nn.Module):
    """log-spectrum (B, F, T) -> TF outputs. Reference bsrnn_24k.py:79-194.

    Used by the joint denoise+vocoder trainer: the input is either a
    noisy log-amplitude spectrum (denoise task) or a log pseudo-inverse
    mel spectrum (vocoder task).
    """

    sampling_rate: int = 24000
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    feature_dim: int = 128
    num_repeat: int = 8
    causal: bool = False
    sp_axis: str | None = None

    @classmethod
    def from_config(cls, h) -> "BSRNN_24k":
        return cls(
            sampling_rate=h.sampling_rate, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size, feature_dim=h.feature_dim,
            num_repeat=h.num_repeat, causal=h.causal, sp_axis=h.get("sp_axis"),
        )

    supports_stream_state = True

    @nn.compact
    def __call__(self, log_spec: jnp.ndarray, stream_state=None,
                 return_state: bool = False, carry_idx: int | None = None):
        return BSRNNCore(
            self.sampling_rate, self.n_fft, self.hop_size, self.win_size,
            self.feature_dim, self.num_repeat, self.causal, self.sp_axis,
        )(log_spec, stream_state=stream_state, return_state=return_state,
          carry_idx=carry_idx)
