"""GCRN: GLU-conv UNet + grouped LSTM, residual-mask magnitude + phase.

Re-derived from reference Models/gcrn.py:7-220: 6 GLU Conv2d encoder
stages over the frequency axis (valid padding, stride 2 in freq),
2-group LSTM bottleneck, two GLU ConvTranspose2d decoders with
channel-concat skips (magnitude residual-mask branch and R/I phase
branch), per-frequency LayerNorms, ELU activations, final 513->513
Linear heads.

Layout: (B, T, F, C) channels-last internally; the reference's NCHW
tensor (B, C, T, F) maps dim-1 channel concats onto our trailing axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import hann_window, inverse_mel, istft_ri
from .layers import Conv2d, ConvTranspose2d, LSTM, LayerNorm, Linear


class GluConv2d(nn.Module):
    """conv * sigmoid(conv) gate (gcrn.py:42-60).

    fused=True (default) runs the value/gate pair as ONE conv with
    2*cout output channels (kernels concatenated at apply time — the
    param tree / checkpoint layout is the two child convs, unchanged)
    then splits: identical floats, half the conv dispatches, and the
    GEMM is twice as wide — these stages' channel counts (16..128) are
    far below the MXU's 128-lane tile, so the small convs waste most of
    the systolic array (PERF.md GCRN ~4% MFU).
    """

    cin: int
    cout: int
    kernel: tuple[int, int]
    stride: tuple[int, int]
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        ma = Conv2d(self.cin, self.cout, self.kernel, stride=self.stride,
                    return_params=self.fused)
        mb = Conv2d(self.cin, self.cout, self.kernel, stride=self.stride,
                    return_params=self.fused)
        if not self.fused:
            return ma(x) * jax.nn.sigmoid(mb(x))
        (ka, ba), (kb, bb) = ma(x), mb(x)
        kernel = jnp.concatenate([ka, kb], axis=3)
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.stride, padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate([ba, bb])
        a, b = y[..., : self.cout], y[..., self.cout :]
        return a * jax.nn.sigmoid(b)


class GluConvTranspose2d(nn.Module):
    """transposed-conv GLU gate (gcrn.py:63-83); fused pair like
    GluConv2d (one lhs-dilated conv at 2*cout channels, then split)."""

    cin: int
    cout: int
    kernel: tuple[int, int]
    stride: tuple[int, int]
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        ma = ConvTranspose2d(self.cin, self.cout, self.kernel,
                             stride=self.stride, return_params=self.fused)
        mb = ConvTranspose2d(self.cin, self.cout, self.kernel,
                             stride=self.stride, return_params=self.fused)
        if not self.fused:
            return ma(x) * jax.nn.sigmoid(mb(x))
        (ka, ba), (kb, bb) = ma(x), mb(x)
        kernel = jnp.concatenate([ka, kb], axis=3)
        kh, kw = self.kernel
        pads = [(kh - 1,) * 2, (kw - 1,) * 2]
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(jnp.flip(kernel, axis=0), axis=1),
            window_strides=(1, 1), padding=pads, lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate([ba, bb])
        a, b = y[..., : self.cout], y[..., self.cout :]
        return a * jax.nn.sigmoid(b)


def _ln_freq(x, features, name_scope):
    """torch LayerNorm over the trailing freq dim of (B, C, T, F) —
    here applied to (B, T, F, C) over axis 2 with per-F params."""
    # implemented as a small inline module for parameter naming
    class _LN(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x):
            mu = jnp.mean(x, axis=2, keepdims=True)
            var = jnp.var(x, axis=2, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param("scale", nn.initializers.ones, (self.feats, 1))
            bias = self.param("bias", nn.initializers.zeros, (self.feats, 1))
            return y * scale + bias

    return _LN(feats=features, name=name_scope)(x)


class GLSTM(nn.Module):
    """2-group LSTM bottleneck (gcrn.py:7-39).

    Input (B, T, F, C); features flattened C-major to (B, T, C*F=896),
    chunked into 2 groups of 448, LSTM per group, interleave-stack + LN,
    re-chunk, LSTM per group, concat + LN, reshape back.
    """

    hidden_size: int = 896
    groups: int = 2

    def _group_scans(self, chunks, hs):
        """Run the per-group unidirectional LSTMs.

        The groups are independent scans of identical shape, so adjacent
        pairs share one dual-dot Pallas kernel (lstm_scan_bidir2): both
        recurrences advance in the same sequential grid step, halving
        the bottleneck's step count (4 scans x T -> 2 kernels x T). The
        LSTM children are instantiated in the same order as the naive
        loop, so the param tree / checkpoint layout is unchanged.
        """
        from ..ops.pallas_lstm import lstm_scan, lstm_scan_bidir2

        mods = [LSTM(hs, hs, return_params=True) for _ in chunks]
        outs = [None] * len(chunks)
        for i in range(0, len(chunks) - 1, 2):
            w_ih0, w_hh0, b0 = mods[i](chunks[i])
            w_ih1, w_hh1, b1 = mods[i + 1](chunks[i + 1])
            xp0 = jnp.swapaxes(chunks[i] @ w_ih0 + b0, 0, 1)
            xp1 = jnp.swapaxes(chunks[i + 1] @ w_ih1 + b1, 0, 1)
            h0, h1 = lstm_scan_bidir2(xp0, xp1, w_hh0, w_hh1)
            outs[i] = jnp.swapaxes(h0, 0, 1)
            outs[i + 1] = jnp.swapaxes(h1, 0, 1)
        if len(chunks) % 2:  # odd group count: last one scans alone
            w_ih, w_hh, b = mods[-1](chunks[-1])
            xp = jnp.swapaxes(chunks[-1] @ w_ih + b, 0, 1)
            outs[-1] = jnp.swapaxes(lstm_scan(xp, w_hh), 0, 1)
        return outs

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        hs = self.hidden_size // self.groups
        out = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, C * F)  # C-major like torch

        chunks = jnp.split(out, self.groups, axis=-1)
        outs = self._group_scans(chunks, hs)
        out = jnp.stack(outs, axis=-1).reshape(B, T, -1)  # interleaved flatten
        out = LayerNorm(self.hidden_size)(out)

        chunks = jnp.split(out, self.groups, axis=-1)
        outs = self._group_scans(chunks, hs)
        out = jnp.concatenate(outs, axis=-1)
        out = LayerNorm(self.hidden_size)(out)

        out = out.reshape(B, T, C, F)
        return jnp.transpose(out, (0, 1, 3, 2))  # (B, T, F, C)


class GCRN(nn.Module):
    """mel (B, M, T) -> (logamp, pha, rea, imag, wav). gcrn.py:86-220."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    fused_glu: bool = True  # h.fused_glu=false restores the 2-conv pairs (A/B)

    @classmethod
    def from_config(cls, h) -> "GCRN":
        return cls(
            sampling_rate=h.sampling_rate, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size, num_mels=h.num_mels, fmin=h.fmin, fmax=h.fmax,
            fused_glu=bool(h.get("fused_glu", True)),
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray, inv_mel_amp: jnp.ndarray | None = None):
        if inv_mel_amp is None:
            inv_amp = inverse_mel(mel, self.n_fft, self.num_mels, self.sampling_rate,
                                  self.hop_size, self.win_size, self.fmin, self.fmax)
            inv_amp = jnp.clip(jnp.abs(inv_amp), 1e-5, None)
        else:
            inv_amp = inv_mel_amp
        log_spec = jnp.log(inv_amp)                        # (B, F, T)

        elu = jax.nn.elu
        x = jnp.swapaxes(log_spec, -1, -2)[..., None]      # (B, T, F, 1)

        enc_spec = [
            (1, 16, (1, 5), 255), (16, 32, (1, 3), 127), (32, 64, (1, 3), 63),
            (64, 128, (1, 3), 31), (128, 128, (1, 3), 15), (128, 128, (1, 3), 7),
        ]
        skips = []
        for i, (ci, co, k, f_out) in enumerate(enc_spec):
            x = GluConv2d(ci, co, k, (1, 2), fused=self.fused_glu)(x)
            x = elu(_ln_freq(x, f_out, f"bn{i+1}"))
            skips.append(x)

        out = GLSTM()(x)
        out = jnp.concatenate([out, skips[-1]], axis=-1)   # (B, T, 7, 256)

        dec_spec = [
            (256, 128, (1, 3), 15), (256, 128, (1, 3), 31), (256, 64, (1, 3), 63),
            (128, 32, (1, 3), 127), (64, 16, (1, 3), 255), (32, None, (1, 5), 513),
        ]

        def decoder(x, branch, out_ch_last):
            for i, (ci, co, k, f_out) in enumerate(dec_spec):
                co_ = out_ch_last if co is None else co
                y = GluConvTranspose2d(ci, co_, k, (1, 2),
                                       fused=self.fused_glu)(x)
                y = _ln_freq(y, f_out, f"bn{6-i}_t_{branch}")
                if i < 5:
                    x = elu(jnp.concatenate([y, skips[4 - i]], axis=-1))
                else:
                    x = elu(y)
            return x

        d1 = decoder(out, 1, 1)                            # (B, T, 513, 1)
        d2 = decoder(out, 2, 2)                            # (B, T, 513, 2)

        resi_mask = Linear(513, 513)(d1[..., 0])           # fc1 on (B, T, F)
        mag = jnp.exp(jnp.swapaxes(resi_mask, -1, -2) + log_spec)  # (B, F, T)

        ri = Linear(513, 513)(jnp.swapaxes(d2, -1, -2).reshape(d2.shape[0], d2.shape[1] * 2, 513))
        # fc2 applied per (b, t, channel) row over freq; reshape back
        ri = ri.reshape(d2.shape[0], d2.shape[1], 2, 513)
        real = jnp.swapaxes(ri[:, :, 0, :], -1, -2)        # (B, F, T)
        imag_p = jnp.swapaxes(ri[:, :, 1, :], -1, -2)
        phase = jnp.arctan2(imag_p, real)

        rea = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        logamp = jnp.log(mag + 1e-5)
        wav = istft_ri(rea, imag, self.n_fft, self.hop_size, self.win_size,
                       window=hann_window(self.win_size))
        return logamp, phase, rea, imag, wav
