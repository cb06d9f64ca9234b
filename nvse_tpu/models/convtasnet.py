"""ConvTasNet time-domain refiner over a phase-initialised waveform.

Re-derived from reference Models/convtasnet.py:8-328: the pseudo-inverse
mel magnitude spectrum is turned into an initial waveform with
zero/random/Griffin-Lim phase (convtasnet.py:286-299), then a TasNet
mask-based refiner (Conv1d encoder L=16, gLN, 3 repeats x 8 dilated
depthwise blocks, 1x1 mask head, transposed-conv decoder) cleans it up.
Note the reference applies the mask WITHOUT an activation (its
activation module is constructed but unused in forward,
convtasnet.py:323-325) — replicated as-is. skip_con=True per the
shipped config.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import griffin_lim, hann_window, inverse_mel, istft_ri
from ..ops.pallas_tcn import tcn_block_tail
from .layers import Conv1d, ConvTranspose1d


class PReLU(nn.Module):
    """torch.nn.PReLU (single shared alpha, init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


class GlobalLayerNorm(nn.Module):
    """gLN over (channels, time) jointly (convtasnet.py:8-48), on (B, T, C)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (1, 1, self.dim))
        b = self.param("bias", nn.initializers.zeros, (1, 1, self.dim))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        return w * (x - mean) / jnp.sqrt(var + self.eps) + b


class ChannelLayerNorm(nn.Module):
    """Per-frame LayerNorm over channels ('cln' in the reference's
    select_norm, convtasnet.py:50-70 — named Cumulative but it is a
    plain channel LN), on (B, T, C)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return w * (x - mean) / jnp.sqrt(var + self.eps) + b


def _select_norm(norm: str, dim: int):
    """Reference select_norm (convtasnet.py:73-80) minus the BatchNorm1d
    fallback (running batch stats; no reference config uses it)."""
    n = norm.lower()
    if n == "gln":
        return GlobalLayerNorm(dim)
    if n == "cln":
        return ChannelLayerNorm(dim)
    raise ValueError(f"unsupported ConvTasNet norm {norm!r} (gln|cln)")


class Conv1DBlock(nn.Module):
    """TCN block: 1x1 -> PReLU -> norm -> dilated dwconv -> PReLU ->
    norm -> residual 1x1 (+ optional skip 1x1). convtasnet.py:125-167.
    causal pads d*(k-1) and crops the right side after the dwconv
    (reference :137-138, :162-163) — left context only."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    skip_con: bool
    causal: bool = False
    norm: str = "gln"
    fused_tcn: bool = False

    def _fusable(self) -> bool:
        """The fused Pallas tail (ops/pallas_tcn.py) covers the shipped
        config's shape family: non-causal k=3 gLN blocks with lane-
        aligned channels and dilation within the halo."""
        return (self.fused_tcn and self.skip_con and not self.causal
                and self.kernel_size == 3 and self.norm.lower() == "gln"
                and self.dilation <= 128
                and self.in_channels % 128 == 0
                and self.out_channels % 128 == 0)

    @nn.compact
    def __call__(self, x):
        full = self.dilation * (self.kernel_size - 1)
        pad = full if self.causal else full // 2
        c = Conv1d(self.in_channels, self.out_channels, 1)(x)
        c = PReLU()(c)
        if self._fusable() and not self.is_initializing():
            # read the unfused submodules' params directly (they are
            # created by the init/unfused path below, so checkpoints
            # and the torch importer see an unchanged tree) and run
            # the single-pass fused tail
            p = self.variables["params"]
            gln, dw = p["GlobalLayerNorm_0"], p["Conv1d_1"]
            res, skip = p["Conv1d_2"], p["Conv1d_3"]
            H, Bc = self.out_channels, self.in_channels
            e, sk = tcn_block_tail(
                c, x,
                gln["weight"].reshape(1, H), gln["bias"].reshape(1, H),
                dw["kernel"].reshape(self.kernel_size, H),
                dw["bias"].reshape(1, H),
                jnp.concatenate([res["kernel"].reshape(H, Bc),
                                 skip["kernel"].reshape(H, Bc)], axis=1),
                jnp.concatenate([res["bias"], skip["bias"]]).reshape(1, 2 * Bc),
                self.dilation,
            )
            return e, sk
        c = _select_norm(self.norm, self.out_channels)(c)
        c = Conv1d(self.out_channels, self.out_channels, self.kernel_size,
                   groups=self.out_channels, padding=pad, dilation=self.dilation)(c)
        if self.causal and pad:
            c = c[:, :-pad, :]
        # NOTE: the reference constructs PReLU_2/norm_2 but its forward
        # never calls them (convtasnet.py:143-144 vs :150-167) — the
        # dwconv output feeds the residual/skip 1x1s directly
        res = Conv1d(self.out_channels, self.in_channels, 1)(c)
        if self.skip_con:
            skip = Conv1d(self.out_channels, self.in_channels, 1)(c)
            return x + res, skip
        return x + res, None


class ConvTasNet(nn.Module):
    """mel (B, M, T) -> wave (B, L)."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    N: int = 512
    L: int = 16
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    num_spks: int = 1
    skip_con: bool = True
    init_phase: str = "griffin_lim"
    causal: bool = False
    norm: str = "gln"
    # fused Pallas TCN tail (ops/pallas_tcn.py): OFF by default — the
    # v5e A/B (bench_fleet --set fused_tcn=1 vs 0, batch 8 x 1024
    # frames) measured the kernel at 519x RT vs 694x for XLA's own
    # fusion of the unfused path; the two-phase stats pass plus halo
    # re-reads cost more than the saved intermediates. Kept opt-in for
    # longer-sequence/streaming shapes where the (B,T,512) intermediates
    # exceed what XLA keeps fused.
    fused_tcn: bool = False

    @classmethod
    def from_config(cls, h) -> "ConvTasNet":
        return cls(
            sampling_rate=h.sampling_rate, n_fft=h.n_fft, hop_size=h.hop_size,
            win_size=h.win_size, num_mels=h.num_mels, fmin=h.fmin, fmax=h.fmax,
            N=h.N, L=h.L, B=h.B, H=h.H, P=h.P, X=h.X, R=h.R,
            num_spks=h.num_spks, skip_con=h.skip_con, init_phase=h.init_phase,
            causal=bool(h.get("causal", False)), norm=str(h.get("norm", "gln")),
            fused_tcn=bool(h.get("fused_tcn", False)),
        )

    def _initial_wave(self, inv_amp):
        """Phase-init synthesis (convtasnet.py:286-299)."""
        mode = self.init_phase.lower()
        if mode == "zero":
            re, im = inv_amp, jnp.zeros_like(inv_amp)
            return istft_ri(re, im, self.n_fft, self.hop_size, self.win_size,
                            window=hann_window(self.win_size))
        if mode == "rand":
            # fresh per-forward draw like the reference's rand_like
            # (convtasnet.py:290) when the caller provides a 'phase'
            # rng (the trainer folds the step counter in); fixed key
            # otherwise (deterministic decode)
            key = (self.make_rng("phase") if self.has_rng("phase")
                   else jax.random.PRNGKey(0))
            theta = jax.random.uniform(key, inv_amp.shape,
                                       minval=-jnp.pi, maxval=jnp.pi)
            return istft_ri(inv_amp * jnp.cos(theta), inv_amp * jnp.sin(theta),
                            self.n_fft, self.hop_size, self.win_size,
                            window=hann_window(self.win_size))
        return griffin_lim(inv_amp, self.n_fft, self.hop_size, self.win_size,
                           n_iter=32)

    @nn.compact
    def __call__(self, mel: jnp.ndarray, inv_mel_amp: jnp.ndarray | None = None):
        if inv_mel_amp is None:
            inv_amp = inverse_mel(mel, self.n_fft, self.num_mels, self.sampling_rate,
                                  self.hop_size, self.win_size, self.fmin, self.fmax)
            inv_amp = jnp.clip(jnp.abs(inv_amp), 1e-5, None)
        else:
            inv_amp = inv_mel_amp
        wav0 = self._initial_wave(inv_amp)                 # (B, L)

        x = wav0[..., None]                                # (B, L, 1)
        w = Conv1d(1, self.N, self.L, stride=self.L // 2)(x)  # (B, T', N)
        e = GlobalLayerNorm(self.N)(w)
        e = Conv1d(self.N, self.B, 1)(e)

        skip_sum = jnp.zeros_like(e)
        for _r in range(self.R):
            for i in range(self.X):
                e, skip = Conv1DBlock(self.B, self.H, self.P, 2**i, self.skip_con,
                                      self.causal, self.norm, self.fused_tcn)(e)
                if self.skip_con:
                    skip_sum = skip_sum + skip
        feat = skip_sum if self.skip_con else e

        m = Conv1d(self.B, self.num_spks * self.N, 1)(feat)
        d = w * m                                          # mask applied raw
        out = ConvTranspose1d(self.N, 1, self.L, stride=self.L // 2)(d)
        return out[..., 0]
