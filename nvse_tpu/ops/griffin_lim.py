"""Griffin-Lim phase reconstruction (fixed-iteration, jit-compatible).

Replicates torchaudio.transforms.GriffinLim semantics as used by the
reference's ConvTasNet/HDDemucs front ends
(Models/convtasnet.py:205-206, Models/hddemucas.py:181-182):
n_iter=32, momentum=0.99, power=1, random phase init.

TPU-first: the iteration is a lax.fori_loop over real/imag pairs (no
complex dtype, no FFT — istft/stft are the matmul-DFT ops), so the 32
iterations compile to one fused loop on device and are differentiable
w.r.t. the input magnitude exactly like the torch version.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .spectral import hann_window, istft_ri, stft_ri


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    n_iter: int = 32,
    momentum: float = 0.99,
    rng: jax.Array | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """magnitude (..., F, T) -> waveform (..., L).

    rng=None uses a fixed key (deterministic random phase init, standing
    in for torchaudio's rand_init=True global-RNG draw).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    win = hann_window(win_size)
    T = magnitude.shape[-1]
    out_len = length if length is not None else hop_size * (T - 1)

    theta = jax.random.uniform(rng, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi)
    ang_re, ang_im = jnp.cos(theta), jnp.sin(theta)
    tprev_re = jnp.zeros_like(magnitude)
    tprev_im = jnp.zeros_like(magnitude)
    mom = momentum / (1.0 + momentum)

    def body(_, carry):
        ang_re, ang_im, tprev_re, tprev_im = carry
        inv = istft_ri(magnitude * ang_re, magnitude * ang_im,
                       n_fft, hop_size, win_size, window=win, length=out_len)
        re, im = stft_ri(inv, n_fft, hop_size, win_size, window=win)
        re, im = re[..., :T], im[..., :T]
        a_re = re - mom * tprev_re
        a_im = im - mom * tprev_im
        norm = jnp.sqrt(a_re * a_re + a_im * a_im) + 1e-16
        return a_re / norm, a_im / norm, re, im

    ang_re, ang_im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ang_re, ang_im, tprev_re, tprev_im)
    )
    return istft_ri(magnitude * ang_re, magnitude * ang_im,
                    n_fft, hop_size, win_size, window=win, length=out_len)
