"""Griffin-Lim phase reconstruction (fixed-iteration, jit-compatible).

Replicates torchaudio.transforms.GriffinLim semantics as used by the
reference's ConvTasNet/HDDemucs front ends
(Models/convtasnet.py:205-206, Models/hddemucas.py:181-182):
n_iter=32, momentum=0.99, power=1, random phase init.

TPU-first: the iteration never leaves frame space. The classic
formulation round-trips through the time signal every iteration
(istft -> stft), which on TPU is latency-bound, not FLOP-bound —
profiling (PROFILE_FLOOR.jsonl) showed the 32 round trips at 0.14% MFU
eating 52% of ConvTasNet's decode time: each one materialises the
(B, L) waveform, reflect-pads it, and lowers a stride-`hop`
kernel-`n_fft` conv. But when hop divides n_fft (every config in this
suite) the whole composition stft(istft(.)) is exact chunk algebra:

  * OLA is a static shift-and-sum over r = n_fft//hop chunk lanes,
  * the center crop of n_fft//2 = (r//2)*hop samples drops whole
    chunks,
  * reflect padding mirrors a chunk-aligned sample range,
  * re-framing stacks r consecutive chunks per frame.

So one iteration = synthesis matmul (B*T, 2F)@(2F, n_fft) -> chunk
shift-add -> envelope divide -> pad/stack -> analysis matmul
(B*T, n_fft)@(n_fft, 2F): two MXU-shaped matmuls plus fused
elementwise, no strided conv, no waveform materialisation. The final
waveform still goes through the real istft once after the loop.

No complex dtype, no FFT (matmul-DFT bases), lax.fori_loop body, and
differentiable w.r.t. the input magnitude exactly like the torch
version.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import (_irdft_basis_np, _pad_window, _rdft_basis_np,
                       hann_window, istft_ri, stft_ri)


@functools.lru_cache(maxsize=None)
def _frame_bases_np(n_fft: int, win_size: int):
    """(synthesis (2F, n_fft), analysis (n_fft, 2F)) with window folded."""
    win = _pad_window(np.asarray(hann_window(win_size)), n_fft)
    syn = (_irdft_basis_np(n_fft) * win[None, :]).astype(np.float32)
    ana = (win[:, None] * _rdft_basis_np(n_fft)).astype(np.float32)
    return syn, ana


@functools.lru_cache(maxsize=None)
def _env_chunks_np(n_fft: int, hop: int, win_size: int, T: int):
    """OLA'd squared-window envelope as (T + r - 1, hop) chunk array."""
    win = _pad_window(np.asarray(hann_window(win_size)), n_fft)
    w2 = (win * win).reshape(n_fft // hop, hop)
    r = n_fft // hop
    env = np.zeros((T + r - 1, hop), dtype=np.float64)
    for k in range(r):
        env[k : k + T] += w2[k][None, :]
    env = np.where(env > 1e-11, env, 1.0).astype(np.float32)
    return env


def _roundtrip_frames(spec_ri: jnp.ndarray, n_fft: int, hop: int,
                      win_size: int) -> jnp.ndarray:
    """stft(istft(spec)) without leaving frame space.

    spec_ri: (B, T, 2F) frame-major [real | imag] -> (B, T, 2F), exactly
    matching istft_ri(center=True, length=hop*(T-1)) followed by
    stft_ri(center=True)[..., :T] for hann windows with hop | n_fft.
    """
    B, T, _ = spec_ri.shape
    r = n_fft // hop
    pad_chunks = r // 2  # n_fft//2 samples = (r//2) whole chunks
    syn_np, ana_np = _frame_bases_np(n_fft, win_size)
    syn = jnp.asarray(syn_np)
    ana = jnp.asarray(ana_np)

    # synthesis: windowed inverse-DFT frames, chunk-decomposed
    frames = (spec_ri @ syn).reshape(B, T, r, hop)

    # OLA as chunk shift-and-sum: chunk j = sum_k frames[:, j-k, k]
    total = T + r - 1
    chunks = jnp.zeros((B, total, hop), frames.dtype)
    for k in range(r):
        chunks = chunks.at[:, k : k + T].add(frames[:, :, k])

    env = jnp.asarray(_env_chunks_np(n_fft, hop, win_size, T))
    chunks = chunks / env[None]

    # center crop: y = y_full[n_fft//2 :][: hop*(T-1)] -> T-1 chunks
    y = chunks[:, pad_chunks : pad_chunks + (T - 1)]     # (B, T-1, hop)
    L = (T - 1) * hop
    y_flat = y.reshape(B, L)

    # reflect pad n_fft//2 on each side (mirror excluding the edge),
    # expressed on the flattened signal, then chunk-aligned again
    P = pad_chunks * hop
    left = y_flat[:, 1 : P + 1][:, ::-1].reshape(B, pad_chunks, hop)
    right = y_flat[:, L - P - 1 : L - 1][:, ::-1].reshape(B, pad_chunks, hop)
    padded = jnp.concatenate([left, y, right], axis=1)   # (B, T+r-1, hop)

    # analysis frame t = chunks [t, t+r): stack r shifted slices
    stacked = jnp.concatenate(
        [padded[:, t : t + T] for t in range(r)], axis=-1
    )                                                    # (B, T, n_fft)
    return stacked @ ana


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

    # Frame-domain path requirement: the n_fft//2 center crop must be a
    # whole number of hop chunks — n_fft/hop EVEN. Odd ratios break the
    # chunk algebra in _roundtrip_frames (r//2 chunks drop hop*r//2
    # samples, not n_fft//2) and take the time-domain loop below.
    # `length` semantics on both paths follow torchaudio.GriffinLim:
    # the iterations run at the natural hop*(T-1) length and `length`
    # crops/pads only the final synthesis (iterating at a caller length
    # would change the frame count mid-loop).
    if n_fft % (2 * hop_size) == 0 and T >= 2:
        return _griffin_lim_frame_domain(
            magnitude, ang_re, ang_im, n_fft, hop_size, win_size,
            n_iter, momentum, out_len)

    tprev_re = jnp.zeros_like(magnitude)
    tprev_im = jnp.zeros_like(magnitude)
    mom = momentum / (1.0 + momentum)
    natural_len = hop_size * (T - 1)

    def body(_, carry):
        ang_re, ang_im, tprev_re, tprev_im = carry
        inv = istft_ri(magnitude * ang_re, magnitude * ang_im,
                       n_fft, hop_size, win_size, window=win,
                       length=natural_len)
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


def _griffin_lim_frame_domain(magnitude, ang_re, ang_im, n_fft, hop_size,
                              win_size, n_iter, momentum, out_len):
    """GL loop on (B, T, 2F) frame-major spec; one real istft at the end."""
    lead = magnitude.shape[:-2]
    F, T = magnitude.shape[-2:]
    mag = jnp.swapaxes(magnitude, -1, -2).reshape(-1, T, F)  # (B, T, F)
    mag2 = jnp.concatenate([mag, mag], axis=-1)              # (B, T, 2F)
    ang = jnp.concatenate(
        [jnp.swapaxes(ang_re, -1, -2).reshape(-1, T, F),
         jnp.swapaxes(ang_im, -1, -2).reshape(-1, T, F)], axis=-1)
    mom = momentum / (1.0 + momentum)

    def body(_, carry):
        ang, tprev = carry
        spec = _roundtrip_frames(mag2 * ang, n_fft, hop_size, win_size)
        a = spec - mom * tprev
        a_re, a_im = a[..., :F], a[..., F:]
        norm = jnp.sqrt(a_re * a_re + a_im * a_im) + 1e-16
        norm = jnp.concatenate([norm, norm], axis=-1)
        return a / norm, spec

    ang, _ = jax.lax.fori_loop(0, n_iter, body, (ang, jnp.zeros_like(ang)))
    final = mag2 * ang
    re = jnp.swapaxes(final[..., :F], -1, -2).reshape(*lead, F, T)
    im = jnp.swapaxes(final[..., F:], -1, -2).reshape(*lead, F, T)
    return istft_ri(re, im, n_fft, hop_size, win_size,
                    window=hann_window(win_size), length=out_len)
