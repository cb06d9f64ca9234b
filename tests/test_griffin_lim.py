"""Frame-domain Griffin-Lim equivalence + convergence properties.

The frame-domain fast path (ops/griffin_lim.py:_griffin_lim_frame_domain)
must match the classic istft/stft round-trip composition exactly — same
random phase init, same momentum recursion, same envelope guard, same
reflect-pad semantics — and GL itself must reconstruct a signal whose
magnitude it was given (torchaudio.transforms.GriffinLim contract,
reference Models/convtasnet.py:205-206).
"""
import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

gl_mod = importlib.import_module("nvse_tpu.ops.griffin_lim")
from nvse_tpu.ops.spectral import hann_window, istft_ri, stft_ri


def _time_domain_gl(mag, n_fft, hop, win_size, n_iter, momentum=0.99):
    """The classic composition the fast path must reproduce."""
    win = hann_window(win_size)
    T = mag.shape[-1]
    out_len = hop * (T - 1)
    theta = jax.random.uniform(jax.random.PRNGKey(0), mag.shape,
                               minval=-jnp.pi, maxval=jnp.pi)
    ang_re, ang_im = jnp.cos(theta), jnp.sin(theta)
    tprev_re = jnp.zeros_like(mag)
    tprev_im = jnp.zeros_like(mag)
    mom = momentum / (1.0 + momentum)
    for _ in range(n_iter):
        inv = istft_ri(mag * ang_re, mag * ang_im, n_fft, hop, win_size,
                       window=win, length=out_len)
        re, im = stft_ri(inv, n_fft, hop, win_size, window=win)
        re, im = re[..., :T], im[..., :T]
        a_re = re - mom * tprev_re
        a_im = im - mom * tprev_im
        norm = jnp.sqrt(a_re * a_re + a_im * a_im) + 1e-16
        ang_re, ang_im, tprev_re, tprev_im = a_re / norm, a_im / norm, re, im
    return istft_ri(mag * ang_re, mag * ang_im, n_fft, hop, win_size,
                    window=win, length=out_len)


@pytest.mark.parametrize("shape,nfft,hop", [
    ((2, 513, 33), 1024, 256),
    ((257, 17), 512, 128),          # no batch dim
])
def test_frame_domain_matches_time_domain(shape, nfft, hop):
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal(shape)).astype(np.float32))
    fast = gl_mod.griffin_lim(mag, nfft, hop, nfft, n_iter=8)
    ref = _time_domain_gl(mag, nfft, hop, nfft, n_iter=8)
    assert fast.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    assert float(jnp.max(jnp.abs(fast - ref))) / scale < 1e-4


def test_odd_nfft_hop_ratio_uses_time_domain_path():
    """n_fft/hop odd (r=3) breaks the frame-domain chunk algebra (the
    n_fft//2 center crop is not a whole number of hop chunks) — the
    guard must route such shapes to the time-domain loop instead of
    crashing. Regression: n_fft=768/hop=256 raised a concatenate
    shape error inside _roundtrip_frames."""
    from nvse_tpu.ops.griffin_lim import griffin_lim

    mag = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (2, 385, 24)))
    wav = griffin_lim(mag, n_fft=768, hop_size=256, win_size=768, n_iter=2)
    assert wav.shape == (2, 256 * 23)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_explicit_length_crops_final_synthesis_only():
    """torchaudio.GriffinLim semantics: iterations run at the natural
    hop*(T-1) length, `length` crops only the final istft — on BOTH
    paths (the frame-domain one and the odd-ratio time-domain loop).
    Regression: the loop used to istft at the caller length every
    iteration, which crashed on frame-count mismatch for short lengths."""
    from nvse_tpu.ops.griffin_lim import griffin_lim

    for nfft, hop in ((1024, 256), (768, 256)):  # even + odd ratio
        F, T = nfft // 2 + 1, 20
        mag = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (1, F, T)))
        L = hop * (T - 1) - 100
        wav = griffin_lim(mag, n_fft=nfft, hop_size=hop, win_size=nfft,
                          n_iter=2, length=L)
        assert wav.shape == (1, L)
        assert np.all(np.isfinite(np.asarray(wav)))
        # cropping the natural-length output must equal the length= call
        full = griffin_lim(mag, n_fft=nfft, hop_size=hop, win_size=nfft,
                           n_iter=2)
        np.testing.assert_allclose(np.asarray(wav), np.asarray(full)[:, :L],
                                   rtol=1e-5, atol=1e-6)


def test_roundtrip_frames_matches_istft_stft():
    """The single-iteration frame-space operator == istft->stft."""
    rng = np.random.default_rng(1)
    B, F, T, nfft, hop = 2, 513, 21, 1024, 256
    win = hann_window(nfft)
    ri = jnp.asarray(rng.standard_normal((B, T, 2 * F)).astype(np.float32))
    got = gl_mod._roundtrip_frames(ri, nfft, hop, nfft)

    re_in = jnp.swapaxes(ri[..., :F], -1, -2)
    im_in = jnp.swapaxes(ri[..., F:], -1, -2)
    inv = istft_ri(re_in, im_in, nfft, hop, nfft, window=win,
                   length=hop * (T - 1))
    re, im = stft_ri(inv, nfft, hop, nfft, window=win)
    want = jnp.concatenate([jnp.swapaxes(re[..., :T], -1, -2),
                            jnp.swapaxes(im[..., :T], -1, -2)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_griffin_lim_reconstructs_sinusoid():
    """Given the |STFT| of a pure tone, GL audio's |STFT| must match it."""
    sr, nfft, hop = 22050, 1024, 256
    t = np.arange(8192) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    win = hann_window(nfft)
    re, im = stft_ri(jnp.asarray(x)[None], nfft, hop, nfft, window=win)
    mag = jnp.sqrt(re * re + im * im)
    y = gl_mod.griffin_lim(mag, nfft, hop, nfft, n_iter=32)
    re2, im2 = stft_ri(y, nfft, hop, nfft, window=win)
    mag2 = jnp.sqrt(re2 * re2 + im2 * im2)[..., : mag.shape[-1]]
    # edge frames never converge (window taper); interior error ~6% at
    # 32 iters / momentum 0.99 — identical for the classic time-domain
    # loop, so this bounds GL convergence, not the fast path
    d = (mag2 - mag)[..., 4:-4]
    err = float(jnp.linalg.norm(d) / jnp.linalg.norm(mag[..., 4:-4]))
    assert err < 0.10, err


def test_griffin_lim_jittable_and_differentiable():
    rng = np.random.default_rng(2)
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 513, 9))).astype(np.float32))

    @jax.jit
    def f(m):
        return jnp.sum(gl_mod.griffin_lim(m, 1024, 256, 1024, n_iter=2) ** 2)

    g = jax.grad(f)(mag)
    assert np.isfinite(float(f(mag)))
    assert np.all(np.isfinite(np.asarray(g)))
