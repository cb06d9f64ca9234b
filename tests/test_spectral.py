"""Golden tests: nvse_tpu DSP ops vs torch.stft/istft numerics.

The reference computes features with torch.stft / torch.istft
(dataset.py:78-91, Models/bsrnn.py:209-215); these tests pin our JAX ops
to the same semantics on random signals.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from nvse_tpu.ops import (
    amp_pha_spectrum,
    hann_window,
    inverse_mel,
    istft,
    mel_filterbank,
    mel_spectrogram,
    stft,
)

RNG = np.random.default_rng(1234)


def _rand_audio(b=2, L=16384):
    return (RNG.standard_normal((b, L)) * 0.1).astype(np.float32)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (2048, 512, 2048), (512, 128, 512), (16, 4, 16)])
def test_stft_matches_torch(n_fft, hop, win):
    y = _rand_audio(L=4096)
    ours = np.asarray(stft(jnp.asarray(y), n_fft, hop, win, window=hann_window(win)))
    theirs = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True, return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_rect_window_matches_torch():
    # MRD uses window=None (rectangular), reference Models/models.py:367-379
    y = _rand_audio(L=4096)
    ours = np.asarray(stft(jnp.asarray(y), 512, 128, 512, window=None))
    theirs = torch.stft(
        torch.from_numpy(y), 512, hop_length=128, win_length=512,
        window=None, center=True, return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (16, 4, 16)])
def test_istft_matches_torch(n_fft, hop, win):
    y = _rand_audio(L=4096)
    spec_t = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True, return_complex=True,
    )
    theirs = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win),
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec_t.numpy()), n_fft, hop, win, window=hann_window(win)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_stft_istft_roundtrip():
    y = _rand_audio(L=16384)
    spec = stft(jnp.asarray(y), 1024, 256, 1024, window=hann_window(1024))
    rec = np.asarray(istft(spec, 1024, 256, 1024, window=hann_window(1024)))
    L = min(rec.shape[-1], y.shape[-1])
    np.testing.assert_allclose(rec[:, :L], y[:, :L], atol=1e-4)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(22050, 1024, 80, 0, 8000))
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has support and peaks somewhere below fmax bin
    assert (fb.sum(axis=1) > 0).all()
    # filters are ordered by centre frequency
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # Slaney normalisation: peak amplitude decreases with bandwidth overall
    assert fb.max() < 0.11


def test_mel_filterbank_slaney_normalisation():
    """Slaney ('area') norm: each triangle integrates to ~1 over Hz.

    librosa's slaney norm scales filter i by 2/(f_{i+2}-f_i); on a fine
    enough FFT grid the Riemann sum of each interior filter times the bin
    width is therefore ~1. This pins the normalisation convention the
    reference inherits from librosa.filters.mel (dataset.py:73).
    """
    sr, n_fft = 22050, 4096  # fine grid so the Riemann sum is accurate
    fb = np.asarray(mel_filterbank(sr, n_fft, 80, 0, 8000))
    bin_width = sr / n_fft
    areas = fb.sum(axis=1) * bin_width
    # skip the narrowest low filters where discretisation error is larger
    np.testing.assert_allclose(areas[5:], 1.0, rtol=0.05)


def test_mel_spectrogram_shapes_and_range():
    y = _rand_audio(L=16384)
    mel = np.asarray(mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024, 0, 8000))
    assert mel.shape == (2, 80, 16384 // 256 + 1)
    assert np.isfinite(mel).all()
    assert mel.min() >= np.log(1e-5) - 1e-6


def test_inverse_mel_reconstruction():
    """pinv-mel of a mel of a harmonic spectrum approximates the spectrum.

    (White noise would not reconstruct well — 80 mel bins smear its fine
    structure — so use a harmonic signal, the relevant case for speech.)
    """
    t = np.arange(16384) / 22050.0
    y = np.stack([
        np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t),
        np.sin(2 * np.pi * 330 * t) + 0.3 * np.sin(2 * np.pi * 990 * t),
    ]).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024, 0, 8000)
    inv = np.asarray(inverse_mel(mel, 1024, 80, 22050, 256, 1024, 0, 8000))
    spec = np.abs(np.asarray(stft(jnp.asarray(y), 1024, 256, 1024, window=hann_window(1024))))
    assert inv.shape == spec.shape
    # bins covered by the filterbank (fmax=8000 → bin ~372) correlate strongly
    lo = slice(2, 360)
    a, b = inv[:, lo, :].ravel(), spec[:, lo, :].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95


def test_amp_pha_spectrum_matches_torch_formula():
    y = _rand_audio(L=4096)
    la, ph, re, im = amp_pha_spectrum(jnp.asarray(y), 1024, 256, 1024)
    spec = torch.stft(
        torch.from_numpy(y), 1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(la), torch.log(spec.abs() + 1e-7).numpy(), rtol=1e-3, atol=1e-4)
    # phase is ill-conditioned where |S| ~ 0 (atan2 of two tiny numbers);
    # compare only bins with non-negligible energy
    mag = spec.abs().numpy()
    mask = mag > 1e-3 * mag.max()
    ph_ref = torch.atan2(spec.imag, spec.real).numpy()
    # compare as angular distance (phase is 2π-periodic; ±π is the same angle)
    d = np.asarray(ph)[mask] - ph_ref[mask]
    d = np.abs(d - np.round(d / (2 * np.pi)) * 2 * np.pi)
    assert d.max() < 2e-3
    np.testing.assert_allclose(np.asarray(re), spec.real.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), spec.imag.numpy(), rtol=1e-4, atol=1e-4)


def test_mel_gradient_finite_at_silence():
    """Regression: exact-zero spectrum bins must not NaN the mel grad."""
    import jax

    for sig in [np.zeros((1, 2048), np.float32),
                (0.1 * np.sin(np.arange(2048)[None] / 10)).astype(np.float32)]:
        g = jax.grad(
            lambda w: jnp.sum(mel_spectrogram(w, 1024, 80, 22050, 256, 1024, 0, 8000))
        )(jnp.asarray(sig))
        assert bool(jnp.isfinite(g).all())


def test_matmul_dft_path_matches_fft(monkeypatch):
    """The TPU conv-DFT path must match the CPU rfft path exactly."""
    from nvse_tpu.ops import spectral as S

    y = jnp.asarray(_rand_audio(L=4096))
    ref_re, ref_im = S.stft_ri(y, 1024, 256, 1024, window=hann_window(1024))
    rect_re, rect_im = S.stft_ri(y, 512, 128, 512, window=None)
    monkeypatch.setattr(S, "_use_matmul_dft", lambda: True)
    got_re, got_im = S.stft_ri(y, 1024, 256, 1024, window=hann_window(1024))
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im), rtol=1e-4, atol=2e-3)
    g2 = S.stft_ri(y, 512, 128, 512, window=None)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(rect_re), rtol=1e-4, atol=2e-3)
    # istft matmul path
    ref_wav = S.istft_ri(ref_re, ref_im, 1024, 256, 1024, window=hann_window(1024))
    got_wav = S.istft_ri(got_re, got_im, 1024, 256, 1024, window=hann_window(1024))
    np.testing.assert_allclose(np.asarray(got_wav), np.asarray(ref_wav), rtol=1e-4, atol=1e-4)

    # bf16 input (mixed-precision discriminator trunks): the conv kernel
    # must follow the input dtype — conv_general_dilated does not
    # promote, so a f32 kernel raises on TPU. Values only loosely
    # checked (bf16 has ~3 decimal digits).
    y16 = y.astype(jnp.bfloat16)
    b_re, b_im = S.stft_ri(y16, 512, 128, 512, window=None)
    assert b_re.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(b_re, dtype=np.float32), np.asarray(rect_re),
        rtol=0.1, atol=0.5,
    )
