"""Host IO + loader regressions: stereo decode, cache bound, thread
determinism, bf16 kernels for the sinc/CQT convs, window=None parity."""
import os
import random
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.data.audio_io import read_wav
from nvse_tpu.data.dataset import PrefetchLoader, SegmentDataset


def _write_stereo(path, sr=22050, n=2000):
    t = np.arange(n) / sr
    left = (0.5 * np.sin(2 * np.pi * 220 * t) * 32767).astype("<i2")
    right = (0.25 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())


def test_stereo_wav_downmixes(tmp_path):
    """Interleaved multi-channel PCM must de-interleave then downmix —
    regression: the stdlib path returned 2N interleaved samples."""
    p = str(tmp_path / "st.wav")
    _write_stereo(p, n=2000)
    data, sr = read_wav(p)
    assert data.shape == (2000,)
    t = np.arange(2000) / sr
    want = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.25 * np.sin(2 * np.pi * 440 * t)) / 2
    assert np.max(np.abs(data - want)) < 1e-3


def _mono_corpus(tmp_path, n_files=6, n=4000, sr=22050):
    from nvse_tpu.data.audio_io import write_wav

    files = []
    for i in range(n_files):
        t = np.arange(n + 517 * i) / sr
        p = str(tmp_path / f"m{i}.wav")
        write_wav(p, 0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t), sr)
        files.append(p)
    return files


def test_wav_cache_byte_bound(tmp_path):
    files = _mono_corpus(tmp_path)
    ds = SegmentDataset(files, 1024, 22050, cache_bytes=2 * 4096 * 4)
    for i in range(len(ds)):
        ds[i]
    assert ds._cache_bytes <= 2 * 4096 * 4
    assert len(ds._cache) < len(files)


def test_prefetch_fallback_deterministic(tmp_path):
    """Python-fallback crops must not depend on worker-thread scheduling:
    two loaders with the same seed yield identical batch streams."""
    files = _mono_corpus(tmp_path)

    def run():
        ds = SegmentDataset(files, 1024, 22050, seed=7)
        ld = PrefetchLoader(ds, batch_size=2, num_workers=4, seed=7,
                            use_native=False)
        return [b.copy() for b in ld]

    a, b = run(), run()
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_resample_cqt_accept_bf16():
    """Sinc resample + CQT kernels must follow the input dtype
    (compute_dtype=bfloat16 trunks crash otherwise)."""
    from nvse_tpu.ops.cqt import cqt
    from nvse_tpu.ops.resample import downsample2, upsample2

    x = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal((2, 512)),
                    jnp.bfloat16)
    up = upsample2(x)
    assert up.dtype == jnp.bfloat16 and up.shape[-1] == 1024
    dn = downsample2(up)
    assert dn.dtype == jnp.bfloat16
    re, im = cqt(x.astype(jnp.bfloat16), 22050, 256, 48, 24)
    assert np.all(np.isfinite(np.asarray(re, np.float32)))


def test_stft_window_none_matches_torch():
    """window=None == ones(win_length) zero-padded to n_fft in torch —
    differs from ones(n_fft) whenever win_size < n_fft."""
    torch = pytest.importorskip("torch")
    from nvse_tpu.ops.spectral import stft_ri

    x = 0.2 * np.random.default_rng(1).standard_normal(3000).astype(np.float32)
    n_fft, hop, win = 512, 128, 256
    re, im = stft_ri(jnp.asarray(x[None]), n_fft, hop, win)
    spec = torch.stft(torch.from_numpy(x[None]), n_fft, hop, win_length=win,
                      return_complex=True, center=True)
    np.testing.assert_allclose(np.asarray(re)[0], spec.real.numpy()[0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im)[0], spec.imag.numpy()[0],
                               rtol=1e-4, atol=1e-4)
