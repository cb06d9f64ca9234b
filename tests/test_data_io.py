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


def _native_or_skip():
    from nvse_tpu.data import native as nat

    if not nat.available():
        pytest.skip("native lib not built")
    return nat


def test_native_extensible_float_wav(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE float32: the real format code lives in the
    SubFormat GUID — regression: it was forced to PCM and the float bit
    patterns decoded as int32 noise."""
    import struct

    nat = _native_or_skip()
    sr, n = 22050, 1500
    x = (0.4 * np.sin(2 * np.pi * 330 * np.arange(n) / sr)).astype("<f4")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 4) + struct.pack("<H", 3) + b"\x00" * 14
    data = x.tobytes()
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = str(tmp_path / "ext.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    audio, got_sr = nat.read_wav_native(p)
    assert got_sr == sr
    np.testing.assert_allclose(audio[:n], x, atol=1e-6)


def test_native_malformed_headers_fail_gracefully(tmp_path):
    """bits=0 must not SIGFPE; a bogus data size must clamp to the file
    length instead of driving a bad_alloc in a worker thread."""
    import struct

    nat = _native_or_skip()
    sr = 22050
    bad = str(tmp_path / "bad.wav")
    fmt = struct.pack("<HHIIHH", 1, 1, sr, 0, 0, 0)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 100) + b"\x00" * 100
    with open(bad, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    assert nat.read_wav_native(bad) is None

    huge = str(tmp_path / "huge.wav")
    pcm = (np.zeros(200, np.int16)).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0xFFFFFF00) + pcm
    with open(huge, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    got = nat.read_wav_native(huge)
    assert got is not None and got[0].shape == (200,)


def test_short_clip_metrics_degrade_to_nan():
    """Sub-window clips return nan/empty instead of IndexError."""
    from nvse_tpu.metrics.dsp import estoi, stoi, yin_f0, yin_f0_conf

    x = 0.1 * np.random.default_rng(0).standard_normal(900).astype(np.float32)
    assert np.isnan(stoi(x, x, 24000)) and np.isnan(estoi(x, x, 24000))
    assert yin_f0(x, 24000).shape == (0,)
    f0, conf = yin_f0_conf(x, 24000)
    assert f0.shape == (0,) and conf.shape == (0,)


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
