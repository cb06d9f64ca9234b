"""Tests for nvse_tpu.metrics.f0_lib — the Metrics/f0/f0.py counterpart."""
import numpy as np
import pytest

from nvse_tpu.metrics import f0_lib
from nvse_tpu.utils.config import AttrDict


SR = 22050


def _cfg(**kw):
    d = dict(sample_rate=SR, hop_size=256, win_size=1024,
             f0_min=60.0, f0_max=500.0, pitch_bin=256,
             pitch_extractor="dio")
    d.update(kw)
    return AttrDict(d)


def _tone(freq, dur=1.0, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return 0.5 * np.sin(2 * np.pi * freq * t)


def test_interpolate_fills_gaps_and_erodes_uv():
    f0 = np.array([0, 0, 100, 0, 0, 0, 120, 0, 0], dtype=float)
    filled, uv = f0_lib.interpolate(f0)
    assert (filled > 0).all()
    # interior gap linearly interpolated between 100 and 120
    np.testing.assert_allclose(filled[3:6], [105, 110, 115])
    assert uv.shape == f0.shape
    # frames adjacent to voiced anchors are eroded out of the uv mask
    assert uv[2] == 0 and uv[6] == 0


def test_get_log_f0_maps_unvoiced_to_zero():
    out = f0_lib.get_log_f0(np.array([0.0, np.e, np.e ** 2]))
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0], atol=1e-12)


def test_f0_to_coarse_bounds_and_monotone():
    f0 = np.array([0.0, 60.0, 120.0, 240.0, 480.0, 500.0])
    idx = f0_lib.f0_to_coarse(f0, 256, 60.0, 500.0)
    assert idx.min() >= 1 and idx.max() <= 255
    assert (np.diff(idx[1:]) > 0).all()  # strictly increasing on voiced


def test_get_bin_index_numpy_contract():
    f0 = np.array([0.0, 60.0, 250.0, 500.0, 700.0])
    idx = f0_lib.get_bin_index(f0, 60.0, 500.0, 64, use_log_scale=False)
    assert idx[0] == 0            # unvoiced -> 0
    assert idx[1] == 1            # floor of range -> first voiced bin
    assert idx[4] == 63           # above ceiling -> clamped to top
    assert 1 <= idx[2] < idx[3] <= 63


def test_cents_and_derivatives():
    cents = f0_lib.get_cents(np.array([440.0, 880.0, 0.0, 220.0]))
    np.testing.assert_allclose(cents, [0.0, 1200.0, -1200.0], atol=1e-9)
    deriv = f0_lib.get_pitch_derivatives(np.array([440.0, 880.0]))
    np.testing.assert_allclose(deriv, [1200.0], atol=1e-9)
    centered = f0_lib.get_pitch_sub_median(np.array([440.0, 440.0, 880.0]))
    np.testing.assert_allclose(np.median(centered), 0.0, atol=1e-9)


@pytest.mark.parametrize("extractor", ["dio", "pyin", "parselmouth"])
def test_get_f0_dispatch_recovers_tone(extractor):
    audio = _tone(220.0)
    f0 = f0_lib.get_f0(audio, _cfg(pitch_extractor=extractor))
    voiced = f0[f0 > 0]
    assert voiced.size > 0.5 * f0.size
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_parselmouth_returns_coarse_track():
    audio = _tone(150.0)
    f0, coarse = f0_lib.get_f0_features_using_parselmouth(audio, _cfg())
    assert f0.shape == coarse.shape
    assert coarse.min() >= 1 and coarse.max() <= 255


def test_parselmouth_silence_is_unvoiced():
    rng = np.random.default_rng(0)
    noise = 1e-4 * rng.standard_normal(SR // 2)
    f0, _ = f0_lib.get_f0_features_using_parselmouth(noise, _cfg())
    assert (f0 == 0).mean() > 0.9


def test_harvest_signature_trims_to_mel_len():
    audio = _tone(180.0)
    f0 = f0_lib.get_f0_features_using_harvest(audio, 40, SR, 256, 60.0, 500.0)
    assert f0.shape == (40,)
    voiced = f0[f0 > 0]
    assert abs(np.median(voiced) - 180.0) < 5.0


def test_crepe_contract_interpolates_onto_mel_grid():
    audio = _tone(200.0)
    mel_len = len(audio) // 256
    f0 = f0_lib.get_f0_features_using_crepe(
        audio, mel_len, SR, 256, 80, 60.0, 500.0)
    assert f0.shape == (mel_len,)
    assert abs(np.median(f0[f0 > 0]) - 200.0) < 8.0


def test_metrics_f0_shim_imports():
    import importlib
    mod = importlib.import_module("Metrics.f0.f0")
    assert mod.get_f0 is f0_lib.get_f0
