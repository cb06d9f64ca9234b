"""Metric sanity tests: identity scores, degradation ordering, pitch."""
import numpy as np
import pytest

from nvse_tpu.metrics import (estoi, f0_metrics, lsd, mcd, si_snr, snr, stoi,
                              yin_f0)

SR = 22050
RNG = np.random.default_rng(3)


def _speechish(n=SR * 2, f0=150.0):
    """Harmonic signal with slow amplitude modulation (speech-like)."""
    t = np.arange(n) / SR
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    x = np.zeros(n)
    for k in range(1, 8):
        x += np.sin(2 * np.pi * k * f0 * t) / k
    return (0.2 * env * x).astype(np.float32)


def test_snr_identity_and_noise():
    x = _speechish()
    noisy = x + 0.01 * RNG.standard_normal(len(x)).astype(np.float32)
    assert snr(x, x, SR) == np.inf
    s = snr(x, noisy, SR)
    assert 20 < s < 40


def test_si_snr_scale_invariance_and_exact_value():
    x = _speechish()
    # scale invariance: a 0.5x gain kills plain SNR but not SI-SNR
    assert snr(x, 0.5 * x, SR) < 10
    assert si_snr(x, 0.5 * x, SR) > 80
    # exact value on an orthogonal ref/noise pair: whole periods of
    # sin vs cos are orthogonal, so SI-SNR == 10 log10(P_sig/P_noise)
    t = np.arange(SR, dtype=np.float64)
    ref = np.sin(2 * np.pi * 100 * t / SR)
    noise = np.cos(2 * np.pi * 100 * t / SR)
    for target_db in (0.0, 10.0, 25.0):
        g = 10 ** (-target_db / 20.0)
        got = si_snr(ref, ref + g * noise, SR)
        assert abs(got - target_db) < 0.05, (target_db, got)
    # ordering under growing additive noise
    a = si_snr(x, x + 0.001 * RNG.standard_normal(len(x)), SR)
    b = si_snr(x, x + 0.1 * RNG.standard_normal(len(x)), SR)
    assert a > b


def test_lsd_ordering():
    x = _speechish()
    slightly = x + 0.001 * RNG.standard_normal(len(x)).astype(np.float32)
    badly = x + 0.1 * RNG.standard_normal(len(x)).astype(np.float32)
    assert lsd(x, x, SR) < 1e-6
    assert lsd(x, slightly, SR) < lsd(x, badly, SR)


def test_stoi_identity_and_ordering():
    x = _speechish(SR * 3)
    s_self = stoi(x, x, SR)
    assert s_self > 0.99
    noisy = x + 0.05 * RNG.standard_normal(len(x)).astype(np.float32)
    s_noisy = stoi(x, noisy, SR)
    assert 0.1 < s_noisy < s_self
    e_self = estoi(x, x, SR)
    assert 0.95 < e_self <= 1.0 + 1e-9  # bounded correlation mean
    e_noisy = estoi(x, noisy, SR)
    assert -1.0 <= e_noisy < e_self
    # heavy degradation must score clearly below light degradation
    very_noisy = x + 0.5 * RNG.standard_normal(len(x)).astype(np.float32)
    assert estoi(x, very_noisy, SR) < e_noisy
    assert stoi(x, very_noisy, SR) < s_noisy


def test_mcd_identity_and_ordering():
    x = _speechish()
    assert mcd(x, x, SR) < 1e-6
    noisy = x + 0.05 * RNG.standard_normal(len(x)).astype(np.float32)
    assert mcd(x, noisy, SR) > 0.5


def test_yin_pitch_accuracy():
    t = np.arange(SR) / SR
    for f0 in (110.0, 220.0, 330.0):
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        est = yin_f0(x, SR)
        voiced = est[est > 0]
        assert len(voiced) > 0.8 * len(est)
        assert abs(np.median(voiced) - f0) / f0 < 0.02, (f0, np.median(voiced))


def test_f0_metrics_shifted_pitch():
    t = np.arange(SR) / SR
    a = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    b = np.sin(2 * np.pi * 210.0 * t).astype(np.float32)
    m = f0_metrics(a, b, SR)
    assert 5 < m["f0_rmse"] < 20
    m_same = f0_metrics(a, a, SR)
    assert m_same["f0_rmse"] < 1.0
    assert m_same["vuv_error"] < 0.1


def test_dtw_alignment():
    from nvse_tpu.metrics import dtw_path, mcd_dtw
    X = np.random.default_rng(0).standard_normal((30, 4))
    # Y = X with a repeated middle section (time-warped copy)
    Y = np.concatenate([X[:15], X[14:15], X[15:]], axis=0)
    px, py = dtw_path(X, Y)
    assert np.abs(X[px] - Y[py]).max() < 1e-12  # perfect alignment
    x = _speechish()
    assert mcd_dtw(x, x, SR) < 1e-6


def test_periodicity_metrics():
    from nvse_tpu.metrics import periodicity_metrics
    t = np.arange(SR) / SR
    a = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    m = periodicity_metrics(a, a, SR)
    assert m["periodicity_rmse"] < 1e-9
    assert m["vuv_f1"] > 0.95
    assert m["pitch_rmse_cents"] < 1.0
    b = np.sin(2 * np.pi * 233.0 * t).astype(np.float32)  # ~+100 cents
    m2 = periodicity_metrics(a, b, SR)
    assert 60 < m2["pitch_rmse_cents"] < 140


def test_evaluate_f0_metrics_identity_and_shift():
    from nvse_tpu.metrics.dsp import evaluate_f0_metrics

    x = _speechish(f0=180.0)
    m = evaluate_f0_metrics(x, x, SR)
    assert m["log_f0_rmse"] < 1e-6
    assert m["semitone_acc"] > 0.99
    assert m["vuv_error"] < 1e-6
    assert m["f0_rmse_hz"] < 1e-3

    # one-semitone shift: log-F0 RMSE ~ ln(2^(1/12)) = 0.0578, ACC low
    y = _speechish(f0=180.0 * 2 ** (1 / 12))
    m2 = evaluate_f0_metrics(x, y, SR)
    assert 0.03 < m2["log_f0_rmse"] < 0.09, m2
    assert m2["semitone_acc"] < m["semitone_acc"]
    assert m2["f0_rmse_hz"] > 5.0
