"""Tests for the WORLD-style DIO+StoneMask F0 estimator.

Anchors from first principles (exact F0 on synthetic tones), the
YIN-vs-DIO cross-check the VERDICT asked for (agreement within a few
Hz on voiced synth-corpus frames), and wiring checks (extract_f0
dispatch + drop-in frame grid).
"""
import numpy as np
import pytest

from nvse_tpu.metrics.dsp import extract_f0, yin_f0
from nvse_tpu.metrics.world_f0 import dio_f0

SR = 22050


def _tone(f, sec=1.5, sr=SR):
    t = np.arange(int(sec * sr)) / sr
    return np.sin(2 * np.pi * f * t)


@pytest.mark.parametrize("f", [80.0, 132.5, 220.0, 317.0, 450.0])
def test_pure_tone_exact(f):
    f0 = dio_f0(_tone(f), SR)
    v = f0 > 0
    assert v.mean() > 0.9
    assert np.median(f0[v]) == pytest.approx(f, rel=5e-3)


def test_harmonic_rich_no_octave_error():
    t = np.arange(SR * 2) / SR
    x = sum(np.sin(2 * np.pi * 150 * k * t) / k for k in range(1, 8))
    f0 = dio_f0(x, SR)
    v = f0 > 0
    assert np.median(f0[v]) == pytest.approx(150.0, rel=5e-3)
    # no frame locked onto a harmonic or subharmonic
    assert (np.abs(f0[v] - 150.0) < 15).mean() > 0.95


def test_silence_and_noise_unvoiced():
    rng = np.random.default_rng(0)
    assert (dio_f0(np.zeros(SR), SR) == 0).all()
    noise = rng.standard_normal(SR)
    assert (dio_f0(noise, SR) > 0).mean() < 0.3


def test_yin_dio_crosscheck_on_synth_corpus():
    """VERDICT r2 'done' criterion: the two extractors agree within a
    few Hz on voiced frames of the synthetic corpus."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synth_corpus import synth_utterance
    rng = np.random.default_rng(11)
    medians = []
    for _ in range(4):
        x = synth_utterance(rng, SR * 2, SR)
        d = dio_f0(x, SR)
        y = yin_f0(x, SR)
        n = min(len(d), len(y))
        both = (d[:n] > 0) & (y[:n] > 0)
        assert both.mean() > 0.5
        medians.append(np.median(np.abs(d[:n][both] - y[:n][both])))
    assert np.median(medians) < 3.0  # Hz


def test_frame_grid_matches_yin():
    x = _tone(200, sec=2.0)
    assert len(dio_f0(x, SR)) == len(yin_f0(x, SR))


def test_extract_f0_dispatch():
    x = _tone(200)
    d = extract_f0(x, SR, "dio")
    y = extract_f0(x, SR, "yin")
    assert np.median(d[d > 0]) == pytest.approx(200, rel=5e-3)
    assert np.median(y[y > 0]) == pytest.approx(200, rel=2e-2)


def test_vibrato_tracking():
    """StoneMask refinement should track a +-3% 5 Hz vibrato."""
    t = np.arange(SR * 2) / SR
    inst = 200.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
    x = np.sin(2 * np.pi * np.cumsum(inst) / SR)
    f0 = dio_f0(x, SR)
    v = f0 > 0
    assert f0[v].max() > 203.0 and f0[v].min() < 197.0
