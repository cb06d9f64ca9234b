"""Property tests for the ViSQOL-style NSIM/MOS metric.

Google's v3 model files aren't available offline, so — as with the
PESQ tests — these anchor the scorer on behaviour: identity is
near-transparent, MNRU and additive-noise degradations score strictly
worse as they deepen, constant delay and global gain are forgiven, and
the patch NSIM stays in [0, 1].
"""
import numpy as np
import pytest

from nvse_tpu.metrics.pesq import mnru
from nvse_tpu.metrics.visqol import nsim, visqol, visqol_nsim

SR = 16000


@pytest.fixture(scope="module")
def speech():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synth_corpus import synth_utterance
    rng = np.random.default_rng(11)
    return np.concatenate([synth_utterance(rng, SR * 2, SR) for _ in range(2)])


def test_identity_transparent(speech):
    assert visqol_nsim(speech, speech, SR) == pytest.approx(1.0, abs=1e-9)
    assert visqol(speech, speech, SR) > 4.5


def test_mnru_monotone(speech):
    scores = [visqol(speech, mnru(speech, q, rng=np.random.default_rng(1)), SR)
              for q in (45, 30, 15, 5)]
    assert all(a > b for a, b in zip(scores, scores[1:]))
    assert scores[0] > 4.0
    assert scores[-1] < 2.7


def test_additive_noise_monotone(speech):
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(len(speech))
    noise /= np.sqrt((noise ** 2).mean())
    rms = np.sqrt((speech ** 2).mean())
    scores = []
    for snr_db in (35, 20, 5):
        scores.append(visqol(speech, speech + noise * rms * 10 ** (-snr_db / 20), SR))
    assert scores[0] > scores[1] > scores[2]


def test_delay_and_gain_forgiven(speech):
    # 100 ms delay (5 frames) and -6 dB gain: patch alignment + RMS
    # equalisation should keep the score near-transparent
    shifted = np.concatenate([np.zeros(SR // 10), speech * 0.5])
    assert visqol(speech, shifted, SR) > 4.2


def test_nsim_range_and_selfsim():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((21, 30)) * 10 - 60
    b = rng.standard_normal((21, 30)) * 10 - 60
    assert nsim(a, a) == pytest.approx(1.0, abs=1e-12)
    assert -1.0 <= nsim(a, b) <= 1.0


def test_sample_rate_invariance(speech):
    # scoring the same pair presented at 22.05 kHz should agree with
    # native 16 kHz to within the resampler's error
    from scipy.signal import resample_poly
    up = resample_poly(speech, 22050 // 150, 16000 // 150)
    s16 = visqol(speech, speech, SR)
    s22 = visqol(up, up, 22050)
    assert abs(s16 - s22) < 0.2
