"""Weight-drop readiness: "drop the file and it scores" (pytest -m weights).

The two learned metrics (UTMOS, CREPE periodicity) and the torch
generator import path are fully implemented and parity-tested on random
weights (tests/test_utmos.py, tests/test_crepe_jax.py,
tests/test_torch_parity.py), but the public weight files do not exist
in this offline environment. These tests are the end-to-end contracts
that activate the moment the files are dropped in:

    NVSE_UTMOS_CKPT    the UTMOS strong-learner lightning checkpoint
                       (epoch=3-step=7459.ckpt from
                       huggingface.co/spaces/sarulab-speech/UTMOS-demo;
                       reference Metrics/utmos.py:54-157 auto-downloads it)
    NVSE_CREPE_CKPT    torchcrepe's full.pth (+ NVSE_CREPE_MODEL=full);
                       reference scores periodicity via torchcrepe
                       (Metrics/evaluate.py:35-76)
    NVSE_REF_GEN_CKPT  a reference torch generator checkpoint (g_* file,
                       torch.save'd {"generator": state_dict},
                       reference utils.py:59-62)
    NVSE_REF_GEN_CFG   config json matching that checkpoint's model
                       family (default: the flagship BSRNN config)

Run:  pytest -m weights tests/test_weights_drop.py
Each test auto-skips when its file is absent, so the tier is safe to
include in any run.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.weights

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_UTMOS = os.environ.get("NVSE_UTMOS_CKPT", "")
_CREPE = os.environ.get("NVSE_CREPE_CKPT", "")
_REF_GEN = os.environ.get("NVSE_REF_GEN_CKPT", "")
_REF_CFG = os.environ.get(
    "NVSE_REF_GEN_CFG",
    os.path.join(REPO, "nvse_tpu", "configs", "bsrnn_config.json"))


def _speechlike(sr: int, seconds: float = 2.0, seed: int = 0) -> np.ndarray:
    """Harmonic + noise test signal with a pitch glide (voiced-ish)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f0 = 160.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = sum((0.4 / k) * np.sin(k * phase) for k in range(1, 5))
    wav += 0.01 * rng.standard_normal(len(t))
    env = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (seconds - t))
    return (0.5 * wav * env / np.max(np.abs(wav))).astype(np.float32)


@pytest.mark.skipif(not os.path.exists(_UTMOS),
                    reason="NVSE_UTMOS_CKPT not set / file absent")
def test_utmos_real_ckpt_scores(tmp_path):
    """The real lightning checkpoint loads through both backends and
    produces a sane absolute MOS (1..5) with torch-vs-jax agreement."""
    from nvse_tpu.data.audio_io import write_wav
    from nvse_tpu.metrics import utmos_jax, utmos_torch

    sr = 16000
    d = tmp_path / "clips"
    d.mkdir()
    for i in range(2):
        write_wav(str(d / f"c{i}.wav"), _speechlike(sr, seed=i), sr)

    mean_t, std_t = utmos_torch.score_dir(str(d), _UTMOS, sr=sr)
    assert 1.0 <= mean_t <= 5.0 and np.isfinite(std_t)

    mean_j, _ = utmos_jax.score_dir(str(d), _UTMOS, sr=sr)
    assert abs(mean_j - mean_t) < 0.05, (mean_j, mean_t)


@pytest.mark.skipif(not os.path.exists(_CREPE),
                    reason="NVSE_CREPE_CKPT not set / file absent")
def test_crepe_real_ckpt_tracks_pitch():
    """Real CREPE weights must actually track a 220 Hz tone (random
    weights would not) — the end-to-end pitch path of the reference's
    periodicity metric (Metrics/evaluate.py:35-76)."""
    from nvse_tpu.metrics.crepe_jax import predict_f0

    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    f0, pd = predict_f0(wav, sr)
    voiced = pd > 0.5
    assert voiced.mean() > 0.8
    med = float(np.median(f0[voiced]))
    assert abs(med - 220.0) < 10.0, med


@pytest.mark.skipif(not os.path.exists(_REF_GEN),
                    reason="NVSE_REF_GEN_CKPT not set / file absent")
def test_reference_generator_ckpt_end_to_end(tmp_path):
    """Reference torch g_* checkpoint -> import_torch_checkpoint ->
    InferenceEngine decode -> plausible audio. The numeric mapping is
    already parity-tested per family against independent torch oracles
    (tests/test_torch_parity.py); this proves the full drop-in pipeline
    on the real file."""
    import json

    bundle = tmp_path / "g_imported"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_torch_checkpoint.py"),
         "--cfg_filename", _REF_CFG, "--torch_ckpt", _REF_GEN,
         "--out", str(bundle)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    from nvse_tpu.infer.engine import InferenceEngine
    from nvse_tpu.utils import load_config

    h = load_config(_REF_CFG)
    h["checkpoint_file_load"] = str(bundle)
    engine = InferenceEngine(h)

    import jax.numpy as jnp

    wav_in = _speechlike(h.sampling_rate, seconds=1.0)
    mel = engine.mel_of(wav_in)
    wav = np.asarray(engine.synthesize_mel(jnp.asarray(mel)))[0]
    assert np.all(np.isfinite(wav))
    rms = float(np.sqrt(np.mean(wav ** 2)))
    # a trained vocoder reconstructs speech-level energy, not silence
    # or clipping noise
    assert 1e-3 < rms < 1.0, rms
