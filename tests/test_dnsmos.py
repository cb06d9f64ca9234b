"""DNSMOS scorer tests: feature math, hop logic, calibration, CSV.

onnxruntime is absent in this environment, so ONNX sessions are faked;
when it is present the last test also loads the reference's real model
assets structurally."""
import csv
import os
import sys
import types

import numpy as np
import pytest

from nvse_tpu.data.audio_io import write_wav
from nvse_tpu.metrics.dnsmos import (
    INPUT_LENGTH,
    SAMPLING_RATE,
    ComputeScore,
    audio_melspec,
    polyfit_val,
)

REF_DNSMOS_DIR = "/root/reference/Metrics/DNSMOS"


class _FakeSession:
    """Mimics ort.InferenceSession.run for both DNSMOS models."""

    def __init__(self, kind):
        self.kind = kind

    def run(self, _outputs, feeds):
        x = feeds["input_1"]
        if self.kind == "p808":
            assert x.ndim == 3 and x.shape[2] == 120, x.shape
            return [np.array([[3.25]], np.float32)]
        assert x.shape == (1, int(INPUT_LENGTH * SAMPLING_RATE)), x.shape
        return [np.array([[3.0, 3.5, 2.8]], np.float32)]


def test_audio_melspec_shape_and_scale():
    rng = np.random.default_rng(0)
    seg = rng.standard_normal(int(INPUT_LENGTH * SAMPLING_RATE) - 160).astype(np.float32)
    feat = audio_melspec(seg)
    assert feat.shape == (900, 120)
    assert np.isfinite(feat).all()
    # power_to_db ref=max then (db+40)/40: max frame is exactly 1.0
    assert feat.max() == pytest.approx(1.0)
    # top_db=80 floor: (-80+40)/40 = -1.0
    assert feat.min() >= -1.0 - 1e-6


def test_polyfit_known_values():
    s, b, o = polyfit_val(3.0, 3.5, 2.8, is_personalized=False)
    assert s == pytest.approx(np.poly1d([-0.08397278, 1.22083953, 0.0052439])(3.0))
    assert b == pytest.approx(np.poly1d([-0.13166888, 1.60915514, -0.39604546])(3.5))
    assert o == pytest.approx(np.poly1d([-0.06766283, 1.11546468, 0.04602535])(2.8))


def _write_tone(path, seconds):
    t = np.arange(int(seconds * SAMPLING_RATE)) / SAMPLING_RATE
    write_wav(str(path), (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
              SAMPLING_RATE)


def test_compute_score_hops_and_fields(tmp_path):
    wav = tmp_path / "x.wav"
    _write_tone(wav, 12.0)
    scorer = ComputeScore(_FakeSession("primary"), _FakeSession("p808"))
    row = scorer(str(wav))
    # 12 s: int(floor(12) - 9.01) + 1 = 3 hops (dnsmos_local.py:62)
    assert row["num_hops"] == 3
    assert row["len_in_sec"] == pytest.approx(12.0, abs=0.01)
    for k in ("SIG_raw", "BAK_raw", "OVRL_raw", "SIG", "BAK", "OVRL", "P808_MOS"):
        assert k in row, k
    assert row["SIG_raw"] == pytest.approx(3.0)
    assert row["P808_MOS"] == pytest.approx(3.25)
    assert row["SIG"] == pytest.approx(polyfit_val(3.0, 3.5, 2.8)[0])


def test_short_audio_is_tiled(tmp_path):
    wav = tmp_path / "short.wav"
    _write_tone(wav, 2.0)  # < 9.01 s -> tiled up, 1 hop
    row = ComputeScore(_FakeSession("primary"), None)(str(wav))
    assert row["num_hops"] >= 1 and "SIG" in row and "P808_MOS" not in row


def test_score_dir_csv(tmp_path, monkeypatch):
    for i in range(2):
        _write_tone(tmp_path / f"c{i}.wav", 10.0)

    fake_ort = types.ModuleType("onnxruntime")
    fake_ort.InferenceSession = lambda path: _FakeSession(
        "p808" if "model_v8" in path else "primary")
    monkeypatch.setitem(sys.modules, "onnxruntime", fake_ort)

    from nvse_tpu.metrics.dnsmos import score_dir

    model_dir = REF_DNSMOS_DIR if os.path.isdir(REF_DNSMOS_DIR) else None
    if model_dir is None:
        pytest.skip("reference DNSMOS assets unavailable")
    out_csv = tmp_path / "out.csv"
    rows = score_dir(str(tmp_path), model_dir, csv_path=str(out_csv))
    assert len(rows) == 2
    with open(out_csv) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 2
    assert {"filename", "SIG", "BAK", "OVRL", "P808_MOS"} <= set(got[0])


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DNSMOS_DIR, "DNSMOS")),
    reason="reference DNSMOS assets unavailable")
def test_real_onnx_models_load():
    ort = pytest.importorskip("onnxruntime")
    sess = ort.InferenceSession(os.path.join(REF_DNSMOS_DIR, "DNSMOS", "sig_bak_ovr.onnx"))
    p808 = ort.InferenceSession(os.path.join(REF_DNSMOS_DIR, "DNSMOS", "model_v8.onnx"))
    scorer = ComputeScore(sess, p808)
    t = np.arange(SAMPLING_RATE * 10) / SAMPLING_RATE
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.wav")
        write_wav(path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                  SAMPLING_RATE)
        row = scorer(path)
    assert np.isfinite(row["OVRL"]) and np.isfinite(row["P808_MOS"])


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DNSMOS_DIR, "DNSMOS")),
    reason="reference DNSMOS assets unavailable")
def test_real_models_score_via_numpy_executor(tmp_path):
    """End-to-end in-env DNSMOS: score_dir on the reference's vendored
    ONNX models WITHOUT onnxruntime — the numpy executor fallback
    (metrics/onnx_np.py) produces calibrated P.835 + P.808 numbers."""
    t = np.arange(SAMPLING_RATE * 10) / SAMPLING_RATE
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    write_wav(str(tmp_path / "a.wav"), wav, SAMPLING_RATE)
    from nvse_tpu.metrics.dnsmos import score_dir
    rows = score_dir(str(tmp_path), REF_DNSMOS_DIR, workers=1)
    assert len(rows) == 1
    r = rows[0]
    for k in ("SIG", "BAK", "OVRL", "P808_MOS"):
        assert k in r and np.isfinite(r[k]) and 0.5 < r[k] < 5.0, (k, r)
