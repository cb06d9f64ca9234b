#!/usr/bin/env python
"""F0 RMSE in Hz (DTW-aligned, voiced-in-both frames).

CLI contract matches the reference Metrics/f0_rmse.py:18-131 (WORLD
harvest F0, mcep-DTW aligned, voiced-only RMSE there; WORLD-style
DIO+StoneMask [nvse_tpu/metrics/world_f0.py, paper-scale] + DCT
mel-cepstra + banded DTW here; YIN kept as fallback):
    python Metrics/f0_rmse.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import evaluate_f0_metrics


def _score(ref, deg, sr):
    return evaluate_f0_metrics(ref, deg, sr)["f0_rmse_hz"]


if __name__ == "__main__":
    run_metric_cli("F0-RMSE", _score, default_sr=22050)
