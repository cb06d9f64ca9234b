#!/usr/bin/env python
"""log-F0 RMSE + semitone accuracy + V/UV error rate (DTW-aligned).

CLI contract matches the reference Metrics/evaluate_f0.py (which prints
all three aggregates, evaluate_f0.py:389-396):
    python Metrics/evaluate_f0.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]

Pitch is the WORLD-style DIO+StoneMask estimator
(nvse_tpu/metrics/world_f0.py; YIN fallback), alignment is banded DTW
on DCT mel-cepstra (the reference uses WORLD harvest + SPTK mcep +
fastdtw).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_multi_metric_cli
from nvse_tpu.metrics.dsp import evaluate_f0_metrics

if __name__ == "__main__":
    run_multi_metric_cli(
        {"log_f0_rmse": "log_F0-RMSE",
         "semitone_acc": "Semitone_ACC %",
         "vuv_error": "VUV_ERROR %"},
        evaluate_f0_metrics,
        default_sr=22050,
        description="evaluate_f0 (log-F0 RMSE / semitone ACC / VUV error)",
    )
