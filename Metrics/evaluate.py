#!/usr/bin/env python
"""Periodicity RMSE / pitch RMSE (cents) / V-UV F1 over decoded wav dirs.

Counterpart of reference Metrics/evaluate.py (which uses cargan +
torchcrepe); here pitch and periodicity come from YIN.
    python Metrics/evaluate.py --ref_dir <clean> --deg_dir <decoded>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import periodicity_metrics


def _score(ref, deg, sr):
    return periodicity_metrics(ref, deg, sr)["periodicity_rmse"]


if __name__ == "__main__":
    run_metric_cli("Periodicity-RMSE", _score, default_sr=22050)
