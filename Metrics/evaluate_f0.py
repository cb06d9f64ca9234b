#!/usr/bin/env python
"""V/UV error rate + semitone accuracy (YIN pitch).

CLI contract matches the reference Metrics/evaluate_f0.py:
    python Metrics/evaluate_f0.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import f0_metrics


def vuv_error(ref, deg, sr):
    return f0_metrics(ref, deg, sr)["vuv_error"]


if __name__ == "__main__":
    run_metric_cli("VUV-error", vuv_error, default_sr=22050)
