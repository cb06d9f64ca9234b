#!/usr/bin/env python
"""Log-spectral distance (LAS-RMSE) over decoded wav dirs.

CLI contract matches the reference Metrics/lsd.py:
    python Metrics/lsd.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import lsd

if __name__ == "__main__":
    run_metric_cli("LSD", lsd, default_sr=22050)
