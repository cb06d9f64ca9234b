#!/usr/bin/env python
"""F0 RMSE (YIN pitch, voiced-in-both frames) over decoded wav dirs.

CLI contract matches the reference Metrics/f0_rmse.py:
    python Metrics/f0_rmse.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import f0_rmse

if __name__ == "__main__":
    run_metric_cli("F0-RMSE", f0_rmse, default_sr=22050)
