#!/usr/bin/env python
"""Mel-cepstral distortion (SPTK-style mcep, paper scale) over decoded wav dirs.

CLI contract matches the reference Metrics/mcd.py:
    python Metrics/mcd.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.mcep import mcd_sptk as mcd

if __name__ == "__main__":
    run_metric_cli("MCD", mcd, default_sr=22050)
