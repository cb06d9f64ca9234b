#!/usr/bin/env python
"""DTW-aligned SPTK-style mcep MCD (reference Metrics/mcd_utils.py contract).

    python Metrics/mcd_dtw.py --ref_dir <clean> --deg_dir <decoded>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.mcep import mcd_sptk_dtw as mcd_dtw

if __name__ == "__main__":
    run_metric_cli("MCD-DTW", mcd_dtw, default_sr=22050)
