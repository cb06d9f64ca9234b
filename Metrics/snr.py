#!/usr/bin/env python
"""Mean-removed SNR over decoded wav dirs.

CLI contract matches the reference Metrics/snr.py:
    python Metrics/snr.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import snr

if __name__ == "__main__":
    run_metric_cli("SNR", snr, default_sr=22050)
