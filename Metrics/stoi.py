#!/usr/bin/env python
"""STOI / ESTOI intelligibility over decoded wav dirs.

CLI contract matches the reference Metrics/stoi.py:
    python Metrics/stoi.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import estoi, stoi

if __name__ == "__main__":
    extended = "--extended" in sys.argv
    if extended:
        sys.argv.remove("--extended")
    run_metric_cli("ESTOI" if extended else "STOI",
                   estoi if extended else stoi, default_sr=10000)
