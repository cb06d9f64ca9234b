#!/usr/bin/env python
"""ViSQOL-style speech MOS (NSIM on gammatone spectrograms).

The reference paper's Table III reports VISQOL (SURVEY.md §6) but the
reference repo ships no CLI for it; this one follows the same contract
as its other metric CLIs:
    python Metrics/visqol_.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
Scores with the in-repo re-implementation (nvse_tpu/metrics/visqol.py —
see its docstring for documented deviations from Google's v3 binary).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.visqol import visqol

if __name__ == "__main__":
    run_metric_cli("ViSQOL (MOS-LQO)", visqol, default_sr=16000)
