#!/usr/bin/env python
"""Mean-removed SNR over decoded wav dirs.

CLI contract matches the reference Metrics/snr.py:
    python Metrics/snr.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]

Extra (not in the reference): pass --si to score scale-invariant SNR
(SI-SDR) instead — the fair variant for resynthesis-style enhancers
whose output loudness is not sample-locked to the reference.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.dsp import si_snr, snr

if __name__ == "__main__":
    if "--si" in sys.argv:
        sys.argv.remove("--si")
        run_metric_cli("SI-SNR", si_snr, default_sr=22050)
    else:
        run_metric_cli("SNR", snr, default_sr=22050)
