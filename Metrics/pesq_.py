#!/usr/bin/env python
"""PESQ-WB scorer (ITU-T P.862 / P.862.2 MOS-LQO).

CLI contract matches the reference Metrics/pesq_.py:
    python Metrics/pesq_.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]

Uses the `pesq` C extension when installed (bit-exact ITU scoring);
otherwise falls back to the calibrated numpy re-implementation in
nvse_tpu/metrics/pesq.py (same perceptual-model structure; see its
docstring for the documented deviations + MNRU calibration).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    from pesq import pesq as _pesq
except ImportError:
    _pesq = None

from nvse_tpu.metrics.common import run_metric_cli
from nvse_tpu.metrics.pesq import pesq_wb as _pesq_np


def pesq_wb(ref, deg, sr):
    if _pesq is not None:
        return _pesq(sr, ref, deg, "wb")
    return _pesq_np(ref, deg, sr)


if __name__ == "__main__":
    if _pesq is None:
        print("[pesq_] `pesq` C extension not installed -> using the "
              "numpy P.862 fallback (nvse_tpu/metrics/pesq.py)")
    run_metric_cli("PESQ-WB", pesq_wb, default_sr=16000)
