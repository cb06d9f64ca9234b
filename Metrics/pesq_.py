#!/usr/bin/env python
"""PESQ-WB via the `pesq` C extension (if installed).

CLI contract matches the reference Metrics/pesq_.py:
    python Metrics/pesq_.py --ref_dir <clean_dir> --deg_dir <decoded_dir> [--sr N] [--jb N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    from pesq import pesq as _pesq
except ImportError:
    _pesq = None

from nvse_tpu.metrics.common import run_metric_cli


def pesq_wb(ref, deg, sr):
    if _pesq is None:
        raise SystemExit(
            "the `pesq` package (C extension) is not installed in this "
            "environment; install it to score PESQ, or use Metrics/stoi.py "
            "/ Metrics/lsd.py for reference-free-ish quality proxies"
        )
    return _pesq(sr, ref, deg, "wb")


if __name__ == "__main__":
    run_metric_cli("PESQ-WB", pesq_wb, default_sr=16000)
