#!/usr/bin/env python
"""Periodicity RMSE / pitch RMSE (cents) / V-UV F1 over decoded wav dirs.

Counterpart of reference Metrics/evaluate.py:35-76 (cargan +
torchcrepe there). With NVSE_CREPE_CKPT pointing at the public
torchcrepe full.pth, pitch/periodicity come from the CREPE network
re-implemented in JAX (nvse_tpu/metrics/crepe_jax.py) on the
reference's scale; without it, YIN pitch + YIN confidence stand in.
Prints all three aggregates like the reference.
    [NVSE_CREPE_CKPT=/path/full.pth] \
        python Metrics/evaluate.py --ref_dir <clean> --deg_dir <decoded>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics.common import run_multi_metric_cli
from nvse_tpu.metrics.dsp import periodicity_metrics

if __name__ == "__main__":
    run_multi_metric_cli(
        {"periodicity_rmse": "Periodicity",
         "pitch_rmse_cents": "Pitch-RMSE (cents)",
         "vuv_f1": "V/UV F1"},
        periodicity_metrics,
        default_sr=22050,
        description="evaluate (periodicity / pitch / V-UV F1)",
    )
