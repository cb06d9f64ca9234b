#!/usr/bin/env python
"""DNSMOS P.835 (SIG/BAK/OVRL) + P.808 MOS scorer over a wav directory.

CLI contract matches the reference Metrics/DNSMOS/dnsmos_local.py:
    python Metrics/dnsmos.py --deg_dir <dir> [-o out.csv] [-p] \
        [--model_dir <dir with DNSMOS/sig_bak_ovr.onnx + model_v8.onnx>]

Scoring logic lives in nvse_tpu/metrics/dnsmos.py (9.01 s hops, raw +
polynomial-calibrated SIG/BAK/OVRL, P.808 MOS from log-mel features,
per-file CSV). Executes the Microsoft DNS-Challenge ONNX models with
onnxruntime when installed, else with the built-in numpy ONNX executor
(nvse_tpu/metrics/onnx_np.py) — no extra dependency needed. The model
files themselves (DNSMOS/sig_bak_ovr.onnx, DNSMOS/model_v8.onnx — ONNX
assets, not code) are vendored by the reference at Metrics/DNSMOS/; set
--model_dir (or NVSE_DNSMOS_DIR) to wherever they live.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deg_dir", "-t", required=True,
                   help="dir of wav clips to be evaluated")
    p.add_argument("--model_dir",
                   default=os.environ.get(
                       "NVSE_DNSMOS_DIR",
                       os.path.join(os.path.dirname(__file__), "DNSMOS")),
                   help="dir containing DNSMOS/sig_bak_ovr.onnx, "
                        "DNSMOS/model_v8.onnx (and pDNSMOS/ for -p) — "
                        "defaults to $NVSE_DNSMOS_DIR, else Metrics/DNSMOS "
                        "(the reference's vendored layout)")
    p.add_argument("--csv_path", "-o", default=None,
                   help="write per-file results to this CSV")
    p.add_argument("--personalized_MOS", "-p", action="store_true",
                   help="use the personalized (pDNSMOS) calibration/model")
    p.add_argument("--jb", type=int, default=1,
                   help="process fan-out: score clips with this many "
                        "worker processes (same contract as the other "
                        "metric CLIs; the numpy ONNX executor is "
                        "single-core, so --jb N is ~N x faster on "
                        "fleet-size sweeps)")
    args = p.parse_args()

    from nvse_tpu.metrics.dnsmos import score_dir

    rows = score_dir(args.deg_dir, args.model_dir, csv_path=args.csv_path,
                     is_personalized=args.personalized_MOS, jobs=args.jb)
    if not rows:
        raise SystemExit(f"no wav files under {args.deg_dir}")

    def agg(key):
        vals = [r[key] for r in rows if key in r]
        return (np.mean(vals), np.std(vals)) if vals else None

    parts = [f"DNSMOS: {len(rows)} files"]
    for key in ("SIG", "BAK", "OVRL", "P808_MOS"):
        a = agg(key)
        if a:
            parts.append(f"{key} {a[0]:.3f}±{a[1]:.3f}")
    print(" | ".join(parts))
    if args.csv_path:
        print(f"per-file results -> {args.csv_path}")


if __name__ == "__main__":
    main()
