#!/usr/bin/env python
"""Decode a test set with a trained checkpoint and score it vs ground truth.

The quality half of the BASELINE north star (BASELINE.md): decode the
config's test filelist with the latest checkpoint in h.checkpoint_path
(or h.checkpoint_file_load) and report LSD / STOI / ESTOI / MCD / SNR /
log-F0-RMSE / semitone-ACC / V-UV error against the reference wavs.

    python scripts/quality_eval.py --cfg_filename <cfg.json> \
        [--out QUALITY.json] [--label bsrnn_3k]

Writes one JSON record per invocation (appended if --out exists).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", required=True)
    p.add_argument("--out", default=None, help="append JSON record here")
    p.add_argument("--label", default="run")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--skip_decode", action="store_true",
                   help="score an existing test_output_dir only")
    args = p.parse_args()

    from nvse_tpu.data.audio_io import load_wav
    from nvse_tpu.infer import run_inference
    from nvse_tpu.infer.engine import resolve_filelist
    from nvse_tpu.metrics import (estoi, evaluate_f0_metrics, lsd, mcd,
                                  mcd_dtw, mcd_sptk, mcd_sptk_dtw, pesq_wb,
                                  snr, stoi, visqol)
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    stats = {"rtf": None}
    if not args.skip_decode:
        stats = run_inference(h, limit=args.limit)

    files = resolve_filelist(h)
    if args.limit:
        files = files[: args.limit]
    sr = h.sampling_rate

    per_metric: dict[str, list[float]] = {}
    for ref_path in files:
        deg_path = os.path.join(h.test_output_dir, os.path.basename(ref_path))
        if not os.path.exists(deg_path):
            continue
        ref = load_wav(ref_path, sr)
        deg = load_wav(deg_path, sr)
        n = min(len(ref), len(deg))
        ref, deg = ref[:n], deg[:n]
        scores = {
            "pesq": pesq_wb(ref, deg, sr),
            "lsd": lsd(ref, deg, sr),
            "stoi": stoi(ref, deg, sr),
            "estoi": estoi(ref, deg, sr),
            "mcd": mcd(ref, deg, sr),
            "mcd_dtw": mcd_dtw(ref, deg, sr),
            "mcd_sptk": mcd_sptk(ref, deg, sr),
            "mcd_sptk_dtw": mcd_sptk_dtw(ref, deg, sr),
            "snr": snr(ref, deg, sr),
            "visqol": visqol(ref, deg, sr),
        }
        scores.update(evaluate_f0_metrics(ref, deg, sr))
        for k, v in scores.items():
            if np.isfinite(v):
                per_metric.setdefault(k, []).append(float(v))

    record = {
        "label": args.label,
        "model": h.model_name,
        "files": len(files),
        "rtf": stats.get("rtf"),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    for k, vals in sorted(per_metric.items()):
        record[k] = round(float(np.mean(vals)), 4)
        record[k + "_std"] = round(float(np.std(vals)), 4)

    print(json.dumps(record, indent=2))
    if args.out:
        rows = []
        if os.path.exists(args.out):
            rows = json.load(open(args.out))
        rows.append(record)
        json.dump(rows, open(args.out, "w"), indent=2)
        print(f"appended -> {args.out}")


if __name__ == "__main__":
    main()
