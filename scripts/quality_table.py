#!/usr/bin/env python
"""Render QUALITY_r3.json records as a markdown table.

    python scripts/quality_table.py [--json QUALITY_r3.json] [--match _large]

Used to keep the QUALITY.md summary tables in sync with the
machine-readable records (one row per scored run).
"""
import argparse
import json

COLS = [
    ("pesq", "PESQ ↑"),
    ("stoi", "STOI ↑"),
    ("estoi", "ESTOI ↑"),
    ("lsd", "LSD ↓"),
    ("mcd_sptk", "MCD-SPTK ↓"),
    ("mcd_sptk_dtw", "MCD-SPTK-DTW ↓"),
    ("f0_rmse_hz", "F0-RMSE (Hz) ↓"),
    ("semitone_acc", "semitone ACC ↑"),
    ("vuv_error", "V/UV err ↓"),
    ("visqol", "ViSQOL ↑"),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--json", default="QUALITY_r3.json")
    p.add_argument("--match", default="")
    args = p.parse_args()

    rows = json.load(open(args.json))
    rows = [r for r in rows if args.match in r.get("label", "")]
    print("| run | " + " | ".join(t for _, t in COLS) + " |")
    print("|---" * (len(COLS) + 1) + "|")
    for r in rows:
        cells = []
        for k, _ in COLS:
            v = r.get(k)
            cells.append(f"{v:.3f}" if isinstance(v, (int, float)) else "—")
        print(f"| {r['label']} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
