"""Shared harness for offline metric CLIs.

Replicates the reference Metrics/* CLI contract (SURVEY.md §2.7,
Metrics/pesq_.py:58-100): pair every wav in --deg_dir with the matching
basename under --ref_dir (searched up to 4 directory levels deep), score
pairs with a process pool, print mean/std.
"""
from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
from typing import Callable

import numpy as np

from ..data.audio_io import load_wav


def build_pair_map(ref_dir: str, deg_dir: str) -> list[tuple[str, str]]:
    deg_files = sorted(glob.glob(os.path.join(deg_dir, "*.wav")))
    ref_map = {}
    for depth in range(1, 5):
        for p in glob.glob(os.path.join(ref_dir, *(["*"] * (depth - 1)), "*.wav")):
            ref_map.setdefault(os.path.basename(p), p)
    pairs = []
    for d in deg_files:
        r = ref_map.get(os.path.basename(d))
        if r is not None:
            pairs.append((r, d))
    return pairs


def _score_chunk(args):
    fn, pairs, sr = args
    out = []
    for r, d in pairs:
        try:
            ref = load_wav(r, sr)
            deg = load_wav(d, sr)
            n = min(len(ref), len(deg))
            out.append(fn(ref[:n], deg[:n], sr))
        except Exception as e:  # mirror reference behaviour: skip bad pairs
            print(f"skip {os.path.basename(d)}: {e}")
    return out


def _score_pairs_pool(score_fn: Callable, default_sr: int,
                      description: str) -> list:
    """Shared CLI scaffolding: parse --ref_dir/--deg_dir/--sr/--jb,
    build the pair map, score with a process pool, return flat results."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--ref_dir", required=True)
    p.add_argument("--deg_dir", required=True)
    p.add_argument("--sr", type=int, default=default_sr)
    p.add_argument("--jb", type=int, default=16, help="parallel jobs")
    args = p.parse_args()

    pairs = build_pair_map(args.ref_dir, args.deg_dir)
    if not pairs:
        raise SystemExit("no ref/deg pairs found")
    chunks = [c for c in np.array_split(pairs, args.jb) if len(c)]
    with mp.Pool(processes=len(chunks)) as pool:
        results = pool.map(_score_chunk, [(score_fn, list(c), args.sr) for c in chunks])
    return [r for chunk in results for r in chunk]


def run_metric_cli(name: str, score_fn: Callable, default_sr: int = 16000,
                   description: str = "") -> None:
    scores = np.array(_score_pairs_pool(score_fn, default_sr, description or name),
                      dtype=np.float64)
    scores = scores[np.isfinite(scores)]
    print(f"{name}: {len(scores)} pairs | mean {scores.mean():.4f} | std {scores.std():.4f}")


def run_multi_metric_cli(outputs: dict, score_fn: Callable,
                         default_sr: int = 16000, description: str = "") -> None:
    """Like run_metric_cli but score_fn returns a dict per pair.

    `outputs` maps result keys -> printed label; labels ending in '%'
    are scaled x100 (the reference prints semitone ACC / VUV error as
    percentages, evaluate_f0.py:389-396).
    """
    rows = _score_pairs_pool(score_fn, default_sr, description)
    print(f"{description or 'metrics'}: {len(rows)} pairs")
    for key, label in outputs.items():
        vals = np.array([r[key] for r in rows], dtype=np.float64)
        vals = vals[np.isfinite(vals)]
        if not len(vals):
            print(f"  {label}: n/a")
        elif label.endswith("%"):
            print(f"  {label[:-1].strip()}: {vals.mean() * 100:.2f}% "
                  f"± {vals.std() * 100:.2f}%")
        else:
            print(f"  {label}: {vals.mean():.4f} ± {vals.std():.4f}")
