#!/usr/bin/env python
"""Cross-calibrate the numpy PESQ against the ITU C extension.

The built-in PESQ (nvse_tpu/metrics/pesq.py) implements the P.862/
P.862.2 pipeline in numpy with analytic Bark bands/thresholds and scale
constants (D_WEIGHT/DA_WEIGHT) fitted on this repo's own MNRU sweeps —
an honest in-env proxy, but its absolute scores are not guaranteed to
match the ITU tables (QUALITY.md quotes carry that caveat).

When the `pesq` C extension (pip install pesq) IS importable, this
script sweeps a battery of degradations (MNRU Q levels, additive white
noise SNRs, lowpass) over synthetic speech-like signals, reports
numpy-vs-C deltas per condition, and least-squares refits
(D_WEIGHT, DA_WEIGHT) so the raw-score plane matches the C scores.

    python scripts/pesq_crosscal.py [--n 6] [--apply]

Without --apply it only reports; with --apply it prints the refitted
constants to paste into metrics/pesq.py (it never edits source files).
In an environment without the C extension it exits 0 with a notice, so
CI can always run it.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.metrics import pesq as npq  # noqa: E402


def _speechlike(rng, seconds=6.0, sr=16000):
    """Harmonic + formant + syllabic-AM signal (same family as
    scripts/make_synth_corpus.py, inlined to stay dependency-free)."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0 = 110 * 2 ** (0.3 * np.cumsum(rng.standard_normal(n)) / sr)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum(np.sin(k * phase) / k for k in range(1, 9))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t + rng.uniform(0, 6.28))
    x = x * am + 0.01 * rng.standard_normal(n)
    return (x / np.abs(x).max() * 0.3).astype(np.float64)


def _conditions(rng, x, sr):
    from scipy.signal import butter, lfilter
    out = []
    for q in (5, 10, 15, 20, 25, 30, 35):
        out.append((f"mnru_q{q}", npq.mnru(x, q, rng=np.random.default_rng(7))))
    for snr in (5, 10, 20, 30):
        noise = rng.standard_normal(len(x))
        noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()) * 10 ** (-snr / 20)
        out.append((f"awgn_{snr}dB", x + noise))
    for fc in (2000, 3400):
        b, a = butter(4, fc / (sr / 2))
        out.append((f"lp{fc}", lfilter(b, a, x)))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4, help="signals per condition")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--apply", action="store_true",
                   help="least-squares refit (D_WEIGHT, DA_WEIGHT) and "
                        "print the constants to paste into metrics/pesq.py")
    args = p.parse_args()

    try:
        from pesq import pesq as c_pesq
    except ImportError:
        print("pesq C extension not installed — nothing to cross-calibrate "
              "(the numpy PESQ keeps its MNRU-fitted constants; install "
              "`pesq` and re-run to produce deltas + refit).")
        return

    sr = args.sr
    rows = []
    for i in range(args.n):
        rng = np.random.default_rng(100 + i)
        x = _speechlike(rng, sr=sr)
        for name, deg in _conditions(rng, x, sr):
            ours = npq.pesq_wb(x, deg, sr)
            theirs = float(c_pesq(sr, x.astype(np.float32),
                                  deg.astype(np.float32), "wb"))
            # recover the C raw score through the inverse P.862.2 map and
            # our (D, DA) pair for the refit
            D, DA = npq.pesq_disturbances(x, deg, sr)
            rows.append((name, ours, theirs, D, DA))
            print(f"{name:12s} numpy={ours:5.3f} C={theirs:5.3f} "
                  f"delta={ours - theirs:+5.3f}")

    deltas = np.array([r[1] - r[2] for r in rows])
    print(f"\nmean delta {deltas.mean():+.4f}  |delta| p50 "
          f"{np.median(np.abs(deltas)):.4f}  max {np.abs(deltas).max():.4f}")

    if args.apply:
        # theirs_raw = inverse sigmoid of the C MOS-LQO; solve
        # 4.5 - w_d*D - w_da*DA = theirs_raw for (w_d, w_da) >= 0
        y = []
        A = []
        for _, _, theirs, D, DA in rows:
            t = np.clip((4.0 / (theirs - 0.999)) - 1.0, 1e-6, None)
            raw = (3.8224 - np.log(t)) / 1.3669
            y.append(4.5 - raw)
            A.append([D, DA])
        w, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(y), rcond=None)
        w = np.maximum(w, 0.0)
        print(f"\nrefit: D_WEIGHT = {w[0]:.6f}  DA_WEIGHT = {w[1]:.6f} "
              f"(current {npq.D_WEIGHT} / {npq.DA_WEIGHT}) — paste into "
              "nvse_tpu/metrics/pesq.py and re-run to verify")


if __name__ == "__main__":
    main()
