#!/usr/bin/env python
"""Generate the bundled synthetic speech-like corpus + filelists.

Deterministic (seeded) generator for a small corpus that lets every
shipped config's `input_training_wav_list` resolve out-of-the-box and
powers the smoke-training / quality-tracking runs (QUALITY.md). Signals
are speech-like, not speech: a random-walk F0 contour drives a harmonic
source, shaped by 2-3 formant-style resonances, with syllable-rate
amplitude modulation and unvoiced (noise-burst) segments — enough
structure for a vocoder to have something to learn (pitch, envelopes,
voicing) while staying tiny and redistributable.

Usage:
    python scripts/make_synth_corpus.py [--out DatasetsScp/synth]
        [--n_train 32 --n_val 4 --n_test 6 --seconds 0.95 --sr 22050]

Filelist format matches the reference DatasetsScp/LSJ lists
(`DUMMY1/<name>.wav|<text>`); the wav root is <out>/wavs.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.data.audio_io import write_wav  # noqa: E402


def synth_utterance(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    t = np.arange(n) / sr

    # F0 contour: slow random walk in log-Hz, 80-250 Hz
    n_ctrl = 8
    logf0 = np.log(rng.uniform(90, 220)) + np.cumsum(rng.normal(0, 0.08, n_ctrl))
    logf0 = np.clip(logf0, np.log(80), np.log(250))
    f0 = np.exp(np.interp(np.linspace(0, 1, n), np.linspace(0, 1, n_ctrl), logf0))
    phase = 2 * np.pi * np.cumsum(f0) / sr

    # harmonic source with mild spectral tilt
    x = np.zeros(n)
    for k in range(1, 24):
        if k * f0.max() > sr / 2 - 200:
            break
        x += np.sin(k * phase + rng.uniform(0, 2 * np.pi)) / k ** 1.1

    # formant-style resonances: second-order IIR peaks
    from scipy.signal import lfilter

    y = np.zeros_like(x)
    for _ in range(rng.integers(2, 4)):
        fc = rng.uniform(300, 3200)
        bw = rng.uniform(80, 300)
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        b, a = [1 - r], [1.0, -2 * r * np.cos(theta), r * r]
        y += lfilter(b, a, x) * rng.uniform(0.5, 1.0)

    # syllable-rate (3-6 Hz) amplitude modulation
    env = 0.45 + 0.55 * np.clip(np.sin(2 * np.pi * rng.uniform(3, 6) * t
                                       + rng.uniform(0, 2 * np.pi)), 0, None) ** 0.7

    # unvoiced segments: replace a couple of stretches with shaped noise
    out = y * env
    for _ in range(rng.integers(1, 3)):
        s = rng.integers(0, max(n - sr // 6, 1))
        ln = rng.integers(sr // 20, sr // 8)
        noise = rng.normal(0, 1, ln)
        noise = lfilter([1, -0.9], [1], noise)  # high-pass-ish fricative
        out[s : s + ln] = noise[: len(out[s : s + ln])] * env[s : s + ln] * 0.4

    out = out / (np.abs(out).max() + 1e-9) * rng.uniform(0.5, 0.85)
    return out.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                 "DatasetsScp", "synth"))
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--n_val", type=int, default=4)
    p.add_argument("--n_test", type=int, default=6)
    p.add_argument("--seconds", type=float, default=0.95)
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--seed", type=int, default=2024)
    args = p.parse_args()

    wav_dir = os.path.join(args.out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n = int(args.seconds * args.sr)

    splits = [("train", args.n_train), ("val", args.n_val), ("test", args.n_test)]
    idx = 0
    for split, count in splits:
        lines = []
        for _ in range(count):
            name = f"SY{idx:04d}.wav"
            write_wav(os.path.join(wav_dir, name), synth_utterance(rng, n, args.sr),
                      args.sr)
            lines.append(f"DUMMY1/{name}|synthetic utterance {idx}\n")
            idx += 1
        with open(os.path.join(args.out, f"{split}_filelist.txt"), "w") as f:
            f.writelines(lines)

    # noise corpus for the joint denoise+vocoder task: coloured noise at
    # 48 kHz (the reference's DNS_48K.scp is a plain path-per-line list,
    # dataset_joint_denoise_vocoder.py:148-151)
    from scipy.signal import lfilter

    noise_dir = os.path.join(args.out, "noise")
    os.makedirs(noise_dir, exist_ok=True)
    noise_sr = 48000
    n_noise = int(1.5 * noise_sr)
    scp_lines = []
    for j in range(8):
        w = rng.normal(0, 1, n_noise)
        # vary the colour: one-pole lowpass with random cutoff
        a1 = rng.uniform(-0.95, -0.3)
        w = lfilter([1.0], [1.0, a1], w)
        w = (w / (np.abs(w).max() + 1e-9) * 0.7).astype(np.float32)
        name = os.path.join(noise_dir, f"NZ{j:02d}.wav")
        write_wav(name, w, noise_sr)
        scp_lines.append(os.path.relpath(name, os.path.join(args.out, "..", "..")) + "\n")
    with open(os.path.join(args.out, "noise_filelist.scp"), "w") as f:
        f.writelines(scp_lines)
    print(f"wrote {idx} wavs under {wav_dir} + 3 filelists + 8 noise wavs")


if __name__ == "__main__":
    main()
