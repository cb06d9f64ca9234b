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


# Canonical vowel formant targets (F1, F2, F3) in Hz for a reference
# vocal tract; per-speaker scaling moves the whole set.
_VOWELS = np.array([
    [730, 1090, 2440],   # /a/
    [270, 2290, 3010],   # /i/
    [300, 870, 2240],    # /u/
    [530, 1840, 2480],   # /e/
    [570, 840, 2410],    # /o/
    [660, 1720, 2410],   # /ae/
    [490, 1350, 1690],   # /er/
    [520, 1190, 2390],   # /^/
])


def draw_speaker(rng: np.random.Generator) -> dict:
    """Per-utterance 'speaker' profile: wide independent draws so a 512-
    utterance corpus spans real pitch/timbre variety (the round-2 corpus
    saturated models by ~3k steps; see QUALITY.md)."""
    return {
        # vocal-tract length factor: scales every formant (0.8 short/child
        # .. 1.25 long); base pitch drawn log-uniform across male..child
        "vt_scale": rng.uniform(0.78, 1.25),
        "f0_base": np.exp(rng.uniform(np.log(75), np.log(330))),
        "f0_walk": rng.uniform(0.03, 0.14),     # log-Hz random-walk sigma
        "vibrato_hz": rng.uniform(4.0, 7.0),
        "vibrato_depth": rng.uniform(0.0, 0.03),
        "tilt": rng.uniform(0.85, 1.6),          # harmonic rolloff 1/k^tilt
        "breath": 10 ** rng.uniform(-2.2, -1.1), # aspiration noise level
        "syl_rate": rng.uniform(2.5, 7.0),       # syllables / second
        "bw_scale": rng.uniform(0.8, 1.5),       # formant bandwidth factor
        "gain": rng.uniform(0.4, 0.9),
    }


def synth_utterance(rng: np.random.Generator, n: int, sr: int,
                    spk: dict | None = None) -> np.ndarray:
    """Speech-like utterance with a per-speaker profile and a vowel
    SEQUENCE: formants glide between per-syllable vowel targets via
    overlap-add blockwise filtering, so the spectral envelope is
    time-varying like real speech (not a single static resonance set)."""
    from scipy.signal import lfilter

    if spk is None:
        spk = draw_speaker(rng)
    t = np.arange(n) / sr

    # F0 contour: slow random walk in log-Hz around the speaker base,
    # plus vibrato; clipped to a plausible band around the base
    n_ctrl = max(6, int(n / sr * 8))
    logf0 = np.log(spk["f0_base"]) + np.cumsum(rng.normal(0, spk["f0_walk"], n_ctrl))
    logf0 = np.clip(logf0, np.log(spk["f0_base"]) - 0.45, np.log(spk["f0_base"]) + 0.45)
    f0 = np.exp(np.interp(np.linspace(0, 1, n), np.linspace(0, 1, n_ctrl), logf0))
    f0 = f0 * (1 + spk["vibrato_depth"] * np.sin(2 * np.pi * spk["vibrato_hz"] * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr

    # harmonic source with speaker spectral tilt + aspiration noise
    x = np.zeros(n)
    kmax = int((sr / 2 - 200) / max(f0.max(), 1.0))
    for k in range(1, min(kmax + 1, 40)):
        x += np.sin(k * phase + rng.uniform(0, 2 * np.pi)) / k ** spk["tilt"]
    x += spk["breath"] * rng.normal(0, 1, n) * (1 + np.sin(phase)) * 2

    # per-syllable vowel targets -> piecewise-linear formant tracks
    n_syl = max(2, int(round(n / sr * spk["syl_rate"])))
    vowel_idx = rng.integers(0, len(_VOWELS), n_syl)
    targets = _VOWELS[vowel_idx] * spk["vt_scale"]
    # formant track sampled at block rate; glide between syllable centres
    blk = 512                                   # 23 ms blocks, 50% overlap
    hop = blk // 2
    n_blocks = max(1, (n - blk) // hop + 1)
    syl_pos = (np.arange(n_syl) + 0.5) / n_syl
    blk_pos = (np.arange(n_blocks) + 0.5) / n_blocks
    tracks = np.stack([
        np.interp(blk_pos, syl_pos, targets[:, j]) for j in range(3)
    ], axis=1)                                   # (n_blocks, 3)

    # overlap-add time-varying formant filtering
    win = np.hanning(blk)
    y = np.zeros(n + blk)
    bws = np.array([90.0, 110.0, 170.0]) * spk["bw_scale"]
    amps = np.array([1.0, 0.63, 0.35])
    for bi in range(n_blocks):
        s = bi * hop
        seg = x[s : s + blk]
        if len(seg) < blk:
            seg = np.pad(seg, (0, blk - len(seg)))
        acc = np.zeros(blk)
        for j in range(3):
            fc = min(tracks[bi, j], sr / 2 - 300)
            r = np.exp(-np.pi * bws[j] / sr)
            theta = 2 * np.pi * fc / sr
            acc += amps[j] * lfilter([1 - r], [1.0, -2 * r * np.cos(theta), r * r], seg)
        y[s : s + blk] += acc * win
    y = y[:n]

    # syllable-rate amplitude modulation (gated, speech-like)
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * spk["syl_rate"] * t
                                     + rng.uniform(0, 2 * np.pi)), 0, None) ** 0.7
    out = y * env

    # unvoiced segments: fricative-like shaped-noise stretches
    for _ in range(rng.integers(1, 4)):
        s = rng.integers(0, max(n - sr // 6, 1))
        ln = rng.integers(sr // 20, sr // 8)
        noise = rng.normal(0, 1, ln)
        noise = lfilter([1, -0.9], [1], noise)  # high-pass-ish fricative
        out[s : s + ln] = noise[: len(out[s : s + ln])] * env[s : s + ln] * 0.4

    out = out / (np.abs(out).max() + 1e-9) * spk["gain"]
    return out.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                 "DatasetsScp", "synth"))
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--n_val", type=int, default=4)
    p.add_argument("--n_test", type=int, default=6)
    p.add_argument("--seconds", type=float, default=0.95)
    p.add_argument("--seconds_max", type=float, default=None,
                   help="if set, per-utterance duration ~ U[seconds, seconds_max]")
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--seed", type=int, default=2024)
    args = p.parse_args()

    wav_dir = os.path.join(args.out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    splits = [("train", args.n_train), ("val", args.n_val), ("test", args.n_test)]
    idx = 0
    for split, count in splits:
        lines = []
        for _ in range(count):
            sec = (args.seconds if args.seconds_max is None
                   else rng.uniform(args.seconds, args.seconds_max))
            n = int(sec * args.sr)
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
        # absolute paths: the scp is consumed verbatim (reference
        # noise_filelist semantics); a repo-root-relative path silently
        # breaks for corpora generated outside the repo (e.g. /tmp)
        scp_lines.append(os.path.abspath(name) + "\n")
    with open(os.path.join(args.out, "noise_filelist.scp"), "w") as f:
        f.writelines(scp_lines)
    print(f"wrote {idx} wavs under {wav_dir} + 3 filelists + 8 noise wavs")


if __name__ == "__main__":
    main()
