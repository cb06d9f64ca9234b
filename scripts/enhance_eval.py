#!/usr/bin/env python
"""Speech-enhancement evaluation for the joint denoise+vocoder model.

The framework's namesake capability (reference
train_tf_wi_inv_joint_denoise_vocoder.py): a BSRNN_24k trained on the
50/50 denoise/vocoder task mixture should IMPROVE noisy speech. This
script mixes each test utterance with held-out noise at a fixed SNR,
runs the denoise path, and reports noisy-vs-clean and
enhanced-vs-clean scores side by side:

    python scripts/enhance_eval.py --cfg_filename <joint cfg> \
        [--snr 5] [--label joint_3k] [--out QUALITY.json]
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
    p.add_argument("--snr", type=float, default=5.0)
    p.add_argument("--label", default="joint_denoise")
    p.add_argument("--out", default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from nvse_tpu.data import load_wav, write_wav
    from nvse_tpu.infer.engine import InferenceEngine, resolve_filelist
    from nvse_tpu.metrics import estoi, lsd, pesq_wb, si_snr, snr, stoi, visqol
    from nvse_tpu.ops import amp_pha_spectrum
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    engine = InferenceEngine(h)
    files = resolve_filelist(h)
    if args.limit:
        files = files[: args.limit]
    with open(h.input_noise_wav_list) as f:
        noise_files = [l.strip() for l in f if l.strip()]
    sr = h.sampling_rate
    out_dir = os.path.join(h.test_output_dir, "enhanced")
    os.makedirs(out_dir, exist_ok=True)

    # pesq/visqol match the paper's joint-training curves (WB-PESQ +
    # a MOS proxy, figure/Joint_metrics.png); pesq_wb resamples to
    # 16 kHz internally per ITU-T P.862.2
    metric_names = ("snr", "si_snr", "stoi", "estoi", "lsd", "pesq", "visqol")
    rows = {"noisy": {m: [] for m in metric_names},
            "enhanced": {m: [] for m in metric_names}}
    wall = audio_sec = 0.0
    for i, path in enumerate(files):
        clean = load_wav(path, sr)
        noise = load_wav(noise_files[i % len(noise_files)], sr)
        if len(noise) < len(clean):
            noise = np.tile(noise, len(clean) // len(noise) + 1)
        noise = noise[: len(clean)]
        # scale noise for the target SNR
        p_c = float(np.mean(clean**2)) + 1e-12
        p_n = float(np.mean(noise**2)) + 1e-12
        noise = noise * np.sqrt(p_c / (p_n * 10 ** (args.snr / 10.0)))
        noisy = clean + noise
        peak = float(np.max(np.abs(noisy)))
        if peak > 1.0:  # anti-clip, applied to both so SNR is unchanged
            noisy, clean_t = noisy / peak, clean / peak
        else:
            clean_t = clean

        spec = amp_pha_spectrum(jnp.asarray(noisy[None, :]), h.n_fft,
                                h.hop_size, h.win_size, eps=1e-5)[0]
        engine.warmup(spec.shape[-1])
        t0 = time.time()
        enh = np.asarray(engine.synthesize_mel(spec, out_len=len(noisy)))[0]
        wall += time.time() - t0
        audio_sec += len(noisy) / sr
        write_wav(os.path.join(out_dir, os.path.basename(path)), enh, sr)

        for tag, deg in (("noisy", noisy), ("enhanced", enh)):
            n = min(len(clean_t), len(deg))
            c, d = clean_t[:n], deg[:n]
            rows[tag]["snr"].append(snr(c, d, sr))
            rows[tag]["si_snr"].append(si_snr(c, d, sr))
            rows[tag]["stoi"].append(stoi(c, d, sr))
            rows[tag]["estoi"].append(estoi(c, d, sr))
            rows[tag]["lsd"].append(lsd(c, d, sr))
            rows[tag]["pesq"].append(pesq_wb(c, d, sr))
            rows[tag]["visqol"].append(visqol(c, d, sr))

    rec = {"label": args.label, "task": "denoise", "mix_snr_db": args.snr,
           "files": len(files), "rtf": audio_sec / max(wall, 1e-9),
           "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    for tag in ("noisy", "enhanced"):
        for m, vals in rows[tag].items():
            # si_snr is ±inf for degenerate pairs (silent reference /
            # exact projection); average the finite scores only so one
            # pathological clip can't poison the corpus mean
            finite = [v for v in vals if np.isfinite(v)]
            rec[f"{tag}_{m}"] = round(float(np.mean(finite)), 4) if finite else None
            if len(finite) != len(vals):
                rec[f"{tag}_{m}_nonfinite"] = len(vals) - len(finite)
    for m in metric_names:
        e, n = rec.get(f"enhanced_{m}"), rec.get(f"noisy_{m}")
        rec[f"delta_{m}"] = round(e - n, 4) if e is not None and n is not None else None
    print(json.dumps(rec, indent=1))
    if args.out:
        recs = []
        if os.path.exists(args.out):
            recs = json.load(open(args.out))
        recs.append(rec)
        json.dump(recs, open(args.out, "w"), indent=1)
        print(f"appended -> {args.out}")


if __name__ == "__main__":
    main()
