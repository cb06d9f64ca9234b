#!/usr/bin/env python
"""DNSMOS/PESQ/ESTOI training CURVE for the joint denoise+vocoder model.

The in-env counterpart of the paper's joint-training curves
(reference figure/Joint_metrics.png, BASELINE.md): for each saved
checkpoint step this mixes the test split with held-out noise at a
fixed SNR, runs the denoise path AND the vocoder-resynthesis path,
and scores

  * DNSMOS SIG/BAK/OVRL + P.808 MOS (numpy ONNX executor, --jb fan-out)
  * intrusive PESQ-WB / ESTOI / LSD vs the clean reference

so the record shows metric-vs-step recovery of the noisy->clean gap.

    python scripts/joint_curve_eval.py --cfg_filename <joint cfg> \
        --steps 5000,10000,15000,20000,25000 [--snr 5] \
        [--out QUALITY_r5.json] [--jb 6]

Noisy mixing protocol matches scripts/enhance_eval.py (power-scaled
SNR, shared anti-clip rescale).
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
    p.add_argument("--steps", required=True,
                   help="comma list of checkpoint steps (g_<8digit> under "
                        "h.checkpoint_path)")
    p.add_argument("--snr", type=float, default=5.0)
    p.add_argument("--label", default="joint_curve")
    p.add_argument("--out", default="QUALITY_r5.json")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--jb", type=int, default=6, help="DNSMOS worker processes")
    p.add_argument("--voc_dnsmos_all", action="store_true",
                   help="DNSMOS-score the vocoded dir at EVERY step "
                        "(default: final step only — the headline curve "
                        "is denoise DNSMOS, and the numpy executor costs "
                        "~15 s/clip/core)")
    p.add_argument("--model_dir", default=os.environ.get(
        "NVSE_DNSMOS_DIR",
        os.path.join(os.path.dirname(__file__), "..", "Metrics", "DNSMOS")))
    p.add_argument("--work_dir", default="File_Decodes/joint_curve")
    args = p.parse_args()

    import jax.numpy as jnp

    from nvse_tpu.data import load_wav, write_wav
    from nvse_tpu.infer.engine import InferenceEngine, resolve_filelist
    from nvse_tpu.metrics import estoi, lsd, pesq_wb
    from nvse_tpu.metrics.dnsmos import score_dir
    from nvse_tpu.ops import amp_pha_spectrum, inverse_mel, mel_spectrogram
    from nvse_tpu.utils import AttrDict, load_config

    h = load_config(args.cfg_filename)
    sr = h.sampling_rate
    files = resolve_filelist(h)
    if args.limit:
        files = files[: args.limit]
    with open(h.input_noise_wav_list) as f:
        noise_files = [l.strip() for l in f if l.strip()]

    # --- fixed noisy mixes + clean refs, written once --------------------
    clean_dir = os.path.join(args.work_dir, "clean")
    noisy_dir = os.path.join(args.work_dir, f"noisy_snr{args.snr:g}")
    os.makedirs(clean_dir, exist_ok=True)
    os.makedirs(noisy_dir, exist_ok=True)
    cleans, noisys = {}, {}
    for i, path in enumerate(files):
        name = os.path.basename(path)
        clean = load_wav(path, sr)
        noise = load_wav(noise_files[i % len(noise_files)], sr)
        if len(noise) < len(clean):
            noise = np.tile(noise, len(clean) // len(noise) + 1)
        noise = noise[: len(clean)]
        p_c = float(np.mean(clean**2)) + 1e-12
        p_n = float(np.mean(noise**2)) + 1e-12
        noisy = clean + noise * np.sqrt(p_c / (p_n * 10 ** (args.snr / 10.0)))
        peak = float(np.max(np.abs(noisy)))
        if peak > 1.0:
            noisy, clean = noisy / peak, clean / peak
        cleans[name], noisys[name] = clean, noisy
        write_wav(os.path.join(clean_dir, name), clean, sr)
        write_wav(os.path.join(noisy_dir, name), noisy, sr)

    def dnsmos_of(d):
        rows = score_dir(d, args.model_dir, jobs=args.jb)
        out = {}
        for k, tag in (("SIG", "dnsmos_sig"), ("BAK", "dnsmos_bak"),
                       ("OVRL", "dnsmos_ovr"), ("P808_MOS", "dnsmos_p808")):
            vals = [r[k] for r in rows if k in r]
            if vals:
                out[tag] = round(float(np.mean(vals)), 4)
        return out

    def intrusive_of(d):
        ps, es, ls = [], [], []
        for name, clean in cleans.items():
            deg = load_wav(os.path.join(d, name), sr)
            n = min(len(clean), len(deg))
            c, g = clean[:n], deg[:n]
            ps.append(pesq_wb(c, g, sr))
            es.append(estoi(c, g, sr))
            ls.append(lsd(c, g, sr))
        return {"pesq": round(float(np.mean(ps)), 4),
                "estoi": round(float(np.mean(es)), 4),
                "lsd": round(float(np.mean(ls)), 4)}

    records = []

    def emit(rec):
        rec.update(label=args.label, mix_snr_db=args.snr, files=len(files),
                   timestamp=time.strftime("%Y-%m-%d %H:%M:%S"))
        print(json.dumps(rec))
        records.append(rec)

    emit({"signal": "clean", **dnsmos_of(clean_dir)})
    emit({"signal": "noisy", **dnsmos_of(noisy_dir), **intrusive_of(noisy_dir)})

    steps = [int(s) for s in args.steps.split(",")]
    for step in steps:
        ck = os.path.join(h.checkpoint_path, f"g_{step:08d}")
        if not os.path.isdir(ck):
            print(f"!! missing checkpoint {ck}; skipping", file=sys.stderr)
            continue
        h2 = AttrDict(dict(h))
        h2["checkpoint_file_load"] = ck
        engine = InferenceEngine(h2)

        den_dir = os.path.join(args.work_dir, f"denoised_{step:08d}")
        voc_dir = os.path.join(args.work_dir, f"vocoded_{step:08d}")
        os.makedirs(den_dir, exist_ok=True)
        os.makedirs(voc_dir, exist_ok=True)
        # one BATCHED dispatch per mode: all utterances padded to the
        # longest (silence = log eps), decoded together, cropped apart
        names = list(cleans)
        Lmax = max(len(cleans[n]) for n in names)
        noisy_b = np.zeros((len(names), Lmax), np.float32)
        clean_b = np.zeros((len(names), Lmax), np.float32)
        for r, n in enumerate(names):
            noisy_b[r, : len(noisys[n])] = noisys[n]
            clean_b[r, : len(cleans[n])] = cleans[n]
        # denoise: noisy log-amplitude spectrum in (reference
        # infers/inference_joint_denoise_vocoder_bsrnn.py:91-92)
        spec = amp_pha_spectrum(jnp.asarray(noisy_b), h.n_fft,
                                h.hop_size, h.win_size, eps=1e-5)[0]
        enh = np.asarray(engine.synthesize_mel(spec, out_len=Lmax))
        # vocoder: log clamped pseudo-inverse mel of the CLEAN mel
        # (reference :88-90)
        mel = mel_spectrogram(jnp.asarray(clean_b), h.n_fft,
                              h.num_mels, sr, h.hop_size, h.win_size,
                              h.fmin, h.fmax)
        inv = inverse_mel(mel, h.n_fft, h.num_mels, sr, h.hop_size,
                          h.win_size, h.fmin, h.fmax)
        spec_v = jnp.log(jnp.clip(jnp.abs(inv), 1e-5, None))
        voc = np.asarray(engine.synthesize_mel(spec_v, out_len=Lmax))
        for r, n in enumerate(names):
            write_wav(os.path.join(den_dir, n), enh[r, : len(noisys[n])], sr)
            write_wav(os.path.join(voc_dir, n), voc[r, : len(cleans[n])], sr)

        emit({"signal": "denoised", "step": step,
              **dnsmos_of(den_dir), **intrusive_of(den_dir)})
        voc_scores = dict(intrusive_of(voc_dir))
        if args.voc_dnsmos_all or step == steps[-1]:
            voc_scores.update(dnsmos_of(voc_dir))
        emit({"signal": "vocoded", "step": step, **voc_scores})

    if args.out:
        rows = []
        if os.path.exists(args.out):
            rows = json.load(open(args.out))
        rows.extend(records)
        json.dump(rows, open(args.out, "w"), indent=1)
        print(f"appended {len(records)} records -> {args.out}")


if __name__ == "__main__":
    main()
