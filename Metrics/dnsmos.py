#!/usr/bin/env python
"""DNSMOS P.835 (SIG/BAK/OVRL) scorer over a wav directory.

CLI contract matches the reference Metrics/DNSMOS/dnsmos_local.py:
    python Metrics/dnsmos.py --deg_dir <decoded_dir> \
        --model_dir <dir with sig_bak_ovr.onnx and model_v8.onnx>

Requires onnxruntime + the Microsoft DNS-Challenge DNSMOS model files
(the reference vendors them at Metrics/DNSMOS/DNSMOS/; they are ONNX
assets, not code). Scoring runs on host CPU in 9.01 s hops with the
published polynomial calibration.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01


def _poly_fit(sig, bak, ovr, is_personalized=False):
    """Published DNSMOS calibration polynomials."""
    if is_personalized:
        p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466, -0.11236046])
        p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786, -0.24348726])
        p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611, 0.96883132])
    else:
        p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
        p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
        p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
    return p_sig(sig), p_bak(bak), p_ovr(ovr)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deg_dir", required=True)
    p.add_argument("--model_dir", default=os.path.join(os.path.dirname(__file__), "DNSMOS"))
    args = p.parse_args()

    try:
        import onnxruntime as ort
    except ImportError:
        raise SystemExit(
            "onnxruntime is not installed in this environment. DNSMOS is a "
            "learned MOS predictor (ONNX model inference on host CPU); "
            "install onnxruntime and place sig_bak_ovr.onnx under "
            f"{args.model_dir} to score."
        )

    model_path = os.path.join(args.model_dir, "sig_bak_ovr.onnx")
    if not os.path.exists(model_path):
        raise SystemExit(f"missing DNSMOS model at {model_path}")
    sess = ort.InferenceSession(model_path)

    from nvse_tpu.data.audio_io import load_wav

    def mel_feat(x):
        from nvse_tpu.ops.spectral import _mel_filterbank_np
        n_fft, hop = 321, 160
        frames = 1 + (len(x) - n_fft) // hop
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        mag = np.abs(np.fft.rfft(x[idx] * np.hanning(n_fft), n=n_fft))
        fb = _mel_filterbank_np(SAMPLING_RATE, n_fft - 1, 120, 0.0, SAMPLING_RATE / 2)
        mel = mag[:, : fb.shape[1]] @ fb.T
        return (np.log10(np.maximum(mel, 1e-10)) + 8.0).astype(np.float32)

    scores = []
    for path in sorted(glob.glob(os.path.join(args.deg_dir, "*.wav"))):
        audio = load_wav(path, SAMPLING_RATE)
        need = int(INPUT_LENGTH * SAMPLING_RATE)
        while len(audio) < need:
            audio = np.concatenate([audio, audio])
        hops = int(np.floor(len(audio) / SAMPLING_RATE) - INPUT_LENGTH) + 1
        sig_l, bak_l, ovr_l = [], [], []
        for h0 in range(max(hops, 1)):
            seg = audio[int(h0 * SAMPLING_RATE): int((h0 + INPUT_LENGTH) * SAMPLING_RATE)]
            if len(seg) < need:
                break
            inp = {"input_1": seg[None, :].astype(np.float32)}
            raw = sess.run(None, inp)[0][0]
            s, b, o = _poly_fit(raw[0], raw[1], raw[2])
            sig_l.append(s); bak_l.append(b); ovr_l.append(o)
        if ovr_l:
            scores.append((np.mean(sig_l), np.mean(bak_l), np.mean(ovr_l)))
    arr = np.array(scores)
    print(f"DNSMOS: {len(arr)} files | SIG {arr[:,0].mean():.3f} | "
          f"BAK {arr[:,1].mean():.3f} | OVRL {arr[:,2].mean():.3f}")


if __name__ == "__main__":
    main()
