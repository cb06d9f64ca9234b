#!/usr/bin/env python
"""Joint denoise/vocoder inference CLI (BSRNN_24k).

Same UX as reference infers/inference_joint_denoise_vocoder_bsrnn.py:
    python infers/inference_joint_denoise_vocoder_bsrnn.py \
        --cfg_filename ... --processing_mode denoise|vocoder
denoise: input = log-amplitude spectrum of the (noisy) wav (:91-92);
vocoder: input = log pseudo-inverse mel of the wav's mel (:88-90).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default=os.path.join(
        os.path.dirname(__file__), "..", "nvse_tpu", "configs",
        "bsrnn_joint_denoise_vocoder_config.json"))
    p.add_argument("--processing_mode", choices=["denoise", "vocoder"],
                   default="denoise")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nvse_tpu.data import load_wav, write_wav
    from nvse_tpu.infer.engine import InferenceEngine, resolve_filelist
    from nvse_tpu.ops import amp_pha_spectrum, inverse_mel, mel_spectrogram
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    engine = InferenceEngine(h)
    files = resolve_filelist(h)
    if args.limit:
        files = files[: args.limit]
    os.makedirs(h.test_output_dir, exist_ok=True)

    total_audio, total_wall = 0.0, 0.0
    for i, path in enumerate(files):
        audio = load_wav(path, h.sampling_rate)
        wav_j = jnp.asarray(audio[None, :])
        if args.processing_mode == "denoise":
            spec = amp_pha_spectrum(wav_j, h.n_fft, h.hop_size, h.win_size,
                                    eps=1e-5)[0]
        else:
            mel = mel_spectrogram(wav_j, h.n_fft, h.num_mels, h.sampling_rate,
                                  h.hop_size, h.win_size, h.fmin, h.fmax)
            inv = inverse_mel(mel, h.n_fft, h.num_mels, h.sampling_rate,
                              h.hop_size, h.win_size, h.fmin, h.fmax)
            spec = jnp.log(jnp.clip(jnp.abs(inv), 1e-5, None))
        # every distinct length bucket warms up outside the timed region
        engine.warmup(spec.shape[-1])
        t0 = time.time()
        out = engine.synthesize_mel(spec, out_len=len(audio))
        total_wall += time.time() - t0
        total_audio += len(audio) / h.sampling_rate
        write_wav(os.path.join(h.test_output_dir, os.path.basename(path)),
                  np.asarray(out)[0], h.sampling_rate)

    rtf = total_audio / max(total_wall, 1e-9)
    print(f"decoded {len(files)} files | wall {total_wall:.2f}s | "
          f"audio {total_audio:.2f}s | RTF {rtf:.2f}x realtime")


if __name__ == "__main__":
    main()
