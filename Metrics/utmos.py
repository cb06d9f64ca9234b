#!/usr/bin/env python
"""UTMOS naturalness MOS predictor over a wav directory.

CLI contract matches the reference Metrics/utmos.py:
    python Metrics/utmos.py --deg_dir <decoded_dir> [--sr 16000] \
        [--ckpt <epoch=3-step=7459.ckpt>]

UTMOS = wav2vec2-base SSL features + domain/judge embeddings + BiLSTM
MOS head (reference Metrics/utmos.py:54-157). The full scoring path is
implemented in plain torch in nvse_tpu/metrics/utmos_torch.py — no
fairseq needed, because the UTMOS lightning checkpoint contains the
fine-tuned wav2vec2 weights. Only the checkpoint file itself is
required; the reference auto-downloads it from
huggingface.co/spaces/sarulab-speech/UTMOS-demo (epoch=3-step=7459.ckpt),
which this offline environment cannot do — place it next to this script
or pass --ckpt.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CKPT = os.path.join(os.path.dirname(__file__), "epoch=3-step=7459.ckpt")


def main() -> None:
    p = argparse.ArgumentParser(description="Compute UTMOS measure.")
    p.add_argument("--deg_dir", required=True, help="Degraded wav folder.")
    p.add_argument("--sr", type=int, default=16000,
                   help="Target sampling rate, 16k by default")
    p.add_argument("--ckpt", default=DEFAULT_CKPT,
                   help="UTMOS strong-learner lightning checkpoint")
    p.add_argument("--backend", choices=("jax", "torch"), default="jax",
                   help="jax = score on the default JAX device (TPU when "
                        "present, nvse_tpu/metrics/utmos_jax.py); torch = "
                        "host-CPU torch path")
    args = p.parse_args()

    if not os.path.exists(args.ckpt):
        raise SystemExit(
            f"UTMOS checkpoint not found at {args.ckpt}. The scoring path is "
            "fully implemented (nvse_tpu/metrics/utmos_torch.py); it needs "
            "only the sarulab-speech UTMOS checkpoint 'epoch=3-step=7459.ckpt' "
            "(huggingface.co/spaces/sarulab-speech/UTMOS-demo), which cannot "
            "be downloaded in this offline environment. Place it there or "
            "pass --ckpt."
        )

    if args.backend == "jax":
        from nvse_tpu.metrics.utmos_jax import score_dir
    else:
        from nvse_tpu.metrics.utmos_torch import score_dir

    mean_, std_ = score_dir(args.deg_dir, args.ckpt, sr=args.sr)
    print("UTMOS score: mean->{:.4f}, std->{:.4f}".format(mean_, std_))


if __name__ == "__main__":
    main()
