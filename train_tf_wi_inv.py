#!/usr/bin/env python
"""T-F domain vocoder GAN training CLI.

Same UX as the reference's train_tf_wi_inv.py:
    python train_tf_wi_inv.py --cfg_filename nvse_tpu/configs/bsrnn_config.json
Covers the TF generators (APNet, APNet2, FreeV, BSRNN, GCRN) with
MPD + MRD discriminators and the full spectral loss set.
"""
import argparse

from nvse_tpu.models import model_domain
from nvse_tpu.train.loop import train
from nvse_tpu.utils import load_config


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default="nvse_tpu/configs/bsrnn_config.json")
    args = p.parse_args()
    h = load_config(args.cfg_filename)
    domain = model_domain(h.model_name)
    if domain != "tf":
        raise SystemExit(
            f"{h.model_name} is a time-domain model; use train_time_wi_inv.py"
        )
    train(h)


if __name__ == "__main__":
    main()
