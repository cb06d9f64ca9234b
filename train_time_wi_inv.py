#!/usr/bin/env python
"""Time-domain vocoder GAN training CLI.

Same UX as the reference's train_time_wi_inv.py:
    python train_time_wi_inv.py --cfg_filename nvse_tpu/configs/hifigan_v1_config.json
Covers HiFiGAN, iSTFTNet, ConvTasNet, HDDemucas with MPD + MSD
discriminators (LS loss for HiFiGAN/iSTFTNet, hinge otherwise).
"""
import argparse

from nvse_tpu.models import model_domain
from nvse_tpu.train.loop import train
from nvse_tpu.utils import load_config


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default="nvse_tpu/configs/hifigan_v1_config.json")
    args = p.parse_args()
    h = load_config(args.cfg_filename)
    domain = model_domain(h.model_name)
    if domain != "time":
        raise SystemExit(
            f"{h.model_name} is a T-F-domain model; use train_tf_wi_inv.py"
        )
    train(h)


if __name__ == "__main__":
    main()
