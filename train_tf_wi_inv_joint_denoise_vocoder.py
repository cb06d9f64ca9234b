#!/usr/bin/env python
"""Joint denoise+vocoder GAN training CLI (BSRNN_24k).

Same UX as the reference's train_tf_wi_inv_joint_denoise_vocoder.py:
    python train_tf_wi_inv_joint_denoise_vocoder.py \
        --cfg_filename nvse_tpu/configs/bsrnn_joint_denoise_vocoder_config.json
"""
import argparse

from nvse_tpu.train.loop_joint import train_joint
from nvse_tpu.utils import load_config


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename",
                   default="nvse_tpu/configs/bsrnn_joint_denoise_vocoder_config.json")
    args = p.parse_args()
    train_joint(load_config(args.cfg_filename))


if __name__ == "__main__":
    main()
