#!/usr/bin/env python
"""Inference CLI for Vocos (bonus model; no reference counterpart).

    python infers/inference_vocos.py --cfg_filename nvse_tpu/configs/vocos_config.json
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nvse_tpu.infer import run_inference
from nvse_tpu.utils import load_config


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default=os.path.join(
        os.path.dirname(__file__), "..", "nvse_tpu", "configs", "vocos_config.json"))
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    run_inference(load_config(args.cfg_filename), limit=args.limit)


if __name__ == "__main__":
    main()
