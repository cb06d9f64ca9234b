#!/usr/bin/env python
"""Inference CLI for BSRNN (same UX as reference infers/inference_bsrnn.py).

    python infers/inference_bsrnn.py --cfg_filename nvse_tpu/configs/bsrnn_config.json
Decodes the configured test filelist to h.test_output_dir and prints the
RTF (generated-audio-seconds / wall-seconds).
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
        os.path.dirname(__file__), "..", "nvse_tpu", "configs", "bsrnn_config.json"))
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="chunked constant-memory decode (one compiled "
                        "window shape for any utterance length)")
    args = p.parse_args()
    h = load_config(args.cfg_filename)
    run_inference(h, limit=args.limit, stream=args.stream)


if __name__ == "__main__":
    main()
