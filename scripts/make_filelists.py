#!/usr/bin/env python
"""Build reference-format train/val/test filelists from a wav directory.

The reference ships LJSpeech filelists in the
'DUMMY1/<file>.wav|<transcript>' format (DatasetsScp/LSJ/*); this tool
generates compatible lists from any corpus directory:

    python scripts/make_filelists.py --wav_dir data/LJSpeech-1.1/wavs \
        --out_dir DatasetsScp/LJSpeech --val 100 --test 500
"""
import argparse
import os
import random


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--val", type=int, default=100)
    p.add_argument("--test", type=int, default=500)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    names = sorted(n for n in os.listdir(args.wav_dir) if n.endswith(".wav"))
    if not names:
        raise SystemExit(f"no wavs under {args.wav_dir}")
    random.Random(args.seed).shuffle(names)
    test = names[: args.test]
    val = names[args.test : args.test + args.val]
    train = names[args.test + args.val :]

    os.makedirs(args.out_dir, exist_ok=True)
    for split, items in [("train", train), ("val", val), ("test", test)]:
        path = os.path.join(args.out_dir, f"{split}_filelist.txt")
        with open(path, "w") as f:
            for n in items:
                f.write(f"DUMMY1/{n}|\n")
        print(f"{path}: {len(items)} files")


if __name__ == "__main__":
    main()
