#!/usr/bin/env python
"""Export a trained decoder to a standalone AOT serving artifact.

    python scripts/export_model.py --cfg_filename <cfg.json> \
        [--checkpoint_file_load <g_ckpt>] --out model.nvsx \
        [--batch 1] [--frames 1024 | --frames -1] [--platforms tpu,cpu]

--frames -1 exports a shape-polymorphic time axis (conv families only);
otherwise the artifact is fixed to the given (batch, bins, frames)
bucket — pad/crop on the serving side exactly as the engine does.

Round-trip check: unless --no_check, the artifact is deserialized and
run against the live model on random mel input (max |Δ| printed).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", required=True)
    p.add_argument("--checkpoint_file_load", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--frames", type=int, default=1024,
                   help="-1 = shape-polymorphic time axis")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    p.add_argument("--no_check", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nvse_tpu.infer.engine import InferenceEngine
    from nvse_tpu.infer.export import export_decoder, load_decoder
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    if args.checkpoint_file_load:
        h["checkpoint_file_load"] = args.checkpoint_file_load
    engine = InferenceEngine(h)  # resolves checkpoint -> params

    frames = None if args.frames < 0 else args.frames
    platforms = args.platforms.split(",") if args.platforms else None
    meta = export_decoder(h, engine.params, args.out, batch=args.batch,
                          frames=frames, platforms=platforms)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {meta['model_name']} -> {args.out} "
          f"({size_mb:.1f} MB, platforms={meta['platforms']}, "
          f"batch={meta['batch']}, frames={meta['frames']})")

    if not args.no_check:
        dec = load_decoder(args.out)
        T = meta["frames"] or 64
        rng = np.random.default_rng(0)
        mel = (rng.standard_normal((meta["batch"], meta["input_bins"], T))
               .astype(np.float32) - 4.0)
        got = np.asarray(dec(mel))
        want = np.asarray(engine._fn(T)(engine.params, jnp.asarray(mel)))
        err = float(np.max(np.abs(got - want)))
        print(f"round-trip check: max|artifact - live| = {err:.3e}")
        if not np.isfinite(err) or err > 1e-4:
            raise SystemExit(f"round-trip mismatch: {err}")


if __name__ == "__main__":
    main()
