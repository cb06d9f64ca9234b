#!/usr/bin/env python
"""Fleet benchmark: mel->wav synthesis RTF for every model family.

Reproducible artifact behind the README performance table: runs the
same measurement as bench.py (batched synthesis, compile excluded,
sync via scalar transfer) across all shipped configs and writes
BENCH_FLEET.json.

    python scripts/bench_fleet.py [--out BENCH_FLEET.json] [--iters 10]
        [--models BSRNN,HiFiGAN,...]

Weights are random — synthesis throughput is weight-independent.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# name -> (config, h-overrides). BSRNN sizes follow the paper's S/M/L
# (feature_dim 64/128/256, BASELINE.md); plain "BSRNN" is the shipped
# BSRNN-M config, kept under its round-1 name for artifact continuity.
CONFIGS = {
    "HiFiGAN": ("hifigan_v1_config.json", None),
    "iSTFTNet": ("istftnet_config.json", None),
    "APNet": ("apnet_config.json", None),
    "APNet2": ("apnet2_config.json", None),
    "FreeV": ("freeV_config.json", None),
    "BSRNN": ("bsrnn_config.json", None),
    "BSRNN_S": ("bsrnn_config.json", {"feature_dim": 64}),
    "BSRNN_L": ("bsrnn_config.json", {"feature_dim": 256}),
    "GCRN": ("gcrn_config.json", None),
    "ConvTasNet": ("convtasnet_config.json", None),
    "HDDemucas": ("hddemucas_config.json", None),
    "Vocos": ("vocos_config.json", None),
}


def bench_model(name: str, cfg_name: str, iters: int, B: int, T: int,
                overrides: dict | None = None,
                dtype: str = "float32") -> dict:
    import jax
    import jax.numpy as jnp

    from nvse_tpu.models import build_generator
    from nvse_tpu.utils import load_config

    h = load_config(os.path.join(os.path.dirname(__file__), "..",
                                 "nvse_tpu", "configs", cfg_name))
    for k, v in (overrides or {}).items():
        h[k] = v
    gen, domain = build_generator(h)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, h.num_mels, T)).astype(np.float32) - 4.0)
    params = gen.init(jax.random.PRNGKey(0), mel[:1, :, :16])["params"]
    if dtype == "bfloat16":
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        mel = mel.astype(jnp.bfloat16)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    from nvse_tpu.utils.flops import compiled_flops, mfu

    def synth(params, mel):
        out = gen.apply({"params": params}, mel)
        out = out[-1] if isinstance(out, tuple) else out
        return jnp.sum(out)

    t_c0 = time.time()
    # AOT lower+compile: one compile serves both the XLA cost analysis
    # (per-call FLOPs -> MFU) and the timed loop
    flops, compiled = compiled_flops(synth, params, mel)
    float(compiled(params, mel))  # warmup (scalar transfer = sync)
    compile_sec = time.time() - t_c0

    t0 = time.time()
    s = 0.0
    for _ in range(iters):
        s = compiled(params, mel)
    float(s)
    wall = time.time() - t0

    audio_sec = iters * B * (T - 1) * h.hop_size / h.sampling_rate
    row = {
        "model": name,
        "domain": domain,
        "params_m": round(n_params / 1e6, 2),
        "rtf": round(audio_sec / wall, 2),
        "batch": B,
        "frames": T,
        "iters": iters,
        "compile_sec": round(compile_sec, 1),
    }
    if dtype != "float32":
        row["dtype"] = dtype
    row.update(mfu(flops, iters / wall))
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                 "BENCH_FLEET.json"))
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1024)
    p.add_argument("--models", default=None,
                   help="comma-separated subset (default: all)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="inference compute dtype (bf16 halves the HBM "
                        "stream of bandwidth-bound conv models)")
    p.add_argument("--set", action="append", default=[], dest="sets",
                   metavar="KEY=VAL",
                   help="extra config override applied to every benched "
                        "model (VAL parsed as JSON when possible), e.g. "
                        "--set fused_tcn=0 for an A/B of the fused path")
    args = p.parse_args()
    extra = {}
    for kv in args.sets:
        k, _, v = kv.partition("=")
        try:
            extra[k] = json.loads(v)
        except ValueError:
            extra[k] = v

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    names = args.models.split(",") if args.models else list(CONFIGS)
    rows = []
    for name in names:
        try:
            cfg_name, overrides = CONFIGS[name]
            row = bench_model(name, cfg_name, args.iters, args.batch,
                              args.frames, {**(overrides or {}), **extra},
                              args.dtype)
            print(json.dumps(row))
            rows.append(row)
        except Exception as e:  # keep sweeping; record the failure
            print(json.dumps({"model": name, "error": str(e)[:200]}))
            rows.append({"model": name, "error": str(e)[:200]})

    record = {
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "results": rows,
    }
    json.dump(record, open(args.out, "w"), indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
