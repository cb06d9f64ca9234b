#!/usr/bin/env python
"""Benchmark the full GAN train step (BSRNN-M flagship) at production
shapes: batch 16, segment 16384 (T=65 frames), MPD+MRD discriminators,
two optimizers, on-device features — the same step train_tf_wi_inv.py
runs. Reports ms/step for f32 and bf16 compute (f32 master weights).

    python scripts/bench_train_step.py [--iters 20] [--dtypes float32,bfloat16]

Sync via scalar transfer (block_until_ready is a no-op through the
axon tunnel). Appends one JSON line per dtype.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(compute_dtype: str, iters: int, batch: int = 0) -> dict:
    import jax

    # persistent compile cache: repeat runs skip the multi-minute compile
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nvse_tpu.models import build_generator
    from nvse_tpu.train import GANTrainer
    from nvse_tpu.utils import load_config

    h = load_config(os.path.join(os.path.dirname(__file__), "..",
                                 "nvse_tpu", "configs", "bsrnn_config.json"))
    h["compute_dtype"] = compute_dtype
    if batch:
        # throughput mode: the step is recurrence-latency bound at the
        # reference's batch 16, so larger batches amortize the fixed
        # sequential cost — this flag measures that scaling directly
        h["batch_size"] = batch
    gen, domain = build_generator(h)
    B, S = int(h.batch_size), int(h.segment_size)
    example = jnp.zeros((B, h.num_mels, S // h.hop_size + 1))
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=100,
                    example_input=example)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((0.1 * rng.standard_normal((B, S))).astype(np.float32))

    t0 = time.time()
    m = tr.step(audio)  # compile + first step
    float(m["G"])
    compile_sec = time.time() - t0

    # per-step FLOPs from the already-jitted step's cost analysis (the
    # trace is cached, so this does not recompile)
    from nvse_tpu.utils.flops import compiled_flops, mfu as mfu_of
    try:
        flops, _ = compiled_flops(
            tr.fns.train_step, tr.gen_state, tr.disc_state, audio, None)
    except Exception:
        flops = 0.0

    t0 = time.time()
    for _ in range(iters):
        m = tr.step(audio)
    g = float(m["G"])  # scalar transfer = sync
    wall = time.time() - t0
    row = {
        "metric": "bsrnn_m_gan_train_step_ms",
        "compute_dtype": compute_dtype,
        "value": round(1000.0 * wall / iters, 1),
        "unit": "ms/step",
        "batch": B,
        "segment": S,
        "iters": iters,
        "compile_sec": round(compile_sec, 1),
        "G": round(g, 3),
    }
    if flops > 0:
        row.update(mfu_of(flops, iters / wall))
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtypes", default="float32,bfloat16")
    p.add_argument("--batch", type=int, default=0,
                   help="override h.batch_size (0 = config value)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    rows = []
    for dt in args.dtypes.split(","):
        row = bench(dt, args.iters, args.batch)
        print(json.dumps(row))
        rows.append(row)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
