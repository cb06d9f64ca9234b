#!/usr/bin/env python
"""Streaming chunk-latency bench: the real-time-enhancement serving metric.

The fleet bench (`bench_fleet.py`) measures bulk throughput (RTF at
batch 8 x 1024 frames). A live enhancement/vocoding session cares about
the opposite corner: batch 1, one chunk at a time — how long after a
chunk of audio arrives is its enhanced/decoded audio ready?

For each chunk size this measures the wall latency of one compiled
window decode (chunk + 2*context frames in, chunk*hop samples kept),
exactly the unit of work `InferenceEngine.synthesize_streaming` issues
per chunk, and reports:

  * compute_ms   — p50/p95 per-window decode wall time
  * algo_ms      — algorithmic latency: (chunk + context) * hop / sr
                   (the right-context lookahead the window waits for;
                   causal models stream with context on the left only
                   at identical compute cost)
  * budget_x     — chunk duration / p50 compute: how many concurrent
                   real-time streams one chip could serve at this
                   chunk size (compute-only, no batching)

Writes BENCH_LATENCY.json. Reference baseline: none — the reference
decodes whole utterances on CPU (infers/inference_bsrnn.py:82-84);
real-time chunked serving is new surface.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_window(engine, chunk: int, ctx: int, iters: int) -> dict:
    import jax.numpy as jnp

    h = engine.h
    T = chunk + 2 * ctx
    engine.warmup(T, exact=True)
    fn = engine._fn(T)
    from nvse_tpu.models import model_input_bins
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((1, model_input_bins(h), T)).astype(np.float32) - 4.0)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(engine.params, mel))  # host transfer = sync
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    chunk_ms = chunk * h.hop_size / h.sampling_rate * 1e3
    p50 = float(np.percentile(times, 50))
    return {
        "chunk_frames": chunk,
        "context_frames": ctx,
        "chunk_ms": round(chunk_ms, 2),
        "algo_ms": round((chunk + ctx) * h.hop_size / h.sampling_rate * 1e3, 2),
        "compute_ms_p50": round(p50, 2),
        "compute_ms_p95": round(float(np.percentile(times, 95)), 2),
        "budget_x": round(chunk_ms / p50, 1),
        "iters": iters,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default=os.path.join(
        os.path.dirname(__file__), "..", "nvse_tpu", "configs",
        "bsrnn_config.json"))
    p.add_argument("--chunks", default="8,16,32,64")
    p.add_argument("--context", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "BENCH_LATENCY.json"))
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nvse_tpu.infer import InferenceEngine
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    engine = InferenceEngine(h)
    rows = []
    for chunk in [int(c) for c in args.chunks.split(",")]:
        row = bench_window(engine, chunk, args.context, args.iters)
        print(json.dumps(row))
        rows.append(row)
    record = {
        "device": str(jax.devices()[0]),
        "model": str(h.model_name),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "results": rows,
    }
    json.dump(record, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
