#!/usr/bin/env python
"""Benchmark: mel->wav synthesis RTF for the flagship BSRNN-M on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time factor (generated-audio-seconds per wall-second) for
batched mel->wav synthesis at 22.05 kHz with the BSRNN-M configuration
(feature_dim=128, num_repeat=8 — the reference's shipped
cfgs/bsrnn_config.json), batch 8 x ~11.9 s utterances, random weights
(throughput is weight-independent). Compile/warmup excluded.

vs_baseline: the reference measures RTF on CPU with batch-1 Python
loops (infers/inference_bsrnn.py:98-102, device forced to CPU at :129)
and publishes no number; real-time (RTF=1.0) is used as the baseline
denominator, so vs_baseline == value. The north-star target is >=10x
(BASELINE.md).
"""
import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compile cache: repeat runs skip the ~3 min first compile
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nvse_tpu.models import build_generator
    from nvse_tpu.utils import load_config

    h = load_config("nvse_tpu/configs/bsrnn_config.json")
    gen, _domain = build_generator(h)

    # 8 utterances x 1024 frames (~11.9 s each @ hop 256) by default;
    # NVSE_BENCH_BATCH overrides for max-throughput probing (the model
    # is recurrence-latency-bound, so serving-style larger batches add
    # audio-seconds at nearly constant wall time)
    B, T = int(os.environ.get("NVSE_BENCH_BATCH", "8")), 1024
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, h.num_mels, T)).astype(np.float32) - 4.0)
    params = gen.init(jax.random.PRNGKey(0), mel[:1, :, :16])["params"]

    def synth(params, mel):
        # sum-reduce on device: the returned scalar transfer is the
        # synchronisation point (block_until_ready does not actually
        # wait through the axon tunnel; a host transfer does)
        return jnp.sum(gen.apply({"params": params}, mel)[-1])

    # AOT lower+compile: one compile serves the XLA cost analysis
    # (FLOPs -> MFU side info) and the timed loop
    try:
        from nvse_tpu.utils.flops import compiled_flops, mfu
        flops, compiled = compiled_flops(synth, params, mel)
    except Exception:
        flops, compiled = 0.0, jax.jit(synth)

    # warmup
    float(compiled(params, mel))

    iters = 10
    t0 = time.time()
    s = 0.0
    for _ in range(iters):
        s = compiled(params, mel)
    float(s)  # drains the ordered execution queue
    wall = time.time() - t0

    audio_sec = iters * B * (T - 1) * h.hop_size / h.sampling_rate
    rtf = audio_sec / wall
    row = {
        "metric": "bsrnn_m_mel2wav_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf, 2),
        "batch": B,
    }
    if flops > 0:
        row.update(mfu(flops, iters / wall))
    print(json.dumps(row))


if __name__ == "__main__":
    main()
