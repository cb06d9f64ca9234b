#!/usr/bin/env python
"""Benchmark: mel->wav synthesis RTF for the flagship BSRNN-M on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time factor (generated-audio-seconds per wall-second) for
batched mel->wav synthesis at 22.05 kHz with the BSRNN-M configuration
(feature_dim=128, num_repeat=8 — the reference's shipped
cfgs/bsrnn_config.json), batch 8 x ~11.9 s utterances, random weights
(throughput is weight-independent). Compile/warmup excluded.

The headline value is the bf16 serving configuration — the TPU-native
inference dtype (MXU bf16 peak; engine `compute_dtype: "bfloat16"`).
The same line carries the f32 RTF and the bf16-vs-f32 output deviation
(mel-domain L1 + relative waveform L2, measured on the SAME inputs in
the same process) so the quality cost of the serving dtype is recorded
next to the speed it buys. DSP front/back ends (DFT/iSTFT matmuls)
stay f32 either way.

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

    def make_synth(dtype):
        p = jax.tree.map(lambda x: x.astype(dtype), params)
        m = mel.astype(dtype)

        def synth(p, m):
            return gen.apply({"params": p}, m)[-1].astype(jnp.float32)

        return synth, p, m

    def timed(dtype, with_flops):
        synth, p, m = make_synth(dtype)

        # sum-reduce scalar transfer = the synchronisation point
        # (block_until_ready does not actually wait through the axon
        # tunnel; a host transfer does)
        def reduced(p, m):
            return jnp.sum(synth(p, m))

        flops = 0.0
        if with_flops:
            try:
                from nvse_tpu.utils.flops import compiled_flops
                flops, compiled = compiled_flops(reduced, p, m)
            except Exception:
                compiled = jax.jit(reduced)
        else:
            compiled = jax.jit(reduced)
        float(compiled(p, m))  # warmup
        iters = 10
        t0 = time.time()
        s = 0.0
        for _ in range(iters):
            s = compiled(p, m)
        float(s)  # drains the ordered execution queue
        wall = time.time() - t0
        audio_sec = iters * B * (T - 1) * h.hop_size / h.sampling_rate
        return audio_sec / wall, flops, iters / wall

    rtf_f32, _, _ = timed(jnp.float32, with_flops=False)
    rtf_bf16, flops, calls_per_sec = timed(jnp.bfloat16, with_flops=True)

    # bf16-vs-f32 output deviation on the same inputs (quality guard
    # for the serving dtype; ~0.01 mel-L1 vs ~0.25 converged Mel loss)
    from nvse_tpu.ops import mel_spectrogram
    s32, p32, m32 = make_synth(jnp.float32)
    sbf, pbf, mbf = make_synth(jnp.bfloat16)
    w32 = jax.jit(s32)(p32, m32)
    wbf = jax.jit(sbf)(pbf, mbf)
    margs = (h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size,
             h.fmin, h.sampling_rate / 2)
    mel_l1 = float(jnp.mean(jnp.abs(mel_spectrogram(w32, *margs)
                                    - mel_spectrogram(wbf, *margs))))
    wav_rel = float(jnp.linalg.norm((w32 - wbf).ravel())
                    / (jnp.linalg.norm(w32.ravel()) + 1e-9))

    row = {
        "metric": "bsrnn_m_mel2wav_rtf",
        "value": round(rtf_bf16, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf_bf16, 2),
        "batch": B,
        "dtype": "bfloat16",
        "f32_rtf": round(rtf_f32, 2),
        "bf16_vs_f32_mel_l1": round(mel_l1, 5),
        "bf16_vs_f32_wav_rel_l2": round(wav_rel, 5),
    }
    if flops > 0:
        from nvse_tpu.utils.flops import mfu
        row.update(mfu(flops, calls_per_sec))
    print(json.dumps(row))


if __name__ == "__main__":
    main()
