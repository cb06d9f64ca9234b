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


def bench_window(engine, chunk: int, ctx: int, iters: int,
                 batch: int = 1) -> dict:
    """One context-recompute window decode at `batch` concurrent streams.

    batch > 1 measures MULTI-STREAM serving: the chunk windows of
    `batch` independent live sessions decoded in one dispatch.
    streams_per_chip = batch * chunk_ms / p50 is the measured number of
    real-time streams one chip sustains at this batch size (replacing
    the round-4 batch-1 extrapolation)."""
    import jax.numpy as jnp

    h = engine.h
    T = chunk + 2 * ctx
    engine.warmup(T, exact=True, batch=batch)
    fn = engine._fn(T)
    from nvse_tpu.models import model_input_bins
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (batch, model_input_bins(h), T)).astype(np.float32) - 4.0)
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
        "streams": batch,
        "chunk_ms": round(chunk_ms, 2),
        "algo_ms": round((chunk + ctx) * h.hop_size / h.sampling_rate * 1e3, 2),
        "compute_ms_p50": round(p50, 2),
        "compute_ms_p95": round(float(np.percentile(times, 95)), 2),
        "budget_x": round(chunk_ms / p50, 1),
        "streams_per_chip": round(batch * chunk_ms / p50, 1),
        "iters": iters,
    }


def bench_stateful_window(engine, chunk: int, la: int, iters: int,
                          batch: int = 1) -> dict:
    """Per-chunk latency of the STATE-CARRYING streaming step
    (engine.synthesize_streaming_stateful): window = chunk + lookahead
    frames, recurrent state round-trips host<->device each chunk."""
    import jax.numpy as jnp

    h = engine.h
    from nvse_tpu.models import model_input_bins
    step = engine._stream_step(chunk, la)
    states = engine._stream_state_zeros(batch)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (batch, model_input_bins(h), chunk + la)).astype(np.float32) - 4.0)
    fr, states = step(engine.params, states, mel)   # compile + state shape
    np.asarray(fr)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fr, states = step(engine.params, states, mel)
        np.asarray(fr)
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    chunk_ms = chunk * h.hop_size / h.sampling_rate * 1e3
    p50 = float(np.percentile(times, 50))
    return {
        "mode": "stateful",
        "chunk_frames": chunk,
        "lookahead_frames": la,
        "streams": batch,
        "chunk_ms": round(chunk_ms, 2),
        "algo_ms": round((chunk + la) * h.hop_size / h.sampling_rate * 1e3, 2),
        "compute_ms_p50": round(p50, 2),
        "compute_ms_p95": round(float(np.percentile(times, 95)), 2),
        "budget_x": round(chunk_ms / p50, 1),
        "streams_per_chip": round(batch * chunk_ms / p50, 1),
        "iters": iters,
    }


def bench_seam(engine, wavs: list[str], chunk: int, ctx: int,
               mode: str = "recompute") -> dict:
    """Chunked-vs-full decode quality: the seam/lookahead error.

    For non-causal models every frame of a chunked decode misses the
    context beyond its window; this quantifies the resulting output
    deviation as LSD (dB) and PESQ between the FULL-utterance decode
    (treated as reference) and the chunked decode of the same mel —
    exactly the quality cost a serving deployment pays for O(chunk)
    latency (engine contract: infer/engine.py synthesize_streaming).
    """
    from nvse_tpu.data.audio_io import load_wav
    from nvse_tpu.metrics import lsd as lsd_fn
    from nvse_tpu.metrics import pesq_wb

    import jax.numpy as jnp

    h = engine.h
    lsds, pesqs, rels = [], [], []
    for path in wavs:
        wav = load_wav(path, h.sampling_rate)
        mel = engine.mel_of(wav)
        out_len = (mel.shape[-1] - 1) * h.hop_size
        full = np.asarray(engine.synthesize_mel(jnp.asarray(mel),
                                                out_len=out_len))[0]
        if mode == "stateful":
            stream = np.asarray(engine.synthesize_streaming_stateful(
                jnp.asarray(mel), out_len=out_len, chunk_frames=chunk,
                lookahead_frames=ctx))[0]
        else:
            stream = np.asarray(engine.synthesize_streaming(
                jnp.asarray(mel), out_len=out_len, chunk_frames=chunk,
                context_frames=ctx))[0]
        lsds.append(float(lsd_fn(full, stream, h.sampling_rate)))
        try:
            pesqs.append(float(pesq_wb(full, stream, h.sampling_rate)))
        except Exception:
            pass
        rels.append(float(np.abs(full - stream).mean()
                          / (np.abs(full).mean() + 1e-9)))
    row = {
        "mode": mode,
        "chunk_frames": chunk,
        "context_frames": ctx,
        "files": len(wavs),
        "seam_lsd_db": round(float(np.mean(lsds)), 4),
        "seam_rel_l1": round(float(np.mean(rels)), 5),
    }
    if pesqs:
        row["seam_pesq"] = round(float(np.mean(pesqs)), 3)
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", default=os.path.join(
        os.path.dirname(__file__), "..", "nvse_tpu", "configs",
        "bsrnn_config.json"))
    p.add_argument("--chunks", default="8,16,32,64")
    p.add_argument("--context", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--streams", default="1",
                   help="comma list of concurrent-stream batch sizes to "
                        "measure (multi-stream serving rows)")
    p.add_argument("--stateful", action="store_true",
                   help="also bench the state-carrying streaming step "
                        "(recurrent models) at the same chunk/stream grid")
    p.add_argument("--seam", action="store_true",
                   help="also measure chunked-vs-full decode quality "
                        "(LSD/PESQ) for context in --seam_contexts")
    p.add_argument("--seam_contexts", default="8,16,32")
    p.add_argument("--seam_files", type=int, default=4,
                   help="number of test-filelist utterances to decode")
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
    streams = [int(s) for s in args.streams.split(",")]
    rows = []
    for chunk in [int(c) for c in args.chunks.split(",")]:
        for b in streams:
            row = bench_window(engine, chunk, args.context, args.iters,
                               batch=b)
            print(json.dumps(row))
            rows.append(row)
    record = {
        "device": str(jax.devices()[0]),
        "model": str(h.model_name),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "results": rows,
    }
    supports_state = getattr(type(engine.generator),
                             "supports_stream_state", False)
    if args.stateful and supports_state:
        st_rows = []
        for chunk in [int(c) for c in args.chunks.split(",")]:
            for b in streams:
                row = bench_stateful_window(engine, chunk, args.context,
                                            args.iters, batch=b)
                print(json.dumps(row))
                st_rows.append(row)
        record["stateful"] = {"results": st_rows}
    if args.seam:
        from nvse_tpu.infer.engine import resolve_filelist
        wavs = resolve_filelist(h)[: args.seam_files]
        seam_rows = []
        for ctx in [int(c) for c in args.seam_contexts.split(",")]:
            for mode in (["recompute", "stateful"] if supports_state
                         else ["recompute"]):
                row = bench_seam(engine, wavs, 64, ctx, mode=mode)
                print(json.dumps(row))
                seam_rows.append(row)
        record["seam"] = {
            "causal": bool(h.get("causal")),
            "note": "full-utterance decode as reference vs chunked decode",
            "results": seam_rows,
        }
    json.dump(record, open(args.out, "w"), indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
