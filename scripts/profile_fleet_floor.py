#!/usr/bin/env python
"""Attribute ConvTasNet / HD-Demucs decode time between the Griffin-Lim
front end and the network trunk (VERDICT r2 weak #2 / next #3).

Method: component-ablation timing, not trace inspection (the
tensorboard profile plugin is absent in-env and trace JSONs through the
remote-TPU tunnel attribute host stalls, not device time). Three jitted
programs per model at the fleet-bench shape:

  full       — the shipped model (init_phase="griffin_lim", 32 iters)
  zero_phase — same model with init_phase="zero" (GL ablated; identical
               trunk FLOPs, identical shapes)
  gl_only    — inverse_mel + 32-iteration griffin_lim alone

full - zero_phase ~= gl_only cross-checks the attribution. Appends one
JSON line per model to PROFILE_FLOOR.jsonl.

    python scripts/profile_fleet_floor.py [--iters 10] [--batch 8] [--frames 1024]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(compiled, args, iters):
    float(compiled(*args))  # warm
    t0 = time.time()
    s = 0.0
    for _ in range(iters):
        s = compiled(*args)
    float(s)  # scalar transfer = sync through the tunnel
    return (time.time() - t0) / iters


def profile_model(cfg_name: str, iters: int, B: int, T: int) -> dict:
    import jax
    import jax.numpy as jnp

    from nvse_tpu.models import build_generator
    from nvse_tpu.ops import griffin_lim, inverse_mel
    from nvse_tpu.utils import load_config
    from nvse_tpu.utils.flops import compiled_flops, mfu

    h = load_config(os.path.join(os.path.dirname(__file__), "..",
                                 "nvse_tpu", "configs", cfg_name))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, h.num_mels, T)).astype(np.float32) - 4.0)

    def make_synth(hh):
        gen, _ = build_generator(hh)
        params = gen.init(jax.random.PRNGKey(0), mel[:1, :, :16])["params"]

        def synth(params, mel):
            out = gen.apply({"params": params}, mel)
            out = out[-1] if isinstance(out, tuple) else out
            return jnp.sum(out)

        return synth, params

    row = {"model": h.model_name, "batch": B, "frames": T, "iters": iters}

    synth, params = make_synth(h)
    fl_full, comp_full = compiled_flops(synth, params, mel)
    row["full_ms"] = round(1e3 * _time(comp_full, (params, mel), iters), 2)

    h0 = type(h)(dict(h, init_phase="zero"))
    synth0, params0 = make_synth(h0)
    fl_zero, comp_zero = compiled_flops(synth0, params0, mel)
    row["zero_phase_ms"] = round(1e3 * _time(comp_zero, (params0, mel), iters), 2)

    melargs = (h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size,
               h.fmin, h.fmax)

    def gl_only(mel):
        inv = jnp.abs(inverse_mel(mel, *melargs))
        return jnp.sum(griffin_lim(inv, h.n_fft, h.hop_size, h.win_size,
                                   n_iter=32))

    fl_gl, comp_gl = compiled_flops(gl_only, mel)
    row["gl_only_ms"] = round(1e3 * _time(comp_gl, (mel,), iters), 2)

    audio_sec = B * (T - 1) * h.hop_size / h.sampling_rate
    row["rtf_full"] = round(audio_sec / (row["full_ms"] / 1e3), 1)
    row["rtf_zero_phase"] = round(audio_sec / (row["zero_phase_ms"] / 1e3), 1)
    row["gl_share_pct"] = round(
        100.0 * (row["full_ms"] - row["zero_phase_ms"]) / row["full_ms"], 1)
    row["flops_full"] = mfu(fl_full, 1e3 / row["full_ms"])
    row["flops_gl"] = mfu(fl_gl, 1e3 / max(row["gl_only_ms"], 1e-6))
    row["flops_trunk"] = mfu(fl_zero, 1e3 / row["zero_phase_ms"])
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1024)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                 "PROFILE_FLOOR.jsonl"))
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    with open(args.out, "a") as f:
        for cfg in ("convtasnet_config.json", "hddemucas_config.json"):
            row = profile_model(cfg, args.iters, args.batch, args.frames)
            row["device"] = str(jax.devices()[0])
            row["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
            print(json.dumps(row))
            f.write(json.dumps(row) + "\n")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
