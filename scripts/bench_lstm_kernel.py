#!/usr/bin/env python
"""Microbenchmark the LSTM recurrence kernels on BSRNN-M hot shapes.

Compares, at the flagship's time-LSTM shape (T=frames, B=batch*bands)
and band-LSTM shape (T=bands, B=batch*frames):
  unfused   — two independent lstm_scan pallas calls (2T grid steps)
  blockdiag — lstm_scan_bidir, one (2B,2H)@(2H,4H) dot/step (T steps,
              2x total matmul FLOPs; the v5e loser kept for reference)
  dualdot   — lstm_scan_bidir2, two (B,H)@(H,4H) dots/step (T steps,
              FLOP-parity with unfused)

Prints one JSON line per (shape, variant). Sync through the axon tunnel
is a scalar transfer (block_until_ready is a no-op there).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from nvse_tpu.ops.pallas_lstm import (  # noqa: E402
    lstm_scan,
    lstm_scan_bidir,
    lstm_scan_bidir2,
    lstm_scan_fused,
)


def sync(x):
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x))


def bench(fn, args, iters):
    sync(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1024)
    p.add_argument("--bands", type=int, default=68)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    H = args.hidden
    shapes = {
        "time_lstm": (args.frames, args.batch * args.bands),
        "band_lstm": (args.bands, args.batch * args.frames),
    }
    rng = np.random.default_rng(0)
    for name, (T, B) in shapes.items():
        xf = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * .1)
        xb = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * .1)
        wf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * .05)
        wb = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * .05)

        unfused = jax.jit(lambda a, b, c, d: (lstm_scan(a, c), lstm_scan(b, d)))
        dualdot = jax.jit(lstm_scan_bidir2)
        blockdiag = jax.jit(lambda a, b, c, d: lstm_scan_bidir(
            jnp.concatenate([a, b], axis=1), jnp.concatenate([c, d], axis=0)))

        for variant, fn in [("unfused", unfused), ("dualdot", dualdot),
                            ("blockdiag", blockdiag)]:
            ms = bench(fn, (xf, xb, wf, wb), args.iters)
            print(json.dumps({"shape": name, "T": T, "B": B, "H": H,
                              "variant": variant, "ms": round(ms, 3)}),
                  flush=True)

        # fused-projection variants time the WHOLE biLSTM (projection +
        # flips + scan), so compare against "endtoend_unfused" below,
        # not the scan-only rows above.
        C = H
        for dt, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
            x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)
                            * .1).astype(dt)
            wif = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(np.float32)
                              * .05).astype(dt)
            wib = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(np.float32)
                              * .05).astype(dt)
            bf = jnp.zeros(4 * H, dt)
            bb = jnp.zeros(4 * H, dt)
            whf = wf.astype(dt)
            whb = wb.astype(dt)

            def e2e_unfused(x, wif, wib, bf, bb, whf, whb):
                xg_f = jnp.swapaxes(x @ wif + bf, 0, 1)
                xg_b = jnp.swapaxes(jnp.flip(x, axis=1) @ wib + bb, 0, 1)
                hs_f = jnp.swapaxes(lstm_scan(xg_f.astype(jnp.float32),
                                              whf.astype(jnp.float32)), 0, 1)
                hs_b = jnp.swapaxes(lstm_scan(xg_b.astype(jnp.float32),
                                              whb.astype(jnp.float32)), 0, 1)
                return jnp.concatenate([hs_f, jnp.flip(hs_b, axis=1)], -1)

            for variant, fn in [(f"endtoend_unfused_{tag}", jax.jit(e2e_unfused)),
                                (f"fusedproj_{tag}", jax.jit(lstm_scan_fused))]:
                ms = bench(fn, (x, wif, wib, bf, bb, whf, whb), args.iters)
                print(json.dumps({"shape": name, "T": T, "B": B, "H": H,
                                  "variant": variant, "ms": round(ms, 3)}),
                      flush=True)


if __name__ == "__main__":
    main()
