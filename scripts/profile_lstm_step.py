#!/usr/bin/env python
"""Per-grid-step latency breakdown of the fused Pallas LSTM kernel.

The flagship BSRNN fleet is sequential-latency-bound on the LSTM
recurrence (PERF.md): RTF is set by (#grid steps) x (per-step wall).
This script decomposes the per-step wall into its parts by timing
ablated kernel variants at the real model shapes:

  full      — the production kernel: input DMA + x@W_ih + h@W_hh +
              nonlinearities + state update + output DMA
  no_indma  — input tile index map pinned to block 0: the pipeline
              fetches one input block instead of streaming T/k of them
              -> isolates the INPUT DMA share
  no_dot    — gates = x + bias (no h@W_hh, no x@W_ih dot): the
              dependent-matmul share (the critical path's MXU work)
  no_vpu    — gates pass through without sigmoid/tanh: the VPU
              nonlinearity share
  empty     — kernel only writes the (zero) state to the output block:
              the floor = grid/Mosaic dispatch + output DMA

Each variant runs the same grid, same block shapes, same output
traffic. Prints one JSON line per (shape, variant, k); writes
PROFILE_LSTM_STEP.jsonl. Sync through the axon tunnel is a scalar
transfer (block_until_ready is a no-op there).
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def _variant_kernel(k: int, mode: str):
    def kernel(xf_ref, wif_ref, whf_ref, b_ref, out_ref, h_s, c_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_s[...] = jnp.zeros_like(h_s)
            c_s[...] = jnp.zeros_like(c_s)

        if mode == "empty":
            out_ref[0] = h_s[...].astype(out_ref.dtype)
            return

        h, c = h_s[...], c_s[...]
        H = h.shape[-1]
        wif, whf, b = wif_ref[...], whf_ref[...], b_ref[0]
        for i in range(k):
            if mode == "no_dot":
                # keep the input read + a VPU-cheap expansion to 4H, drop
                # both MXU dots (requires C == H, true for all shapes here)
                gates = jnp.tile(xf_ref[i], (1, 4)) * 0.25 + b
            else:
                gates = (jnp.dot(xf_ref[i], wif,
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(h, whf, preferred_element_type=jnp.float32)
                         + b)
            if mode == "no_vpu":
                c = gates[:, :H] + c * 0.5
                h = gates[:, H: 2 * H] + c * 0.5
            else:
                ig = jax.nn.sigmoid(gates[:, :H])
                fg = jax.nn.sigmoid(gates[:, H: 2 * H])
                gg = jnp.tanh(gates[:, 2 * H: 3 * H])
                og = jax.nn.sigmoid(gates[:, 3 * H:])
                c = fg * c + ig * gg
                h = og * jnp.tanh(c)
            out_ref[i] = h.astype(out_ref.dtype)
        h_s[...] = h
        c_s[...] = c

    return kernel


def build(T, B, C, H, k, mode, dtype=jnp.float32):
    Bt = (B + 7) // 8 * 8
    Tb = -(-T // k)
    T_pad = Tb * k

    xin = jnp.zeros((T_pad, Bt, C), dtype)
    wif = jnp.zeros((C, 4 * H), dtype)
    whf = jnp.zeros((H, 4 * H), dtype)
    b = jnp.zeros((1, 4 * H), dtype)

    in_idx = (lambda bb, t: (0, bb, 0)) if mode == "no_indma" \
        else (lambda bb, t: (t, bb, 0))
    call = pl.pallas_call(
        _variant_kernel(k, mode),
        grid=(1, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, C), in_idx),
            pl.BlockSpec((C, 4 * H), lambda bb, t: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda bb, t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda bb, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k, Bt, H), lambda bb, t: (t, bb, 0)),
        out_shape=jax.ShapeDtypeStruct((T_pad, Bt, H), dtype),
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32),
                        pltpu.VMEM((Bt, H), jnp.float32)],
    )
    fn = jax.jit(lambda x: call(x, wif, whf, b))
    return fn, xin, Tb


def sync(x):
    return float(jnp.sum(x))


def bench(fn, x, iters):
    sync(fn(x))
    t0 = time.time()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--shapes", default="m_time,m_band,l_time,l_band",
                   help="comma subset of m_time,m_band,l_time,l_band")
    p.add_argument("--ks", default="1,2,4,8")
    p.add_argument("--append", action="store_true",
                   help="append to --out instead of overwriting")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PROFILE_LSTM_STEP.jsonl"))
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rows = []
    # (label, T, B, C, H): time-LSTM runs (bands x batch) rows over
    # frames; band-LSTM runs (frames x batch) rows over the 34 bands
    # (one Bt=1024 chooser tile probed here)
    all_shapes = {
        "m_time": ("bsrnn_m_time", 1024, 272, 128, 128),
        "m_band": ("bsrnn_m_band_tile", 34, 1024, 128, 128),
        "l_time": ("bsrnn_l_time", 1024, 272, 256, 256),
        "l_band": ("bsrnn_l_band_tile", 34, 1024, 256, 256),
    }
    shapes = [all_shapes[s] for s in args.shapes.split(",")]
    ks = [int(k) for k in args.ks.split(",")]
    with open(args.out, "a" if args.append else "w") as f:
        for label, T, B, C, H in shapes:
            for k in ks:
                for mode in ("full", "no_indma", "no_dot", "no_vpu", "empty"):
                    try:
                        fn, xin, Tb = build(T, B, C, H, k, mode, dtype=dtype)
                        ms = bench(fn, xin, args.iters)
                    except Exception as e:  # VMEM overflow etc.
                        print(f"# {label} k={k} {mode}: {type(e).__name__}",
                              flush=True)
                        continue
                    row = {"shape": label, "T": T, "B": B, "C": C, "H": H,
                           "k": k, "dtype": args.dtype,
                           "grid_steps": Tb, "variant": mode,
                           "ms": round(ms, 4),
                           "us_per_grid_step": round(ms * 1e3 / Tb, 3)}
                    print(json.dumps(row), flush=True)
                    rows.append(row)
                    f.write(json.dumps(row) + "\n")
                    f.flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
