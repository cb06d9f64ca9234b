#!/usr/bin/env python
"""Locate the exact step + batch where a GAN training run goes non-finite.

Resumes from the newest checkpoint in --ckpt, replays the training
stream with on-device finiteness flags fetched every --window steps
(cheap through the high-latency tunnel), keeps an on-device copy of the
states at every verified-finite window boundary plus a host ring buffer
of recent batches, and when a window contains a non-finite step replays
it step-by-step from the last good boundary to capture the offending
(params, opt_state, batch) triple to --out as a pickle.

The captured triple makes the event a pure function reproducible on CPU
(scripts/nan_dissect.py) where the faulting op can be bisected without
the tunnel in the way.

    python scripts/nan_hunt.py --cfg_filename <cfg> --ckpt <dir> \
        [--max_steps 4000] [--window 25] [--out /tmp/nan_event.pkl]
"""
import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def copy_state(state):
    import jax

    return jax.tree.map(lambda x: None if x is None else x + 0, state,
                        is_leaf=lambda x: x is None)


def extract(state):
    """Picklable core of a TrainState (drops tx/apply_fn closures)."""
    import jax

    out = {"params": jax.device_get(state.params),
           "opt_state": jax.device_get(state.opt_state),
           "step": int(state.step)}
    spectral = getattr(state, "spectral", None)
    if spectral is not None:
        out["spectral"] = jax.device_get(spectral)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--max_steps", type=int, default=4000)
    p.add_argument("--window", type=int, default=25)
    p.add_argument("--out", default="/tmp/nan_event.pkl")
    p.add_argument("--epoch_base", type=int, default=0,
                   help="loader epoch counter at the first replayed step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nvse_tpu.data import PrefetchLoader, SegmentDataset, get_dataset_filelist
    from nvse_tpu.models import build_generator
    from nvse_tpu.train.checkpoint import restore_checkpoint
    from nvse_tpu.train.trainer import create_states, make_train_step
    from nvse_tpu.utils import load_config

    h = load_config(args.cfg_filename)
    h["checkpoint_path"] = args.ckpt
    generator, domain = build_generator(h)
    training_files, _ = get_dataset_filelist(
        h.input_training_wav_list, h.input_validation_wav_list, h.raw_wavfile_path)
    train_ds = SegmentDataset(training_files, h.segment_size, h.sampling_rate,
                              seed=h.seed)
    loader = PrefetchLoader(train_ds, h.batch_size, num_workers=h.num_workers,
                            seed=h.seed)
    loader.epoch = args.epoch_base

    example_T = h.segment_size // h.hop_size + 1
    example = jnp.zeros((2, h.num_mels, example_T), jnp.float32)
    rng = jax.random.PRNGKey(h.seed)
    gen_state, disc_state = create_states(h, generator, domain, rng,
                                          max(1, len(loader)), example)
    gen_state, disc_state, step0, _ = restore_checkpoint(
        args.ckpt, gen_state, disc_state)
    print(f"restored step {step0} from {args.ckpt}", flush=True)
    fns = make_train_step(h, generator, domain)

    W = args.window
    flags = []          # device scalars, fetched every W steps
    batches = []        # host ring of the current window's batches
    good_gen = copy_state(gen_state)
    good_disc = copy_state(disc_state)
    good_step = step0

    def batch_stream():
        while True:
            for b in loader:
                yield b

    t0 = time.time()
    stream = batch_stream()
    for s in range(args.max_steps):
        batch = next(stream)
        batches.append(np.asarray(batch))
        audio = jnp.asarray(batch)
        gen_state, disc_state, metrics = fns.train_step(
            gen_state, disc_state, audio, None)
        flags.append(sum(jnp.asarray(v) for v in metrics.values()))

        if len(flags) == W:
            vals = np.asarray(jax.device_get(flags))
            if np.isfinite(vals).all():
                good_gen = copy_state(gen_state)
                good_disc = copy_state(disc_state)
                good_step = step0 + s + 1
                flags, batches = [], []
                if (s + 1) % (W * 8) == 0:
                    rate = (s + 1) / (time.time() - t0)
                    print(f"step {step0 + s + 1} finite "
                          f"({rate:.1f} steps/s)", flush=True)
                continue
            bad_off = int(np.argmin(np.isfinite(vals)))
            print(f"non-finite in window: global step "
                  f"{good_step + bad_off} (offset {bad_off})", flush=True)
            # precise replay from the last good boundary. A step can be
            # poisoned in the BACKWARD pass only: its metrics (computed
            # from the pre-update params) stay finite while the updated
            # params go inf/NaN — so check the post-step params too and
            # capture the first step where either goes bad.
            def params_finite(state):
                leaves = jax.tree.leaves(state.params)
                return bool(jnp.all(jnp.asarray(
                    [jnp.all(jnp.isfinite(x)) for x in leaves
                     if jnp.issubdtype(x.dtype, jnp.floating)])))

            g, d = copy_state(good_gen), copy_state(good_disc)
            for j, b in enumerate(batches):
                pre_g, pre_d = copy_state(g), copy_state(d)
                g, d, m = fns.train_step(g, d, jnp.asarray(b), None)
                tot = float(sum(jnp.asarray(v) for v in m.values()))
                ok = np.isfinite(tot) and params_finite(g) and params_finite(d)
                print(f"  replay step {good_step + j}: "
                      f"{'FINITE' if ok else 'NON-FINITE'} "
                      f"(loss_sum={tot:.4f})", flush=True)
                if not ok:
                    payload = {
                        "step": good_step + j,
                        "batch": np.asarray(b),
                        "gen": extract(pre_g),
                        "disc": extract(pre_d),
                        "cfg_filename": os.path.abspath(args.cfg_filename),
                        "metrics": {k: float(v) for k, v in m.items()},
                    }
                    with open(args.out, "wb") as f:
                        pickle.dump(payload, f)
                    print(f"captured pre-step state + batch -> {args.out}",
                          flush=True)
                    return
            print("replay stayed finite — non-determinism in the stream? "
                  "rerun with a smaller --window", flush=True)
            return
    print("no non-finite step within --max_steps", flush=True)


if __name__ == "__main__":
    main()
