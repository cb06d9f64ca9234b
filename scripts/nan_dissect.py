#!/usr/bin/env python
"""Reproduce a captured non-finite training step on CPU and find the op.

Loads the (params, opt_state, batch) triple captured by
scripts/nan_hunt.py, rebuilds the train step on the CPU backend, and
runs it under jax_debug_nans so the faulting primitive raises with a
traceback — no TPU tunnel in the way.

    python scripts/nan_dissect.py --event /tmp/nan_event.pkl [--no_debug_nans]
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--event", required=True)
    p.add_argument("--no_debug_nans", action="store_true",
                   help="just run the step and print which metrics are bad")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nvse_tpu.models import build_generator
    from nvse_tpu.train.trainer import create_states, make_train_step
    from nvse_tpu.utils import load_config

    with open(args.event, "rb") as f:
        ev = pickle.load(f)
    h = load_config(ev["cfg_filename"])
    print(f"event: step {ev['step']} model {h.model_name} "
          f"metrics {ev['metrics']}")

    generator, domain = build_generator(h)
    example_T = h.segment_size // h.hop_size + 1
    example = jnp.zeros((2, h.num_mels, example_T), jnp.float32)
    gen_state, disc_state = create_states(
        h, generator, domain, jax.random.PRNGKey(h.seed), 1, example)
    gen_state = gen_state.replace(
        params=ev["gen"]["params"], opt_state=ev["gen"]["opt_state"],
        step=jnp.asarray(ev["gen"]["step"], jnp.int32))
    disc_state = disc_state.replace(
        params=ev["disc"]["params"], opt_state=ev["disc"]["opt_state"],
        step=jnp.asarray(ev["disc"]["step"], jnp.int32))
    if "spectral" in ev["disc"]:
        disc_state = disc_state.replace(spectral=ev["disc"]["spectral"])

    # sanity: are the captured params/opt-state themselves finite?
    for name, tree in (("gen.params", ev["gen"]["params"]),
                       ("gen.opt", ev["gen"]["opt_state"]),
                       ("disc.params", ev["disc"]["params"]),
                       ("disc.opt", ev["disc"]["opt_state"])):
        bad = [jax.tree_util.keystr(kp)
               for kp, x in jax.tree_util.tree_flatten_with_path(tree)[0]
               if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.floating)
               and not np.isfinite(np.asarray(x)).all()]
        print(f"{name}: {'FINITE' if not bad else 'NON-FINITE at ' + str(bad[:8])}")

    if not args.no_debug_nans:
        jax.config.update("jax_debug_nans", True)
    fns = make_train_step(h, generator, domain)
    batch = jnp.asarray(ev["batch"])
    print("running train step on CPU...", flush=True)
    g2, d2, metrics = fns.train_step(gen_state, disc_state, batch, None)
    print({k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
