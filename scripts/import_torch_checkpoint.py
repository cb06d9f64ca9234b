#!/usr/bin/env python
"""Convert a reference PyTorch g_* checkpoint into an nvse_tpu bundle.

Drop-in migration path for users of the reference repo: point this at
one of its saved generators ({"generator": state_dict}, reference
utils.py:59-62) and get an orbax bundle loadable via
h.checkpoint_file_load by every inference CLI here.

    python scripts/import_torch_checkpoint.py \
        --cfg_filename nvse_tpu/configs/bsrnn_config.json \
        --torch_ckpt /path/to/g_02500000 \
        --out /path/to/ckpts/g_02500000_jax

The model family comes from the config's model_name; the numeric
mapping is the same per-family importer the parity tests validate
against independent torch oracles (tests/test_torch_parity.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def importer_for(model_name: str):
    from nvse_tpu.utils import torch_import as ti

    table = {
        "HiFiGAN": ti.import_mrf_generator,
        "iSTFTNet": ti.import_mrf_generator,
        "APNet": ti.import_apnet,
        "APNet2": ti.import_apnet2,
        "FreeV": ti.import_freev,
        "Vocos": ti.import_vocos,
        "BSRNN": ti.import_bsrnn,
        "BSRNN_24k": ti.import_bsrnn,
        "GCRN": ti.import_gcrn,
        "ConvTasNet": ti.import_convtasnet,
        "HDDemucas": ti.import_hddemucas,
    }
    if model_name not in table:
        raise SystemExit(f"no importer for model_name={model_name!r} "
                         f"(have: {sorted(table)})")
    return table[model_name]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_filename", required=True)
    p.add_argument("--torch_ckpt", required=True,
                   help="reference g_* file (torch.save'd "
                        "{'generator': state_dict})")
    p.add_argument("--out", required=True,
                   help="output orbax bundle dir (use as "
                        "h.checkpoint_file_load)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from nvse_tpu.models import build_generator, model_input_bins
    from nvse_tpu.utils import load_config
    from nvse_tpu.utils.torch_import import load_torch_generator

    h = load_config(args.cfg_filename)
    gen, _ = build_generator(h)
    template = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, model_input_bins(h), 16))
    )["params"]
    sd = load_torch_generator(args.torch_ckpt)
    params = importer_for(h.model_name)(sd, template, h)

    import numpy as np

    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    host = jax.tree.map(np.asarray, params)
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.out),
                                  {"generator": host})
    print(f"imported {h.model_name}: {n/1e6:.2f}M params "
          f"{args.torch_ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
