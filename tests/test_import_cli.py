"""scripts/import_torch_checkpoint.py round-trip: a reference-style
torch g_* checkpoint converts to an orbax bundle whose decoded output
matches the torch model."""
import json
import os
import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_import_cli_round_trip(tmp_path):
    from test_torch_import import H, TorchMRFGen

    torch.manual_seed(0)
    tmodel = TorchMRFGen(H).eval()
    ckpt = tmp_path / "g_ref"
    torch.save({"generator": tmodel.state_dict()}, str(ckpt))
    cfg = tmp_path / "cfg.json"
    json.dump(dict(H), open(cfg, "w"))
    out = tmp_path / "g_imported"

    argv = sys.argv
    sys.argv = ["import_torch_checkpoint.py",
                "--cfg_filename", str(cfg),
                "--torch_ckpt", str(ckpt),
                "--out", str(out)]
    try:
        runpy.run_path(os.path.join(REPO, "scripts",
                                    "import_torch_checkpoint.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv

    from nvse_tpu.models import build_generator
    from nvse_tpu.train.checkpoint import load_generator_params

    gen, _ = build_generator(H)
    tmpl = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 16)))["params"]
    params = load_generator_params(str(out), tmpl)
    mel = np.random.default_rng(0).standard_normal((2, 80, 17)).astype(
        np.float32) - 4
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel)).numpy()
    got = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, atol=2e-4)
