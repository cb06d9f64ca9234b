"""AOT serving export: serialize a compiled decoder to a single artifact.

The reference deploys by shipping a torch checkpoint plus the whole
Python model zoo and re-instantiating `eval(h.model_name)` at load time
(infers/inference_bsrnn.py:57-76). The TPU-native answer is ahead-of-time
export: trace the mel->wav decode once, embed the trained weights as
constants, and serialize the resulting StableHLO program with
`jax.export`. A serving host then needs only `jax` and the artifact —
no model code, no config, no checkpoint machinery — and the program
is exactly the one that was validated at export time.

Artifact layout (single file, npz):
    meta.json      — model name, sample rate, hop, batch/frames spec,
                     export platforms, nvse version
    exported.bin   — jax.export serialized bytes (StableHLO + calling
                     convention + vjp order 0)

Shape policy:
  * frames=N        — static time axis (the fleet's bucketing contract;
                      required for the Pallas-LSTM families, whose
                      kernel grids are sized at trace time).
  * frames=None     — shape-polymorphic time axis ("t"): one artifact
                      decodes any length. Works for the conv/ConvNeXt
                      families (HiFiGAN, iSTFTNet, APNet/2, FreeV,
                      Vocos); the recurrent families reject it at
                      export time with a clear error.

Platform policy: the artifact records the lowering platform(s). An
export taken on TPU bakes the Pallas recurrence kernels in (TPU-only
artifact); `platforms=["cpu"]` (or exporting from a CPU host) traces
the portable XLA-scan path instead (ops/pallas_lstm.py gates on the
lowering backend).
"""
from __future__ import annotations

import io
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from ..models import build_generator, model_input_bins

_FORMAT_VERSION = 1


def _decode_fn(h, gen):
    """(params, mel) -> wav float32, the same contract as the engine."""
    dtype = jnp.bfloat16 if str(h.get("compute_dtype")) == "bfloat16" else None

    def run(params, mel):
        if dtype is not None:
            params = jax.tree.map(lambda x: x.astype(dtype), params)
            mel = mel.astype(dtype)
        out = gen.apply({"params": params}, mel)
        out = out[-1] if isinstance(out, tuple) else out
        return out.astype(jnp.float32)

    return run


def export_decoder(h, params, path: str, batch: int = 1,
                   frames: int | None = None,
                   platforms: list[str] | None = None) -> dict:
    """Trace + serialize the decoder with `params` embedded as constants.

    Returns the metadata dict written into the artifact.
    """
    from jax import export as jexport

    gen, _domain = build_generator(h)
    run = _decode_fn(h, gen)
    # remove_weight_norm parity (Models/hifigan.py:126-133): fold (v, g)
    # pairs into plain kernels before embedding as constants — smaller
    # artifact (one tensor per conv instead of two) and no dead
    # normalisation arithmetic in the exported program
    if bool(h.get("fold_weight_norm", True)):
        from ..models.layers import fold_weight_norm
        params = fold_weight_norm(params)
    params = jax.tree.map(jnp.asarray, params)
    fn = jax.jit(lambda mel: run(params, mel))

    bins = model_input_bins(h)
    if frames is None:
        # shape-polymorphic time axis; recurrent families have
        # trace-time-sized scan/kernel grids and reject symbolic t —
        # surface that as an actionable error instead of a trace dump
        t = jexport.symbolic_shape("t")[0]
        spec = jax.ShapeDtypeStruct((batch, bins, t), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, bins, int(frames)), jnp.float32)

    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    try:
        exp = jexport.export(fn, **kwargs)(spec)
    except Exception as e:
        if frames is None:
            raise ValueError(
                f"{h.model_name}: shape-polymorphic export failed — the "
                "recurrent families (BSRNN/GCRN/HD-Demucs/ConvTasNet) "
                "need a static time axis; re-export with frames=<bucket> "
                f"(original error: {type(e).__name__}: {e})"
            ) from e
        raise

    meta = {
        "format_version": _FORMAT_VERSION,
        "model_name": str(h.model_name),
        "sampling_rate": int(h.sampling_rate),
        "hop_size": int(h.hop_size),
        "input_bins": int(bins),
        "batch": int(batch),
        "frames": None if frames is None else int(frames),
        "platforms": list(exp.platforms),
        "compute_dtype": str(h.get("compute_dtype") or "float32"),
    }
    blob = exp.serialize()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=2))
        z.writestr("exported.bin", blob)
    return meta


class ServingDecoder:
    """A deserialized decoder: `wav = dec(mel)` with zero model code.

    `mel` is (batch, input_bins, frames) float32; for a static-frames
    artifact the shape must match the export spec exactly (pad/bucket on
    the caller side, as the engine does).
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            blob = z.read("exported.bin")
        if self.meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta.get('format_version')} != "
                f"supported {_FORMAT_VERSION}")
        self._exp = jexport.deserialize(blob)
        self._call = jax.jit(self._exp.call)

    def __call__(self, mel) -> jnp.ndarray:
        return self._call(jnp.asarray(mel, jnp.float32))


def load_decoder(path: str) -> ServingDecoder:
    return ServingDecoder(path)
