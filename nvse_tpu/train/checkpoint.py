"""Checkpointing: two-bundle g_/do_ layout with keep-N rotation (orbax).

Mirrors the reference scheme (SURVEY.md §5.4, utils.py:51-86,
train_tf_wi_inv.py:288-305): per save step two bundles are written —
``g_{step:08d}`` (generator params only, what inference loads) and
``do_{step:08d}`` (discriminators, both optimizer states, step, epoch).
``scan_checkpoint`` finds the newest bundle of a prefix; rotation keeps
``max_to_keep`` of each.
"""
from __future__ import annotations

import glob
import os
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(path: str, prefix: str, step: int) -> str:
    return os.path.join(path, f"{prefix}{step:08d}")


def scan_checkpoint(path: str, prefix: str) -> str | None:
    """Newest '{prefix}????????' bundle in path (utils.py:81-86)."""
    pattern = os.path.join(path, prefix + "????????")
    cands = [p for p in glob.glob(pattern) if re.match(rf"{re.escape(prefix)}\d{{8}}$", os.path.basename(p))]
    return sorted(cands)[-1] if cands else None


def checkpoint_step(path: str) -> int:
    return int(os.path.basename(path)[-8:])


def _rotate(path: str, prefix: str, keep: int) -> None:
    pattern = os.path.join(path, prefix + "????????")
    cands = sorted(
        p for p in glob.glob(pattern)
        if re.match(rf"{re.escape(prefix)}\d{{8}}$", os.path.basename(p))
    )
    for p in cands[:-keep]:
        shutil.rmtree(p, ignore_errors=True)
    # manifest file listing kept bundles (reference utils.py:64-79 writes
    # checkpoint_g / checkpoint_d manifests during rotation)
    manifest = os.path.join(path, "checkpoint_g" if prefix == "g_" else "checkpoint_d")
    with open(manifest, "w") as f:
        for p in cands[-keep:]:
            f.write(os.path.basename(p) + "\n")


# Async machinery: one long-lived AsyncCheckpointer per prefix (orbax
# serializes saves per checkpointer; two lets g_/do_ overlap their disk
# writes). Device->host copies happen synchronously inside save();
# serialization + fsync run on orbax's background thread, so the train
# loop only ever blocks on the *previous* save having finished.
_ASYNC_CKPTRS: list = []
_PENDING_ROTATE: tuple | None = None


def _async_ckptrs():
    global _ASYNC_CKPTRS
    if not _ASYNC_CKPTRS:
        _ASYNC_CKPTRS = [ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                         for _ in range(2)]
    return _ASYNC_CKPTRS


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save commits, then run its
    deferred keep-N rotation. Call before process exit / restore."""
    global _PENDING_ROTATE
    for c in _ASYNC_CKPTRS:
        c.wait_until_finished()
    if _PENDING_ROTATE is not None:
        path, keep = _PENDING_ROTATE
        _PENDING_ROTATE = None
        _rotate(path, "g_", keep)
        _rotate(path, "do_", keep)


def save_checkpoint(path: str, step: int, epoch: int, gen_state, disc_state,
                    max_to_keep: int = 5, async_save: bool = False) -> None:
    global _PENDING_ROTATE
    os.makedirs(path, exist_ok=True)
    g = {"generator": gen_state.params}
    do = {
        "disc_params": disc_state.params,
        "spectral": disc_state.spectral,
        "optim_g": gen_state.opt_state,
        "optim_d": disc_state.opt_state,
        "steps": step,
        "epoch": epoch,
    }
    gdir, ddir = _ckpt_dir(path, "g_", step), _ckpt_dir(path, "do_", step)
    # ensure any previous async save committed (and rotate it) before
    # touching target dirs — the sync path must wait too, or its
    # _rotate below could delete a bundle still being written
    wait_for_checkpoints()
    for d in (gdir, ddir):
        if os.path.exists(d):
            shutil.rmtree(d)
    if async_save:
        cg, cd = _async_ckptrs()
        cg.save(os.path.abspath(gdir), g)
        cd.save(os.path.abspath(ddir), do)
        if max_to_keep:
            _PENDING_ROTATE = (path, max_to_keep)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(gdir), g)
    ckptr.save(os.path.abspath(ddir), do)
    if max_to_keep:
        _rotate(path, "g_", max_to_keep)
        _rotate(path, "do_", max_to_keep)


def restore_checkpoint(path: str, gen_state, disc_state):
    """Resume from the newest g_/do_ pair; returns
    (gen_state, disc_state, step, epoch) — untouched states and step 0
    if no checkpoint exists (train_tf_wi_inv.py:65-93)."""
    wait_for_checkpoints()  # same-process save->restore (tests, eval-after-train)
    cp_g, cp_do = scan_checkpoint(path, "g_"), scan_checkpoint(path, "do_")
    if cp_g is None or cp_do is None:
        return gen_state, disc_state, 0, -1
    ckptr = ocp.PyTreeCheckpointer()
    g = ckptr.restore(os.path.abspath(cp_g),
                      item={"generator": gen_state.params},
                      restore_args=_host_restore_args(
                          {"generator": gen_state.params}))
    do_item = {
        "disc_params": disc_state.params,
        "spectral": disc_state.spectral,
        "optim_g": gen_state.opt_state,
        "optim_d": disc_state.opt_state,
        "steps": 0,
        "epoch": 0,
    }
    do = ckptr.restore(os.path.abspath(cp_do), item=do_item,
                       restore_args=_host_restore_args(do_item))
    # strong-typed int32 step: a weak Python int here changes the step
    # aval vs what apply_gradients produces, forcing a SECOND full XLA
    # compile of the donated train step right after every resume
    import jax.numpy as jnp
    # two DISTINCT arrays: both states are donated to the train step,
    # and a shared buffer would be donated twice (XLA rejects that)
    step_g = jnp.asarray(int(do["steps"]) + 1, jnp.int32)
    step_d = jnp.asarray(int(do["steps"]) + 1, jnp.int32)
    gen_state = gen_state.replace(params=g["generator"], opt_state=do["optim_g"],
                                  step=step_g)
    disc_state = disc_state.replace(params=do["disc_params"], spectral=do["spectral"],
                                    opt_state=do["optim_d"], step=step_d)
    return gen_state, disc_state, int(do["steps"]) + 1, int(do["epoch"])


def _host_restore_args(item):
    """RestoreArgs tree: deserialize every leaf as a host numpy array.

    Makes restore topology-independent — a bundle saved on TPU loads on
    CPU (and vice versa) without orbax trying to resolve the saved
    sharding against the current process's devices. Callers put arrays
    on device (or shard them over a mesh) afterwards.
    """
    def leaf_args(v):
        if isinstance(v, (int, float)):  # scalar metadata (steps/epoch)
            return ocp.RestoreArgs()
        return ocp.RestoreArgs(restore_type=np.ndarray)

    return jax.tree.map(leaf_args, item)


def load_generator_params(ckpt_path: str, params_template):
    """Load generator params from an explicit g_* bundle path
    (h.checkpoint_file_load, infers/inference_bsrnn.py:44)."""
    wait_for_checkpoints()
    ckptr = ocp.PyTreeCheckpointer()
    item = {"generator": params_template}
    out = ckptr.restore(os.path.abspath(ckpt_path), item=item,
                        restore_args=_host_restore_args(item))
    return out["generator"]
