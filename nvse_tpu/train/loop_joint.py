"""Joint denoise+vocoder training loop (BSRNN_24k).

Mirrors train_tf_wi_inv_joint_denoise_vocoder.py:43-445: the joint
dataset draws a task per batch (50/50 denoise/vocoder), noise mixing
happens on host (LUFS-SNR), features on device. One compiled train step
per task (the task is a static branch, so each specialisation compiles
once and is reused).
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.joint_dataset import JointDataset, PrefetchJointLoader, get_joint_filelist
from ..models import build_generator
from ..parallel import batch_sharding, get_mesh
from ..utils import build_env
from .checkpoint import restore_checkpoint, save_checkpoint, wait_for_checkpoints
from .trainer import create_states, fetch_scalars, make_train_step


def train_joint(h, log_fn=print) -> None:
    generator, _ = build_generator(h)
    domain = "joint"

    train_files, val_files, train_noise, val_noise = get_joint_filelist(
        h.input_training_wav_list, h.input_validation_wav_list,
        h.raw_wavfile_path, h.input_noise_wav_list,
    )
    log_fn(f"joint training: {len(train_files)} speech files, "
           f"{len(train_noise)} noise files")

    import math as _math
    n_proc = jax.process_count()
    n_local = len(jax.local_devices())
    # global mesh across processes (a local-only mesh would skip the
    # cross-host gradient all-reduce); h.batch_size = global batch.
    # NOTE: JointDataset is self-batching, so multi-host joint training
    # would also need per-host batch slicing — gate it explicitly.
    if n_proc > 1:
        raise NotImplementedError(
            "multi-host joint training needs per-host slicing of the "
            "self-batching JointDataset; use the single-task trainers "
            "for multi-host runs")
    n_dev = _math.gcd(int(h.batch_size), n_local)
    if n_dev != n_local:
        log_fn(
            f"WARNING: batch_size={h.batch_size} is not divisible by the "
            f"{n_local} available devices; training will use only {n_dev} "
            f"device(s). Set batch_size to a multiple of {n_local} to use "
            "the full mesh."
        )
    mesh = get_mesh(n_dev) if n_dev > 1 else None

    ds = JointDataset(
        train_files, train_noise, tuple(h.snr_range), h.segment_size,
        h.sampling_rate, h.batch_size, task_dict=h.task_dict, seed=h.seed,
    )
    loader = PrefetchJointLoader(ds, num_workers=h.get("num_workers", 4),
                                 seed=h.seed)
    steps_per_epoch = max(1, len(ds))

    example_F = h.n_fft // 2 + 1
    example_T = h.segment_size // h.hop_size + 1
    example = jnp.zeros((2, example_F, example_T), jnp.float32)
    gen_state, disc_state = create_states(
        h, generator, domain, jax.random.PRNGKey(h.seed), steps_per_epoch, example
    )

    os.makedirs(h.checkpoint_path, exist_ok=True)
    if h.get("config_path"):
        build_env(h.config_path, "config.json", h.checkpoint_path)
    gen_state, disc_state, steps, last_epoch = restore_checkpoint(
        h.checkpoint_path, gen_state, disc_state
    )
    # Per-batch seeds are (seed, loader.epoch, index)-deterministic; on
    # resume continue the augmentation/noise/task streams from the
    # restored epoch instead of replaying epoch 0's.
    loader.epoch = max(0, last_epoch)

    step_fns = {
        task: make_train_step(h, generator, domain, mesh=mesh, joint_task=task)
        for task in ("denoise", "vocoder")
    }

    try:
        from tensorboardX import SummaryWriter
        sw = SummaryWriter(os.path.join(h.checkpoint_path, "logs"))
    except Exception:
        sw = None

    val_ds = JointDataset(
        val_files, val_noise, tuple(h.snr_range), h.segment_size,
        h.sampling_rate, batch_size=1, task_dict=h.task_dict,
        shuffle=False, seed=h.seed,
    ) if val_files else None

    def validate(step: int) -> None:
        if val_ds is None:
            return
        for task in ("denoise", "vocoder"):
            dev_rows, keys = [], None  # one fetch per task, not per scalar
            count = 0
            for i in range(min(len(val_ds.speech_files), 8)):
                val_ds.task_dict = [task]
                # fixed per-item seed: every validation pass must score
                # the SAME noise/SNR/crop draws or the metric curves
                # aren't comparable across steps (the shared-RNG call
                # advances state between passes)
                noisy, clean, _ = val_ds.get_batch(
                    i, seed=int(h.seed) * 1_000_003 + i)
                _, metrics = step_fns[task].eval_step(
                    gen_state, jnp.asarray(clean), jnp.asarray(noisy)
                )
                if keys is None:
                    keys = sorted(metrics)
                dev_rows.append(jnp.stack(
                    [jnp.asarray(metrics[k], jnp.float32) for k in keys]))
                count += 1
            if count:
                sums = np.asarray(jnp.sum(jnp.stack(dev_rows), axis=0))
                agg = dict(zip(keys, [float(v) for v in sums]))
                for k, v in agg.items():
                    if sw is not None:
                        sw.add_scalar(f"validation/{task}/{k}", v / count, step)
                log_fn(f"step {step} val[{task}]: " +
                       " ".join(f"{k}={v / count:.4f}" for k, v in sorted(agg.items())))

    def device_batches():
        """H2D prefetch on top of the threaded host loader: dispatch the
        next batch's transfer while the current step computes."""
        def put(noisy, clean, task):
            # single async H2D per shard, straight from the host arrays
            if mesh is None:
                return (jax.device_put(np.asarray(clean)),
                        jax.device_put(np.asarray(noisy)), task)
            sh = batch_sharding(mesh)
            if jax.process_count() > 1:
                mk = jax.make_array_from_process_local_data
                return mk(sh, np.asarray(clean)), mk(sh, np.asarray(noisy)), task
            return (jax.device_put(np.asarray(clean), sh),
                    jax.device_put(np.asarray(noisy), sh), task)

        it = iter(loader)
        try:
            nxt = put(*next(it))
        except StopIteration:
            return
        for b in it:
            cur, nxt = nxt, put(*b)
            yield cur
        yield nxt

    for epoch in range(max(0, last_epoch), h.training_epochs):
        t0 = time.time()
        for clean_j, noisy_j, task in device_batches():
            gen_state, disc_state, metrics = step_fns[task].train_step(
                gen_state, disc_state, clean_j, noisy_j
            )

            want_stdout = steps % h.stdout_interval == 0
            want_summary = sw is not None and steps % h.summary_interval == 0
            if want_stdout or want_summary:
                # ONE device->host transfer for the whole metrics dict
                # (per-scalar float() is a tunnel round trip each;
                # measured ~160s per stdout step on axon)
                m = fetch_scalars(metrics)
            if want_stdout:
                log_fn(f"epoch {epoch + 1} step {steps} task={task} "
                       + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())))
            if steps % h.checkpoint_interval == 0 and steps != 0:
                save_checkpoint(h.checkpoint_path, steps, epoch, gen_state,
                                disc_state, max_to_keep=h.max_to_keep,
                                async_save=bool(h.get("async_checkpoint", True)))
            if want_summary:
                for k, v in m.items():
                    sw.add_scalar(f"training/{task}/{k}", v, steps)
            if steps % h.validation_interval == 0 and not (
                    steps == 0 and h.get("skip_step0_validation", False)):
                # Same knob as loop.py: skip the step-0 eval_full bucket
                # compiles for short A/B runs (reference validates at 0).
                validate(steps)

            steps += 1
            if steps > h.training_steps:
                wait_for_checkpoints()  # commit in-flight async save first
                save_checkpoint(h.checkpoint_path, steps - 1, epoch, gen_state,
                                disc_state, max_to_keep=h.max_to_keep)
                log_fn("training finished (step budget reached)")
                return
        log_fn(f"epoch {epoch + 1} took {int(time.time() - t0)}s")
    wait_for_checkpoints()  # commit any in-flight async save before exit
