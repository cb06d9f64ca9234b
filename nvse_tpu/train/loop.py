"""Full training loop: epochs, checkpoints, TensorBoard, validation.

Replicates the operational contract of the reference trainers
(train_tf_wi_inv.py:158-430): checkpoint every `checkpoint_interval`
with keep-N rotation, scalar summaries every `summary_interval`,
validation (incl. step 0) every `validation_interval` with audio +
mel-figure samples for the first items, hard stop at
`training_steps + 1`, per-epoch LR decay (encoded in the optimizer
schedule), resume from the newest g_/do_ pair.

TPU adaptations: batches are raw audio segments sharded over the mesh;
validation utterances are padded/cropped to a fixed multiple of the
training segment so shapes stay static under jit (the reference runs
ragged batch-1 utterances; metric parity is unaffected since losses are
means).
"""
from __future__ import annotations

import os
import random as _random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PrefetchLoader, SegmentDataset, get_dataset_filelist
from ..models import build_generator
from ..parallel import SEQ_AXIS, batch_sharding, get_mesh
from ..utils import build_env
from .checkpoint import restore_checkpoint, save_checkpoint, wait_for_checkpoints
from .trainer import create_states, fetch_scalars, make_train_step


def _plot_spectrogram(spec: np.ndarray):
    """mpl figure for TB (reference utils.py:23-32)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spec, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    return fig


def _setup_debug(h, log_fn) -> None:
    """Numerics/tracing knobs (SURVEY.md §5.1-2 TPU equivalents).

    h.debug_nans=true is the stand-in for the reference's
    torch.autograd.set_detect_anomaly(True) (train_tf_wi_inv.py:4);
    h.profile_dir enables a jax.profiler trace of the first
    h.profile_steps (default 5) training steps.
    """
    if h.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
        log_fn("jax_debug_nans enabled")


class _StepProfiler:
    def __init__(self, h, log_fn):
        self.dir = h.get("profile_dir")
        self.remaining = int(h.get("profile_steps", 5)) if self.dir else 0
        self.active = False
        self.log_fn = log_fn

    def step(self):
        if not self.dir:
            return
        if self.remaining > 0 and not self.active:
            jax.profiler.start_trace(self.dir)
            self.active = True
            self.log_fn(f"profiler trace started -> {self.dir}")
        elif self.remaining <= 0 and self.active:
            jax.profiler.stop_trace()
            self.active = False
            self.log_fn("profiler trace stopped")
        self.remaining -= 1


def train(h, log_fn=print) -> None:
    """Run training for config h (the reference's train(h) entry)."""
    _setup_debug(h, log_fn)
    profiler = _StepProfiler(h, log_fn)

    import math as _math

    n_proc = jax.process_count()
    n_local = len(jax.local_devices())
    n_sp = max(1, int(h.get("sp_devices", 1)))
    if n_sp > 1 and n_local % n_sp:
        log_fn(f"WARNING: sp_devices={n_sp} does not divide the {n_local} "
               "local devices; disabling sequence parallelism.")
        n_sp = 1
    # h.batch_size is the GLOBAL batch (reference semantics); each host
    # feeds its equal share, and the mesh spans ALL processes' devices
    # so GSPMD all-reduces gradients across hosts (a local-only mesh
    # would silently train divergent per-host models)
    if int(h.batch_size) % n_proc:
        raise ValueError(
            f"batch_size={h.batch_size} must be divisible by the "
            f"{n_proc} participating processes")
    local_batch = int(h.batch_size) // n_proc
    # per host, use as many devices as evenly divide its batch share
    n_data_local = _math.gcd(local_batch, n_local // n_sp)
    n_data = n_data_local * n_proc
    n_dev = n_data * n_sp
    if n_dev != n_proc * n_local:
        log_fn(
            f"WARNING: batch_size={h.batch_size} is not divisible by the "
            f"{n_proc * (n_local // n_sp)} available data-parallel devices; "
            f"training will use only {n_dev} device(s). Set batch_size to a "
            f"multiple of {n_proc * (n_local // n_sp)} to use the full mesh."
        )
    if n_sp > 1:
        # dual-path sequence parallelism (BSRNN): shard bands/frames over
        # the 'seq' mesh axis in addition to batch over 'data'
        h["sp_axis"] = SEQ_AXIS
    mesh = (get_mesh(n_dev, n_seq=n_sp, global_=n_proc > 1)
            if n_dev > 1 else None)
    generator, domain = build_generator(h)

    training_files, validation_files = get_dataset_filelist(
        h.input_training_wav_list, h.input_validation_wav_list, h.raw_wavfile_path
    )

    # multi-host: each process loads its static shard of the filelist
    train_ds = SegmentDataset(training_files, h.segment_size, h.sampling_rate,
                              seed=h.seed, shard_id=jax.process_index(),
                              num_shards=jax.process_count())
    loader = PrefetchLoader(train_ds, h.batch_size, num_workers=h.num_workers,
                            seed=h.seed)
    steps_per_epoch = max(1, len(loader))

    # validation semantics (reference train_tf_wi_inv.py:313-417):
    # COMPLETE utterances at batch 1. Utterances are zero-padded up to a
    # bucket multiple so jit sees a bounded set of static shapes, and
    # eval_full masks every metric to the frames that depend only on
    # real samples. validation_full=false restores the old fixed-crop
    # validation (cheaper: one compiled shape).
    val_full = bool(h.get("validation_full", True))
    val_len = h.segment_size * 4
    val_ds = SegmentDataset(validation_files, val_len, h.sampling_rate,
                            split=not val_full, shuffle=False, seed=h.seed)
    val_bucket = int(h.get("validation_bucket_frames", 64)) * h.hop_size

    example_T = h.segment_size // h.hop_size + 1
    example = jnp.zeros((2, h.num_mels, example_T), jnp.float32)
    rng = jax.random.PRNGKey(h.seed)
    gen_state, disc_state = create_states(h, generator, domain, rng,
                                          steps_per_epoch, example)

    os.makedirs(h.checkpoint_path, exist_ok=True)
    if h.get("config_path"):
        build_env(h.config_path, "config.json", h.checkpoint_path)
    gen_state, disc_state, steps, last_epoch = restore_checkpoint(
        h.checkpoint_path, gen_state, disc_state
    )
    # resume the loader's shuffle/crop streams from the restored epoch
    # instead of replaying epoch 0's (mirrors loop_joint)
    loader.epoch = max(0, last_epoch)
    log_fn(f"checkpoints directory: {h.checkpoint_path} (resuming at step {steps})")

    fns = make_train_step(h, generator, domain, mesh=mesh)

    try:
        from tensorboardX import SummaryWriter
        sw = SummaryWriter(os.path.join(h.checkpoint_path, "logs"))
    except Exception:
        sw = None

    gt_logged = [False]

    def validate(step: int) -> None:
        # metric rows stay ON DEVICE until one stacked fetch at the end:
        # per-item per-scalar float() is a tunnel round trip each, which
        # made every validation pass minutes long
        dev_rows: list = []
        keys: list[str] | None = None
        count = 0
        # all-ground-truth-adds-succeeded flag for THIS pass; a single
        # failure anywhere must keep it False so the next pass retries
        gt_added = [True]
        # default = the FULL validation set, matching the reference
        # (train_tf_wi_inv.py:313-417); set validation_cap>0 to bound
        # the per-validation cost on large corpora
        cap = int(h.get("validation_cap", 0))
        n_val = len(val_ds) if cap <= 0 else min(len(val_ds), cap)
        for i in range(n_val):
            if val_full:
                # complete utterance, zero-padded to a bucket multiple;
                # metrics masked to the true length inside eval_full
                wav = val_ds.segment_at(i, _random.Random(0))
                n = len(wav)
                tgt = max(val_bucket, ((n + val_bucket - 1) // val_bucket)
                          * val_bucket)
                audio = jnp.asarray(np.pad(wav, (0, tgt - n))[None, :])
                y_g, metrics = fns.eval_full(
                    gen_state, audio, jnp.asarray(n, jnp.int32))
            else:
                # fixed per-item crop rng: every validation pass must
                # score the SAME audio or the metric curves aren't
                # comparable (the shared dataset rng advances between
                # passes)
                audio = jnp.asarray(
                    val_ds.segment_at(i, _random.Random(0x5EED + i))[None, :])
                y_g, metrics = fns.eval_step(gen_state, audio, None)
            if keys is None:
                keys = sorted(metrics)
            dev_rows.append(jnp.stack([jnp.asarray(metrics[k], jnp.float32)
                                       for k in keys]))
            count += 1
            if sw is not None and i < 4:
                try:  # tensorboardX audio encoding needs soundfile
                    wav = np.asarray(y_g[0])
                    sw.add_audio(f"generated/y_hat_{i}", wav[:, None], step, h.sampling_rate)
                    if not gt_logged[0]:
                        # ground-truth audio + mel figure, logged once
                        # (reference train_tf_wi_inv.py:363-377)
                        gt = np.asarray(audio[0])
                        sw.add_audio(f"gt/y_{i}", gt[:, None], step, h.sampling_rate)
                except Exception:
                    gt_added[0] = False
                if i == 0:
                    try:  # mel figure like reference train_tf_wi_inv.py:363-394
                        from ..ops import mel_spectrogram
                        m = np.asarray(mel_spectrogram(
                            y_g[:1], h.n_fft, h.num_mels, h.sampling_rate,
                            h.hop_size, h.win_size, h.fmin, h.sampling_rate / 2))[0]
                        sw.add_figure("generated/y_hat_spec", _plot_spectrogram(m), step)
                        if not gt_logged[0]:
                            mg = np.asarray(mel_spectrogram(
                                audio[:1], h.n_fft, h.num_mels, h.sampling_rate,
                                h.hop_size, h.win_size, h.fmin, h.sampling_rate / 2))[0]
                            sw.add_figure("gt/y_spec", _plot_spectrogram(mg), step)
                    except Exception:
                        gt_added[0] = False
        # mark gt-logged only if the adds actually reached TensorBoard
        # (sw present and no add_audio/add_figure raised) so a transient
        # failure retries on the next validation pass
        if sw is not None and gt_added[0] and count:
            gt_logged[0] = True
        if count:
            sums = np.asarray(jnp.sum(jnp.stack(dev_rows), axis=0))
            agg = dict(zip(keys, sums))
            for k, v in agg.items():
                if sw is not None:
                    sw.add_scalar(f"validation/{k}", float(v) / count, step)
            log_fn(f"step {step} validation: " +
                   " ".join(f"{k}={v / count:.4f}" for k, v in sorted(agg.items())))

    log_fn(f"training {h.model_name} ({domain}-domain) on "
           f"{len(train_ds)} files, {steps_per_epoch} steps/epoch, "
           f"{n_dev} device(s)")

    def device_batches(loader):
        """H2D prefetch: dispatch the next batch's transfer while the
        current step computes (device_put is async)."""
        def put(b):
            # device_put straight from the host array: one async H2D
            # split per shard (a jnp.asarray first would commit the
            # whole batch to device 0 and pay a second reshard)
            if mesh is None:
                return jax.device_put(np.asarray(b))
            if jax.process_count() > 1:
                # each process contributes its local batch rows to the
                # global array laid out over the global mesh
                return jax.make_array_from_process_local_data(
                    batch_sharding(mesh), np.asarray(b))
            return jax.device_put(np.asarray(b), batch_sharding(mesh))

        it = iter(loader)
        try:
            nxt = put(next(it))
        except StopIteration:
            return
        for b in it:
            cur, nxt = nxt, put(b)
            yield cur
        yield nxt

    for epoch in range(max(0, last_epoch), h.training_epochs):
        t0 = time.time()
        for audio in device_batches(loader):
            t_step = time.time()
            profiler.step()
            gen_state, disc_state, metrics = fns.train_step(
                gen_state, disc_state, audio, None
            )

            want_stdout = steps % h.stdout_interval == 0
            want_summary = sw is not None and steps % h.summary_interval == 0
            if want_stdout or want_summary:
                # ONE device->host transfer for the whole metrics dict:
                # per-scalar float() is a full tunnel round trip each
                # (measured ~160s per 12-scalar fetch pair on axon)
                m = fetch_scalars(metrics)
            if want_stdout:
                log_fn(f"epoch {epoch + 1} step {steps} "
                       + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                       + f" ({time.time() - t_step:.3f}s/b)")

            if steps % h.checkpoint_interval == 0 and steps != 0:
                save_checkpoint(h.checkpoint_path, steps, epoch, gen_state,
                                disc_state, max_to_keep=h.max_to_keep,
                                async_save=bool(h.get("async_checkpoint", True)))
                log_fn(f"saved checkpoint at step {steps}")

            if want_summary:
                for k, v in m.items():
                    sw.add_scalar(f"training/{k}", v, steps)

            if steps % h.validation_interval == 0 and not (
                    steps == 0 and h.get("skip_step0_validation", False)):
                # Reference validates at step 0 too (train_tf_wi_inv.py:313);
                # the knob exists because step-0 validation forces eval_full
                # bucket compiles (~minutes each on a remote TPU) before the
                # first real step — opt in for short A/B runs.
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
