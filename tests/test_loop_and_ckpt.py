"""End-to-end loop test: synthetic wavs -> filelist -> train -> resume.

Exercises the whole operational spine (data pipeline, jitted GAN step,
checkpoint save/rotate/restore) at tiny sizes, mirroring the reference
trainer contract (SURVEY.md §3.1, §5.4).
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.data import PrefetchLoader, SegmentDataset, get_dataset_filelist, load_wav, write_wav
from nvse_tpu.models import build_generator
from nvse_tpu.train import create_states
from nvse_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    scan_checkpoint,
)
from nvse_tpu.train.loop import train
from nvse_tpu.utils import AttrDict


@pytest.fixture
def wav_env(tmp_path):
    sr = 22050
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(6):
        t = np.arange(4096) / sr
        x = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t) + 0.01 * rng.standard_normal(4096)
        name = f"SY{i:03d}.wav"
        write_wav(str(wav_dir / name), x.astype(np.float32), sr)
        names.append(name)
    train_list = tmp_path / "train.txt"
    val_list = tmp_path / "val.txt"
    train_list.write_text("".join(f"DUMMY1/{n}|text\n" for n in names[:4]))
    val_list.write_text("".join(f"DUMMY1/{n}|text\n" for n in names[4:]))
    return tmp_path, str(wav_dir), str(train_list), str(val_list)


def test_wav_roundtrip(tmp_path):
    sr = 22050
    x = (np.sin(np.linspace(0, 100, 5000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    y = load_wav(p, sr)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-3)
    # resample path
    y2 = load_wav(p, 16000)
    assert abs(len(y2) - int(len(x) * 16000 / sr)) <= 1


def test_dataset_and_loader(wav_env):
    _, wav_dir, train_list, val_list = wav_env
    tr, va = get_dataset_filelist(train_list, val_list, wav_dir)
    assert len(tr) == 4 and len(va) == 2
    ds = SegmentDataset(tr, segment_size=2048, sampling_rate=22050)
    assert len(ds) == 4
    seg = ds[0]
    assert seg.shape == (2048,) and seg.dtype == np.float32
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (2, 2048)


def _tiny_h(tmp_path, wav_dir, train_list, val_list):
    return AttrDict(dict(
        model_name="HiFiGAN", resblock="2",
        upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        input_training_wav_list=train_list, input_validation_wav_list=val_list,
        raw_wavfile_path=wav_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        batch_size=2, learning_rate=2e-4, adam_b1=0.8, adam_b2=0.99,
        lr_decay=0.999, seed=1234, training_steps=2, training_epochs=100,
        stdout_interval=1, checkpoint_interval=2, summary_interval=1,
        validation_interval=1000, max_to_keep=2,
        # exercise the skip-step0-validation knob (loop.py); the joint
        # loop test keeps step-0 validation so validate() stays covered
        skip_step0_validation=True,
        mpd_reshapes=[2, 3, 5, 7, 11], segment_size=2048, num_mels=80,
        n_fft=1024, hop_size=256, win_size=1024, sampling_rate=22050,
        fmin=0, fmax=8000, meloss=None, num_workers=2,
    ))


@pytest.mark.slow
def test_train_loop_runs_and_checkpoints(wav_env):
    tmp_path, wav_dir, train_list, val_list = wav_env
    h = _tiny_h(tmp_path, wav_dir, train_list, val_list)
    logs = []
    train(h, log_fn=logs.append)
    assert scan_checkpoint(h.checkpoint_path, "g_") is not None
    assert scan_checkpoint(h.checkpoint_path, "do_") is not None
    assert any("training finished" in l for l in logs)
    # skip_step0_validation suppressed the step-0 validation pass
    assert not any("validation:" in l for l in logs)


@pytest.mark.slow
def test_checkpoint_save_restore_rotation(tmp_path):
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        learning_rate=2e-4, adam_b1=0.8, adam_b2=0.99, lr_decay=0.999,
        mrd_weight=0.1, mpd_reshapes=[2, 3, 5, 7, 11],
    ))
    gen, domain = build_generator(h)
    example = jnp.zeros((1, 80, 9))
    gs, ds = create_states(h, gen, domain, jax.random.PRNGKey(0), 10, example)
    path = str(tmp_path / "ck")
    for step in (5, 10, 15):
        save_checkpoint(path, step, 0, gs, ds, max_to_keep=2)
    # rotation keeps 2
    import glob
    assert len(glob.glob(os.path.join(path, "g_*"))) == 2
    assert scan_checkpoint(path, "g_").endswith("g_00000015")

    gs2, ds2 = create_states(h, gen, domain, jax.random.PRNGKey(1), 10, example)
    gs3, ds3, steps, epoch = restore_checkpoint(path, gs2, ds2)
    assert steps == 16
    l0 = jax.tree.leaves(gs.params)
    l1 = jax.tree.leaves(gs3.params)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_propagates_worker_errors(wav_env):
    """A failing batch build must raise in the consumer, not hang the
    training loop behind a silently dead worker thread."""
    tmp_path, wav_dir, train_list, _ = wav_env
    files, _ = get_dataset_filelist(train_list, train_list, wav_dir)
    ds = SegmentDataset(files, 2048, 22050, seed=0)
    ds.files = [f + ".missing" for f in ds.files]  # every load fails
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0,
                            use_native=False)
    with pytest.raises(Exception):
        next(iter(loader))


@pytest.mark.slow
def test_checkpoint_async_save_restore(tmp_path):
    """Async saves commit on wait and roundtrip identically to sync ones."""
    from nvse_tpu.train.checkpoint import wait_for_checkpoints

    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        learning_rate=2e-4, adam_b1=0.8, adam_b2=0.99, lr_decay=0.999,
        mrd_weight=0.1, mpd_reshapes=[2, 3, 5, 7, 11],
    ))
    gen, domain = build_generator(h)
    example = jnp.zeros((1, 80, 9))
    gs, ds = create_states(h, gen, domain, jax.random.PRNGKey(0), 10, example)
    path = str(tmp_path / "ck")
    for step in (5, 10, 15):
        save_checkpoint(path, step, 0, gs, ds, max_to_keep=2, async_save=True)
    wait_for_checkpoints()
    import glob
    assert len(glob.glob(os.path.join(path, "g_0*"))) == 2  # rotation ran
    assert scan_checkpoint(path, "g_").endswith("g_00000015")
    assert os.path.exists(os.path.join(path, "checkpoint_g"))

    gs2, ds2 = create_states(h, gen, domain, jax.random.PRNGKey(1), 10, example)
    gs3, ds3, steps, epoch = restore_checkpoint(path, gs2, ds2)
    assert steps == 16
    for a, b in zip(jax.tree.leaves(gs.params), jax.tree.leaves(gs3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_loader_path(wav_env):
    """Native C++ batch assembly (if built) matches shapes and content domain."""
    from nvse_tpu.data import native as native_mod

    if not native_mod.available():
        pytest.skip("native lib not built")
    _, wav_dir, train_list, val_list = wav_env
    from nvse_tpu.data import get_dataset_filelist
    tr, _ = get_dataset_filelist(train_list, val_list, wav_dir)
    ds = SegmentDataset(tr, segment_size=2048, sampling_rate=22050)
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    assert loader._native is not None
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b.shape == (2, 2048) and b.dtype == np.float32
        assert np.isfinite(b).all() and np.abs(b).max() <= 1.0
