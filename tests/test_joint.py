"""Joint denoise+vocoder pipeline tests: loudness, mixing, train step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.data.joint_dataset import JointDataset
from nvse_tpu.data.loudness import integrated_loudness
from nvse_tpu.data import write_wav
from nvse_tpu.models import build_generator
from nvse_tpu.train.trainer import create_states, make_train_step
from nvse_tpu.utils import AttrDict


def test_integrated_loudness_sine_reference():
    """A full-scale 997 Hz sine measures ~ -3.01 LUFS (BS.1770 property:
    K-weighting ~0 dB at 1 kHz; mean square of a unit sine is -3.01 dBFS)."""
    sr = 48000
    t = np.arange(int(sr * 3)) / sr
    x = np.sin(2 * np.pi * 997.0 * t)
    l = integrated_loudness(x, sr)
    assert abs(l - (-3.01 - 0.691 + 0.691)) < 0.6, l  # ~-3.0 LUFS +- filter gain


def test_integrated_loudness_gain_linearity():
    sr = 24000
    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal(sr * 2)
    l1 = integrated_loudness(x, sr)
    l2 = integrated_loudness(2.0 * x, sr)
    assert abs((l2 - l1) - 6.0206) < 0.1


def test_integrated_loudness_silence():
    assert integrated_loudness(np.zeros(48000), 24000) == -np.inf


@pytest.fixture
def joint_files(tmp_path):
    sr = 24000
    rng = np.random.default_rng(0)
    speech, noise = [], []
    for i in range(3):
        t = np.arange(8192) / sr
        x = 0.3 * np.sin(2 * np.pi * (180 + 40 * i) * t)
        p = str(tmp_path / f"sp{i}.wav")
        write_wav(p, x.astype(np.float32), sr)
        speech.append(p)
    for i in range(2):
        x = 0.02 * rng.standard_normal(8192)
        p = str(tmp_path / f"no{i}.wav")
        write_wav(p, x.astype(np.float32), sr)
        noise.append(p)
    return speech, noise


def test_joint_filelist_accepts_both_scp_styles(joint_files, tmp_path):
    """Bare stems (joint reference scp) AND LJSpeech 'DUMMY1/x.wav|text'
    entries resolve to the same existing files."""
    from nvse_tpu.data.joint_dataset import get_joint_filelist

    speech, noise = joint_files
    stems = tmp_path / "stems.txt"
    stems.write_text("".join(f"sp{i}\n" for i in range(3)))
    lj = tmp_path / "lj.txt"
    lj.write_text("".join(f"DUMMY1/sp{i}.wav|utterance {i}\n" for i in range(3)))
    nz = tmp_path / "noise.scp"
    nz.write_text("".join(p + "\n" for p in noise))

    tr1, _, tn, vn = get_joint_filelist(str(stems), str(stems), str(tmp_path), str(nz))
    tr2, _, _, _ = get_joint_filelist(str(lj), str(lj), str(tmp_path), str(nz))
    assert tr1 == tr2 and len(tr1) == 3
    assert len(tn) + len(vn) == 2


def test_joint_dataset_mixing(joint_files):
    speech, noise = joint_files
    ds = JointDataset(speech, noise, (-5, 15), segment_size=4096,
                      sampling_rate=24000, batch_size=2,
                      task_dict=["denoise"], seed=1)
    noisy, clean, task = ds.get_batch(0)
    assert task == "denoise"
    assert noisy.shape == clean.shape == (2, 4096)
    assert np.abs(noisy).max() < 1.0  # anti-clipping
    assert not np.allclose(noisy, clean)  # noise actually added
    ds2 = JointDataset(speech, noise, (-5, 15), segment_size=4096,
                       sampling_rate=24000, batch_size=2,
                       task_dict=["vocoder"], seed=1)
    noisy2, clean2, task2 = ds2.get_batch(0)
    assert task2 == "vocoder"
    np.testing.assert_array_equal(noisy2, clean2)


@pytest.mark.parametrize("task", ["denoise", "vocoder"])
@pytest.mark.slow
def test_joint_train_step(task):
    h = AttrDict(dict(
        model_name="BSRNN_24k", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=24000, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=100, fmin=0, fmax=12000, meloss=None,
        segment_size=2048, batch_size=2, learning_rate=2e-4,
        adam_b1=0.8, adam_b2=0.99, lr_decay=0.999, mrd_weight=0.1,
        mpd_reshapes=[2, 3, 5, 7, 11],
    ))
    gen, _ = build_generator(h)
    example = jnp.zeros((2, 513, 9))
    gs, ds = create_states(h, gen, "joint", jax.random.PRNGKey(0), 10, example)
    fns = make_train_step(h, gen, "joint", joint_task=task)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(0.2 * np.sin(np.arange(2 * 2048).reshape(2, 2048) / 17).astype(np.float32))
    noisy = clean + jnp.asarray(0.05 * rng.standard_normal((2, 2048)).astype(np.float32))
    gs2, ds2, metrics = fns.train_step(gs, ds, clean, noisy)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["G"]) > 0 and float(metrics["D"]) > 0


@pytest.mark.slow
def test_joint_train_loop_e2e(tmp_path, joint_files):
    """Tiny end-to-end joint training run with checkpointing + validation."""
    from nvse_tpu.train.loop_joint import train_joint
    from nvse_tpu.train.checkpoint import scan_checkpoint

    speech, noise = joint_files
    # filelist in the joint format: '<name-without-ext>|...' resolved
    # against raw_wavfile_path via glob
    import os
    wav_dir = os.path.dirname(speech[0])
    tr_list = tmp_path / "tr.txt"
    va_list = tmp_path / "va.txt"
    tr_list.write_text("".join(os.path.splitext(os.path.basename(p))[0] + "|x\n" for p in speech[:2]))
    va_list.write_text(os.path.splitext(os.path.basename(speech[2]))[0] + "|x\n")
    noise_list = tmp_path / "noise.txt"
    noise_list.write_text("".join(p + "\n" for p in (noise + noise)))

    h = AttrDict(dict(
        model_name="BSRNN_24k", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=24000, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=100, fmin=0, fmax=12000, meloss=None,
        segment_size=2048, batch_size=2, learning_rate=2e-4,
        adam_b1=0.8, adam_b2=0.99, lr_decay=0.999, seed=1,
        training_steps=1, training_epochs=5, stdout_interval=1,
        checkpoint_interval=1, summary_interval=1, validation_interval=1000,
        max_to_keep=2, mrd_weight=0.1, mpd_reshapes=[2, 3, 5, 7, 11],
        snr_range=[-5, 15], task_dict=["denoise", "vocoder"],
        input_training_wav_list=str(tr_list),
        input_validation_wav_list=str(va_list),
        raw_wavfile_path=wav_dir,
        input_noise_wav_list=str(noise_list),
        checkpoint_path=str(tmp_path / "ckpt"),
    ))
    logs = []
    train_joint(h, log_fn=logs.append)
    assert scan_checkpoint(h.checkpoint_path, "g_") is not None
    assert any("training finished" in l for l in logs)
