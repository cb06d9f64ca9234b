"""One-step GAN training smoke tests on synthetic audio.

Mirrors the reference loop semantics (SURVEY.md §3.1/§3.2) at tiny
sizes: losses finite, params change, metrics populated, and the step is
data-parallel over the virtual 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.models import build_generator
from nvse_tpu.parallel import get_mesh, shard_batch
from nvse_tpu.train import GANTrainer
from nvse_tpu.utils import AttrDict


def _h(**kw):
    base = dict(
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        learning_rate=2e-4, adam_b1=0.8, adam_b2=0.99, lr_decay=0.999,
        mrd_weight=0.1, mpd_reshapes=[2, 3, 5, 7, 11], batch_size=2,
    )
    base.update(kw)
    return AttrDict(base)


def _audio(b, n):
    rng = np.random.default_rng(0)
    t = np.arange(n) / 22050.0
    x = 0.3 * np.sin(2 * np.pi * 220 * t)[None, :] + 0.01 * rng.standard_normal((b, n))
    return jnp.asarray(x.astype(np.float32))


def _tree_l2_diff(a, b):
    return sum(
        float(jnp.sum((x - y) ** 2)) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("case", ["time_small", "tf_small"])
@pytest.mark.slow
def test_one_train_step(case):
    if case == "time_small":
        h = _h(model_name="HiFiGAN", resblock="2",
               upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
               upsample_initial_channel=64, resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]])
        example = jnp.zeros((2, 80, h.segment_size // 256 + 1))
    else:
        h = _h(model_name="BSRNN", feature_dim=16, num_repeat=1, dropout=0.0,
               causal=False)
        example = jnp.zeros((2, 80, h.segment_size // 256 + 1))

    gen, domain = build_generator(h)
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=10,
                    example_input=example)
    audio = _audio(2, h.segment_size)
    p0 = jax.tree.map(lambda x: x.copy(), tr.gen_state.params)
    d0 = jax.tree.map(lambda x: x.copy(), tr.disc_state.params)
    metrics = tr.step(audio)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert _tree_l2_diff(p0, tr.gen_state.params) > 0
    assert _tree_l2_diff(d0, tr.disc_state.params) > 0
    # second step with same compiled fn
    m2 = tr.step(audio)
    assert np.isfinite(float(m2["G"]))


@pytest.mark.mesh
def test_data_parallel_step_over_mesh():
    h = _h(model_name="HiFiGAN", resblock="2",
           upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
           upsample_initial_channel=32, resblock_kernel_sizes=[3],
           resblock_dilation_sizes=[[1, 3]], segment_size=2048)
    gen, domain = build_generator(h)
    mesh = get_mesh()
    assert mesh.size == 8
    example = jnp.zeros((8, 80, h.segment_size // 256 + 1))
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=10,
                    example_input=example, mesh=mesh)
    audio = shard_batch(_audio(8, h.segment_size), mesh)
    metrics = tr.step(audio)
    assert np.isfinite(float(metrics["G"]))
    assert np.isfinite(float(metrics["D"]))


@pytest.mark.mesh
def test_sequence_parallel_step_matches_data_parallel():
    """dp×sp 2-D mesh (4 data × 2 seq): the BSRNN dual-path trunk shards
    bands during the time-LSTM and frames during the band-LSTM (GSPMD
    all-to-all at the transpose); losses must match the pure-DP step."""
    base = dict(model_name="BSRNN", feature_dim=16, num_repeat=1,
                dropout=0.0, causal=False, batch_size=8)
    audio_np = _audio(8, 2048)
    example = jnp.zeros((8, 80, 9))
    results = {}
    for label, n_seq, sp in (("dp", 1, None), ("dp_x_sp", 2, "seq")):
        h = _h(**base, sp_axis=sp)
        mesh = get_mesh(8, n_seq=n_seq)
        gen, domain = build_generator(h)
        tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0),
                        steps_per_epoch=10, example_input=example, mesh=mesh)
        metrics = tr.step(shard_batch(audio_np, mesh))
        results[label] = (float(metrics["G"]), float(metrics["D"]))
    (g0, d0), (g1, d1) = results["dp"], results["dp_x_sp"]
    np.testing.assert_allclose(g1, g0, rtol=1e-3)
    np.testing.assert_allclose(d1, d0, rtol=1e-3)


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_eval_step():
    h = _h(model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0, causal=False)
    gen, domain = build_generator(h)
    example = jnp.zeros((1, 80, 9))
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=10,
                    example_input=example)
    audio = _audio(1, 2048)
    y_g, metrics = tr.fns.eval_step(tr.gen_state, audio)
    assert y_g.shape == (1, 2048)
    assert np.isfinite(float(metrics["Mel"]))


@pytest.mark.slow
def test_bf16_mixed_precision_step():
    """compute_dtype=bfloat16: step runs, losses finite and close to the
    f32 step's, params/optimizer state stay f32 master weights."""
    h = _h(model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
           causal=True, segment_size=1024, compute_dtype="bfloat16")
    example = jnp.zeros((2, 80, h.segment_size // 256 + 1))
    gen, domain = build_generator(h)
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=10,
                    example_input=example)
    audio = _audio(2, h.segment_size)
    m_bf = tr.step(audio)
    assert np.isfinite(float(m_bf["G"])) and np.isfinite(float(m_bf["D"]))
    for leaf in jax.tree.leaves(tr.gen_state.params):
        assert leaf.dtype == jnp.float32

    h32 = _h(model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
             causal=True, segment_size=1024)
    tr32 = GANTrainer(h32, gen, domain, jax.random.PRNGKey(0),
                      steps_per_epoch=10, example_input=example)
    m_f32 = tr32.step(audio)
    # bf16 trunk vs f32 trunk: same batch, loss within a few percent
    rel = abs(float(m_bf["G"]) - float(m_f32["G"])) / abs(float(m_f32["G"]))
    assert rel < 0.05, (float(m_bf["G"]), float(m_f32["G"]))


@pytest.mark.slow
def test_cqtd_opt_in_step():
    """h.use_cqtd adds the CQT discriminator as a third disc: its params
    exist, receive gradient updates, and the step stays finite."""
    h = _h(model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
           causal=False, use_cqtd=True, cqtd_weight=1.0,
           cqtd_hop_lengths=[256], cqtd_n_octaves=[4],
           cqtd_bins_per_octaves=[12], cqtd_filters=8)
    gen, domain = build_generator(h)
    example = jnp.zeros((2, 80, h.segment_size // 256 + 1))
    tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0), steps_per_epoch=10,
                    example_input=example)
    assert "cqtd" in tr.disc_state.params
    c0 = jax.tree.map(lambda x: x.copy(), tr.disc_state.params["cqtd"])
    metrics = tr.step(_audio(2, h.segment_size))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert _tree_l2_diff(c0, tr.disc_state.params["cqtd"]) > 0


@pytest.mark.slow
def test_grad_clip_norm_opt_in():
    """h.grad_clip_norm > 0 chains global-norm clipping before adamw.

    With an aggressively small clip the first-step parameter delta must
    shrink versus the unclipped step; default (absent) stays unclipped
    (reference parity: train_tf_wi_inv.py never clips).
    """
    def run(clip):
        h = _h(model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
               causal=False, segment_size=1024)
        if clip:
            h["grad_clip_norm"] = clip
        gen, domain = build_generator(h)
        example = jnp.zeros((2, 80, h.segment_size // 256 + 1))
        tr = GANTrainer(h, gen, domain, jax.random.PRNGKey(0),
                        steps_per_epoch=10, example_input=example)
        p0 = jax.tree.map(lambda x: x.copy(), tr.gen_state.params)
        m = tr.step(_audio(2, h.segment_size))
        assert np.isfinite(float(m["G"]))
        return _tree_l2_diff(p0, tr.gen_state.params)

    free = run(0.0)
    clipped = run(1e-3)
    assert clipped < free, (clipped, free)


def test_grad_clip_state_is_checkpoint_compatible():
    """Clipping must not change the optimizer state structure, so
    checkpoints written without clipping restore into a clipped run."""
    from nvse_tpu.train.trainer import make_optimizer

    h0 = _h(model_name="BSRNN")
    h1 = _h(model_name="BSRNN", grad_clip_norm=5.0)
    params = {"w": jnp.ones((3, 3))}
    s0 = make_optimizer(h0, 10).init(params)
    s1 = make_optimizer(h1, 10).init(params)
    assert jax.tree.structure(s0) == jax.tree.structure(s1)


@pytest.mark.slow
def test_skip_nonfinite_updates():
    """h.skip_nonfinite_updates: a batch that produces non-finite grads
    leaves BOTH states untouched (params, opt moments, step counter) and
    reports metrics['skip']; the next healthy batch trains normally."""
    from nvse_tpu.models import build_generator
    from nvse_tpu.train.trainer import GANTrainer

    h = _h(model_name="HiFiGAN", resblock="2",
           upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
           upsample_initial_channel=16, resblock_kernel_sizes=[3],
           resblock_dilation_sizes=[[1, 3]], skip_nonfinite_updates=True)
    generator, domain = build_generator(h)
    example = jnp.zeros((2, h.num_mels, h.segment_size // h.hop_size + 1))
    tr = GANTrainer(h, generator, domain, jax.random.PRNGKey(0), 10, example)

    g0 = jax.tree.map(lambda x: x.copy(), tr.gen_state.params)
    d0 = jax.tree.map(lambda x: x.copy(), tr.disc_state.params)
    step0 = int(tr.gen_state.step)

    bad = _audio(2, h.segment_size).at[0, 10].set(jnp.nan)
    m = tr.step(bad)
    assert float(m["skip"]) == 2.0
    assert _tree_l2_diff(tr.gen_state.params, g0) == 0.0
    assert _tree_l2_diff(tr.disc_state.params, d0) == 0.0
    assert int(tr.gen_state.step) == step0

    m2 = tr.step(_audio(2, h.segment_size))
    assert float(m2["skip"]) == 0.0
    assert _tree_l2_diff(tr.gen_state.params, g0) > 0.0
    assert int(tr.gen_state.step) == step0 + 1


@pytest.mark.slow
def test_eval_full_mask_invariance_and_crop_comparison():
    """Full-utterance validation (eval_full): the frame-pure masked
    metrics (A/IP/GD/PTD/R/I — computed directly on spectra frames)
    must be IDENTICAL whether a causal-model utterance is padded to its
    exact bucket or to a larger one, because the mask only admits
    frames whose analysis windows never touch the padding. Mel/C
    re-analyse the generated waveform (istft smears the boundary), so
    they are only close. Also sanity-compares the crop-path eval_step
    aggregate on the same audio."""
    h = _h(model_name="BSRNN", feature_dim=16, num_repeat=1, dropout=0.0,
           causal=True, batch_size=1)
    gen, domain = build_generator(h)
    example = jnp.zeros((1, 80, 9))
    from nvse_tpu.train.trainer import create_states, make_train_step
    gen_state, _disc = create_states(h, gen, domain, jax.random.PRNGKey(0),
                                     10, example)
    fns = make_train_step(h, gen, domain)

    n = 4096
    wav = _audio(1, n)[0]
    a1 = jnp.asarray(wav[None, :])                       # exact bucket
    a2 = jnp.asarray(np.pad(wav, (0, 4096))[None, :])    # one extra bucket
    _, m1 = fns.eval_full(gen_state, a1, jnp.asarray(n, jnp.int32))
    _, m2 = fns.eval_full(gen_state, a2, jnp.asarray(n, jnp.int32))
    for k in ("A", "IP", "GD", "PTD", "R", "I"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)
    for k in ("Mel", "C"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=0.35,
                                   err_msg=k)
    # crop-path comparison: same keys, same order of magnitude
    _, mc = fns.eval_step(gen_state, a1, None)
    assert set(mc) == set(m1)
    for k in m1:
        assert np.isfinite(float(mc[k])) and np.isfinite(float(m1[k])), k
        assert float(m1[k]) <= 10 * float(mc[k]) + 1.0, (k, m1[k], mc[k])


@pytest.mark.slow
def test_eval_full_noncausal_padding_sensitivity():
    """Non-causal eval_full is bucket-padding-BIASED, not invariant: the
    bidirectional time LSTM lets every generated frame see the
    zero-padded bucket tail (documented in trainer.eval_full). This
    bounds the bias: doubling the padding must change each masked
    metric by < 25% relative (deterministic-per-bucket, so curves stay
    comparable), while the metrics stay finite and positive."""
    h = _h(model_name="BSRNN", feature_dim=16, num_repeat=1, dropout=0.0,
           causal=False, batch_size=1)
    gen, domain = build_generator(h)
    example = jnp.zeros((1, 80, 9))
    from nvse_tpu.train.trainer import create_states, make_train_step
    gen_state, _disc = create_states(h, gen, domain, jax.random.PRNGKey(0),
                                     10, example)
    fns = make_train_step(h, gen, domain)

    n = 4096
    wav = _audio(1, n)[0]
    a1 = jnp.asarray(wav[None, :])                       # exact bucket
    a2 = jnp.asarray(np.pad(wav, (0, 4096))[None, :])    # one extra bucket
    _, m1 = fns.eval_full(gen_state, a1, jnp.asarray(n, jnp.int32))
    _, m2 = fns.eval_full(gen_state, a2, jnp.asarray(n, jnp.int32))
    for k in m1:
        v1, v2 = float(m1[k]), float(m2[k])
        assert np.isfinite(v1) and np.isfinite(v2), k
        rel = abs(v1 - v2) / max(abs(v1), 1e-6)
        assert rel < 0.25, (k, v1, v2, rel)
