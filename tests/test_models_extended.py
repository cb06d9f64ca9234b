"""Shape + parameter-count goldens for the remaining six generators.

Counts come from the paper table (BASELINE.md): APNet 72.19M, APNet2
31.4M, FreeV 18.2M, GCRN 8.28M, ConvTasNet 3.15M, HD-Demucs 38.93M.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.models import build_generator
from nvse_tpu.utils import AttrDict


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _h(**kw):
    base = dict(
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000, segment_size=16384,
    )
    base.update(kw)
    return AttrDict(base)


APNET_KEYS = dict(
    ASP_channel=512, ASP_resblock_kernel_sizes=[3, 7, 11],
    ASP_resblock_dilation_sizes=[[1, 3, 5]] * 3,
    ASP_input_conv_kernel_size=7, ASP_output_conv_kernel_size=7,
    PSP_channel=512, PSP_resblock_kernel_sizes=[3, 7, 11],
    PSP_resblock_dilation_sizes=[[1, 3, 5]] * 3,
    PSP_input_conv_kernel_size=7, PSP_output_R_conv_kernel_size=7,
    PSP_output_I_conv_kernel_size=7,
)


def _mel(b=1, t=9):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((b, 80, t)).astype(np.float32)) - 4.0


def _check_tf_outputs(outs, b, t):
    logamp, pha, rea, imag, wav = outs
    assert logamp.shape == pha.shape == rea.shape == imag.shape == (b, 513, t)
    assert wav.shape == (b, 256 * (t - 1))
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


@pytest.mark.parametrize(
    "name,expected,tol",
    [("APNet", 72.19e6, 0.02), ("APNet2", 31.4e6, 0.02), ("FreeV", 18.2e6, 0.02)],
)
def test_apnet_family(name, expected, tol):
    h = _h(model_name=name, **APNET_KEYS)
    if name == "FreeV":
        h.ASP_channel = 513
    model, domain = build_generator(h)
    assert domain == "tf"
    mel = _mel()
    params = model.init(jax.random.PRNGKey(0), mel)
    outs = model.apply(params, mel)
    _check_tf_outputs(outs, 1, 9)
    n = _count(params)
    assert abs(n - expected) / expected < tol, n


@pytest.mark.slow
def test_gcrn():
    h = _h(model_name="GCRN")
    model, domain = build_generator(h)
    assert domain == "tf"
    mel = _mel()
    params = model.init(jax.random.PRNGKey(0), mel)
    outs = model.apply(params, mel)
    _check_tf_outputs(outs, 1, 9)
    n = _count(params)
    assert abs(n - 8.28e6) / 8.28e6 < 0.02, n


@pytest.mark.slow
def test_gcrn_fused_glu_matches_unfused():
    """The fused GLU pair (one 2*cout conv, kernels concatenated at
    apply time) must be float-identical to the two-conv pair with the
    SAME param tree (checkpoint layout unchanged)."""
    h1 = _h(model_name="GCRN", fused_glu=True)
    h2 = _h(model_name="GCRN", fused_glu=False)
    m1, _ = build_generator(h1)
    m2, _ = build_generator(h2)
    mel = _mel()
    p1 = m1.init(jax.random.PRNGKey(0), mel)
    p2 = m2.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    o1 = m1.apply(p1, mel)
    o2 = m2.apply(p1, mel)  # same params through both paths
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_convtasnet():
    h = _h(model_name="ConvTasNet", N=512, L=16, B=128, H=512, P=3, X=8, R=3,
           norm="gln", num_spks=1, activate="relu", causal=False,
           skip_con=True, init_phase="griffin_lim")
    model, domain = build_generator(h)
    assert domain == "time"
    mel = _mel(t=17)
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert np.isfinite(np.asarray(wav)).all()
    n = _count(params)
    # The paper table says 3.15M, but the shipped config enables
    # skip_con=True whose 24 skip 1x1 convs add ~1.58M params; the
    # reference code as configured CONSTRUCTS 4,985,009 params, of
    # which 24,600 (PReLU_2 + norm_2 per block) never participate in
    # forward (convtasnet.py:143-144 vs :150-167) — this port only
    # creates the 4,960,409 live ones.
    assert n == 4_960_409, n


def test_convtasnet_causal_cln():
    """h.causal / h.norm must reach the TCN blocks: causal pads left
    only (reference convtasnet.py:137-138,162-163), cln swaps gLN for
    the per-frame channel LN."""
    h = _h(model_name="ConvTasNet", N=64, L=16, B=16, H=32, P=3, X=2, R=1,
           norm="cln", num_spks=1, activate="relu", causal=True,
           skip_con=False, init_phase="zero")
    model, _ = build_generator(h)
    mel = _mel(t=17)
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.ndim == 2 and np.isfinite(np.asarray(wav)).all()
    flat = str(jax.tree_util.tree_structure(params))
    assert "ChannelLayerNorm" in flat  # cln actually selected


def test_hddemucas_causal_unilstm():
    """h.causal=true -> unidirectional 2-layer LSTM bottleneck with no
    2dim->dim projection (reference hddemucas.py:95-110, bi=not causal)."""
    h = _h(model_name="HDDemucas", chin=1, chout=1, hidden=8, depth=2,
           kernel_size=8, stride=4, causal=True, resample=4, growth=2,
           max_hidden=10000, normalize=False, glu=True, rescale=0.1,
           floor=1e-3, init_phase="zero")
    model, _ = build_generator(h)
    mel = _mel(t=17)
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert np.isfinite(np.asarray(wav)).all()
    flat = str(jax.tree_util.tree_structure(params))
    assert "Linear_0" not in str(params["params"].get("BLSTM_0", {}))


@pytest.mark.slow
def test_hddemucas():
    h = _h(model_name="HDDemucas", chin=1, chout=1, hidden=48, depth=5,
           kernel_size=8, stride=4, causal=False, resample=4, growth=2,
           max_hidden=10000, normalize=False, glu=True, rescale=0.1,
           floor=1e-3, init_phase="zero")
    model, domain = build_generator(h)
    assert domain == "time"
    mel = _mel(t=17)
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 256 * 16)
    assert np.isfinite(np.asarray(wav)).all()
    n = _count(params)
    assert abs(n - 38.93e6) / 38.93e6 < 0.02, n


def test_cqt_op_detects_tone():
    """CQT magnitude peaks at the bin matching a pure tone's frequency."""
    from nvse_tpu.ops.cqt import cqt
    sr = 22050
    t = np.arange(sr) / sr
    f_tone = 440.0
    x = jnp.asarray(np.sin(2 * np.pi * f_tone * t)[None, :].astype(np.float32))
    re, im = cqt(x, sr, hop_length=512, n_bins=84, bins_per_octave=12)
    mag = np.asarray(jnp.sqrt(re**2 + im**2))[0]          # (bins, T)
    peak_bin = mag.mean(axis=1).argmax()
    fmin = 32.70319566257483
    peak_freq = fmin * 2 ** (peak_bin / 12)
    assert abs(peak_freq - f_tone) / f_tone < 0.06, peak_freq


def test_cqt_discriminator_shapes():
    from nvse_tpu.models.cqt_discriminator import MultiScaleSubbandCQTDiscriminator
    d = MultiScaleSubbandCQTDiscriminator(
        sampling_rate=22050, hop_lengths=(512,), n_octaves=(5,),
        bins_per_octaves=(12,), filters=8)
    y = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8192)).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), y, y)
    rs, gs, fr, fg = d.apply(params, y, y)
    assert len(rs) == 1 and len(fr[0]) == 5
    assert np.isfinite(np.asarray(rs[0])).all()


def test_vocos():
    h = _h(model_name="Vocos")
    model, domain = build_generator(h)
    assert domain == "tf"
    mel = _mel()
    params = model.init(jax.random.PRNGKey(0), mel)
    outs = model.apply(params, mel)
    _check_tf_outputs(outs, 1, 9)
    n = _count(params)
    # published Vocos: ~13.5M params (BASELINE.md table)
    assert abs(n - 13.5e6) / 13.5e6 < 0.05, n
