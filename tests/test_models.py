"""Model shape + parameter-count goldens.

Parameter counts are checked against the paper table transcribed in
BASELINE.md (HiFiGAN 13.9M, iSTFTNet 13.3M, BSRNN-M 10.13M, ...); shapes
against the reference forward contracts (SURVEY.md §2.3).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.models import build_generator
from nvse_tpu.utils import AttrDict


def _count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def _h(**kw):
    base = dict(
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000, segment_size=16384,
    )
    base.update(kw)
    return AttrDict(base)


HIFIGAN_H = _h(
    model_name="HiFiGAN", resblock="1",
    upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
    upsample_initial_channel=512, resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)

ISTFTNET_H = _h(
    model_name="iSTFTNet", resblock="1",
    upsample_rates=[8, 8], upsample_kernel_sizes=[16, 16],
    upsample_initial_channel=512, resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    gen_istft_n_fft=16, gen_istft_hop_size=4,
)

BSRNN_H = _h(
    model_name="BSRNN", feature_dim=128, num_repeat=8, dropout=0.0, causal=False,
)


@pytest.mark.slow
def test_hifigan_shapes_and_params():
    model, domain = build_generator(HIFIGAN_H)
    assert domain == "time"
    mel = jnp.zeros((2, 80, 32))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (2, 32 * 256)
    n = _count(params)
    assert abs(n - 13.9e6) / 13.9e6 < 0.02, n


def test_istftnet_shapes_and_params():
    model, domain = build_generator(ISTFTNET_H)
    assert domain == "time"
    mel = jnp.zeros((2, 80, 32))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    # 32 frames upsampled x64 -> T'=2048(+1 reflect pad), iSTFT hop 4
    assert wav.ndim == 2 and wav.shape[0] == 2
    assert abs(wav.shape[1] - 32 * 256) <= 4 * 4
    n = _count(params)
    assert abs(n - 13.3e6) / 13.3e6 < 0.02, n


@pytest.mark.slow
def test_bsrnn_shapes_and_params():
    model, domain = build_generator(BSRNN_H)
    assert domain == "tf"
    B, T = 2, 17
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((B, 80, T)).astype(np.float32)) - 4.0
    params = model.init(jax.random.PRNGKey(0), mel)
    logamp, pha, rea, imag, wav = model.apply(params, mel)
    F = 513
    assert logamp.shape == pha.shape == rea.shape == imag.shape == (B, F, T)
    assert wav.shape == (B, 256 * (T - 1))
    # phase in [-pi, pi]; rea/imag consistent with logamp
    assert float(jnp.max(jnp.abs(pha))) <= np.pi + 1e-5
    mag = np.sqrt(np.asarray(rea) ** 2 + np.asarray(imag) ** 2)
    np.testing.assert_allclose(
        np.log(np.clip(mag, 1e-5, None)), np.asarray(logamp), atol=1e-3
    )
    n = _count(params)
    assert abs(n - 10.13e6) / 10.13e6 < 0.02, n


@pytest.mark.slow
def test_bsrnn_24k_contract():
    h = _h(model_name="BSRNN_24k", sampling_rate=24000, feature_dim=128,
           num_repeat=2, causal=False)
    model, domain = build_generator(h)
    spec = jnp.zeros((1, 513, 9))
    params = model.init(jax.random.PRNGKey(0), spec)
    logamp, pha, rea, imag, wav = model.apply(params, spec)
    assert logamp.shape == (1, 513, 9)
    assert wav.shape == (1, 256 * 8)


def test_grn_zero_channel_subgradient():
    """GRN backward through an exactly-zero channel must be finite.

    A dead GELU unit (erf underflow at x <~ -14) zeroes a whole channel
    over time; torch.norm's subgradient at 0 is 0 and the reference
    trains through it (apnet2.py:13-24). The naive jnp.sqrt backward is
    0/0 = NaN — this took down a FreeV GAN run at step ~5.4k.
    """
    from nvse_tpu.models.apnet import GRN

    x = jnp.ones((2, 8, 4)).at[:, :, 1].set(0.0)
    grn = GRN(dim=4)
    params = grn.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(grn.apply(p, x) ** 2)

    gx = jax.grad(loss, argnums=1)(params, x)
    gp = jax.grad(loss, argnums=0)(params, x)
    assert bool(jnp.isfinite(gx).all())
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(gp))
    # zero channel gets the torch subgradient: d(x*nx + x)/dx = 0 there
    # only through the norm term; the residual path still contributes
    out = grn.apply(params, x)
    assert bool(jnp.isfinite(out).all())
