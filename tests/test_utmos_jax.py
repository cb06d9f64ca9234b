"""Parity test: the JAX UTMOS forward must match the torch one.

Random (seeded) weights through both implementations on the same wav —
any layout/activation/normalization mismatch in the port shows up as a
numeric divergence long before the real checkpoint is available.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nvse_tpu.metrics.utmos_jax import torch_to_jax_params, utmos_forward
from nvse_tpu.metrics.utmos_torch import UTMOSModel


@pytest.fixture(scope="module")
def model():
    torch.manual_seed(0)
    m = UTMOSModel().eval()
    # non-degenerate weight-norm params on the pos conv
    with torch.no_grad():
        m.ssl_model.encoder.pos_conv[0].weight_g.mul_(1.7)
    return m


@pytest.mark.slow
def test_forward_parity(model):
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal((2, 8000))).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(wav)).numpy()

    params = torch_to_jax_params(model.state_dict())
    got = np.asarray(utmos_forward(params, wav))

    assert got.shape == ref.shape == (2,)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_masked_padding_invariance(model):
    """Padding to a length bucket + n_samples mask must reproduce the
    exact-length score (score_dir relies on this to compile per bucket,
    not per distinct file length)."""
    import jax.numpy as jnp

    params = torch_to_jax_params(model.state_dict())
    rng = np.random.default_rng(2)
    L = 7043  # deliberately not a multiple of the conv hop (320)
    wav = (0.1 * rng.standard_normal((1, L))).astype(np.float32)

    exact = np.asarray(utmos_forward(params, wav))
    for pad in (157, 960, 4000):
        padded = np.pad(wav, ((0, 0), (0, pad)))
        masked = np.asarray(utmos_forward(params, padded,
                                          n_samples=jnp.int32(L)))
        np.testing.assert_allclose(masked, exact, rtol=1e-4, atol=1e-4,
                                   err_msg=f"pad={pad}")


@pytest.mark.slow
def test_jit_and_batch_consistency(model):
    import jax
    import jax.numpy as jnp

    params = torch_to_jax_params(model.state_dict())
    fn = jax.jit(utmos_forward)
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal((3, 6400))).astype(np.float32)
    batched = np.asarray(fn(params, jnp.asarray(wav)))
    single = np.array([float(fn(params, jnp.asarray(w)[None, :])[0]) for w in wav])
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-5)
