"""Parity tests: nvse_tpu layers vs torch.nn numerics with copied weights."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nvse_tpu.models import layers as L

RNG = np.random.default_rng(7)


def _x(b, t, c):
    return RNG.standard_normal((b, t, c)).astype(np.float32)


def test_conv1d_matches_torch():
    tconv = torch.nn.Conv1d(8, 16, 5, stride=2, padding=3, dilation=2, groups=2)
    x = _x(2, 64, 8)
    ours = L.Conv1d(8, 16, 5, stride=2, padding=3, dilation=2, groups=2)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "params": {
            "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 1, 0)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    want = tconv(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weightnorm_conv1d_matches_torch():
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3, padding=1))
    x = _x(2, 32, 4)
    ours = L.Conv1d(4, 8, 3, padding=1, use_weight_norm=True)
    v = tconv.weight_v.detach().numpy().transpose(2, 1, 0)
    g = tconv.weight_g.detach().numpy().reshape(1, 1, 8)
    params = {"params": {"v": jnp.asarray(v), "g": jnp.asarray(g),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    want = tconv(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,k,pad", [(8, 16, 4), (2, 4, 1), (1, 3, 1)])
def test_convtranspose1d_matches_torch(stride, k, pad):
    tconv = torch.nn.ConvTranspose1d(6, 3, k, stride=stride, padding=pad)
    x = _x(2, 20, 6)
    ours = L.ConvTranspose1d(6, 3, k, stride=stride, padding=pad)
    params = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 0, 1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    want = tconv(torch.from_numpy(x).permute(0, 2, 1)).detach().numpy().transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    tconv = torch.nn.Conv2d(3, 8, (5, 1), stride=(3, 1), padding=(2, 0))
    x = RNG.standard_normal((2, 30, 7, 3)).astype(np.float32)  # NHWC
    ours = L.Conv2d(3, 8, (5, 1), stride=(3, 1), padding=(2, 0))
    params = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convtranspose2d_matches_torch():
    tconv = torch.nn.ConvTranspose2d(4, 2, (3, 3), stride=(2, 1), padding=(1, 1))
    x = RNG.standard_normal((2, 10, 8, 4)).astype(np.float32)
    ours = L.ConvTranspose2d(4, 2, (3, 3), stride=(2, 1), padding=(1, 1))
    params = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(bidirectional):
    tl = torch.nn.LSTM(12, 16, 1, batch_first=True, bidirectional=bidirectional)
    x = _x(3, 25, 12)
    ours = L.LSTM(12, 16, bidirectional=bidirectional)
    p = {}
    p["w_ih_fwd"] = jnp.asarray(tl.weight_ih_l0.detach().numpy().T)
    p["w_hh_fwd"] = jnp.asarray(tl.weight_hh_l0.detach().numpy().T)
    p["b_ih_fwd"] = jnp.asarray(tl.bias_ih_l0.detach().numpy())
    p["b_hh_fwd"] = jnp.asarray(tl.bias_hh_l0.detach().numpy())
    if bidirectional:
        p["w_ih_bwd"] = jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy().T)
        p["w_hh_bwd"] = jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy().T)
        p["b_ih_bwd"] = jnp.asarray(tl.bias_ih_l0_reverse.detach().numpy())
        p["b_hh_bwd"] = jnp.asarray(tl.bias_hh_l0_reverse.detach().numpy())
    got = np.asarray(ours.apply({"params": p}, jnp.asarray(x)))
    want, _ = tl(torch.from_numpy(x))
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_spectral_norm_conv_close_to_torch():
    """After convergence of power iteration both should divide by sigma_max."""
    torch.manual_seed(7)
    tconv = torch.nn.utils.spectral_norm(torch.nn.Conv1d(4, 6, 3, padding=1))
    x = _x(2, 16, 4)
    xt = torch.from_numpy(x).permute(0, 2, 1)
    with torch.no_grad():
        for _ in range(50):  # converge torch's u
            tconv(xt)
    ours = L.SNConv1d(4, 6, 3, padding=1)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = tconv.weight_orig.detach().numpy()
    params = {
        "params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                   "bias": jnp.asarray(tconv.bias.detach().numpy())},
        "spectral": variables["spectral"],
    }
    out = None
    for _ in range(100):  # converge our u
        out, updates = ours.apply(params, jnp.asarray(x), mutable=["spectral"])
        params = {**params, "spectral": updates["spectral"]}
    with torch.no_grad():
        want = tconv(xt).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


def test_spectral_norm_gradient_matches_torch():
    """torch backprops through sigma = u^T W v (u,v detached buffers);
    the port must too — stop_gradient around sigma gives d(W/sigma)/dW =
    1/sigma instead of the quotient rule, changing D dynamics.

    Exact comparison: our stored u is synced to torch's u BEFORE one
    training-mode forward, so both sides run the identical single power
    iteration (v = norm(W^T u), u' = norm(W v), sigma = u'^T W v) —
    no reliance on independent convergence."""
    torch.manual_seed(7)
    tconv = torch.nn.utils.spectral_norm(torch.nn.Conv1d(4, 6, 3, padding=1))
    x = _x(2, 16, 4)
    xt = torch.from_numpy(x).permute(0, 2, 1)
    with torch.no_grad():
        for _ in range(5):  # any state; exactness comes from the sync
            tconv(xt)

    ours = L.SNConv1d(4, 6, 3, padding=1)
    w = tconv.weight_orig.detach().numpy()
    params = {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
              "bias": jnp.asarray(tconv.bias.detach().numpy())}
    spectral = {"u": jnp.asarray(tconv.weight_u.detach().numpy())}

    def loss(p):
        y, _ = ours.apply({"params": p, "spectral": spectral},
                          jnp.asarray(x), mutable=["spectral"])
        return jnp.sum(y ** 2)

    gk = np.asarray(jax.grad(loss)(params)["kernel"]).transpose(2, 1, 0)

    tconv.zero_grad()
    (tconv(xt) ** 2).sum().backward()  # training mode: same one iteration
    gt = tconv.weight_orig.grad.detach().numpy()
    np.testing.assert_allclose(gk, gt, rtol=1e-4, atol=1e-5)


def test_weightnorm_g_initialised_to_norm():
    ours = L.Conv1d(4, 8, 3, padding=1, use_weight_norm=True)
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))
    v = variables["params"]["v"]
    g = variables["params"]["g"]
    norms = np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1)))
    np.testing.assert_allclose(np.asarray(g).ravel(), norms, rtol=1e-6)


@pytest.mark.slow
def test_fold_weight_norm_layer_parity():
    """fold_weight_norm: folded kernels through the same layers ==
    unfolded (v, g) outputs, for all four conv types incl. the
    degenerate 1-out-channel case (HiFiGAN conv_post) where g is a
    scalar and the norm runs over the whole tensor."""
    cases = [
        (L.Conv1d(4, 8, 3, padding=1, use_weight_norm=True), (2, 32, 4)),
        (L.Conv1d(6, 1, 7, padding=3, use_weight_norm=True), (2, 32, 6)),
        (L.ConvTranspose1d(4, 8, 8, stride=4, padding=2, use_weight_norm=True), (2, 16, 4)),
        (L.Conv2d(3, 5, (3, 3), padding=(1, 1), use_weight_norm=True), (2, 8, 8, 3)),
        (L.ConvTranspose2d(3, 5, (4, 4), stride=(2, 2), padding=(1, 1),
                           use_weight_norm=True), (2, 8, 8, 3)),
    ]
    for i, (mod, shape) in enumerate(cases):
        x = jnp.asarray(RNG.standard_normal(shape).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(i), x)["params"]
        # perturb g away from its ||v|| init so the fold is non-trivial
        params["g"] = params["g"] * (1.0 + 0.3 * jnp.cos(jnp.arange(params["g"].size))
                                     .reshape(params["g"].shape))
        want = mod.apply({"params": params}, x)
        folded = L.fold_weight_norm(params)
        assert "v" not in folded and "g" not in folded and "kernel" in folded, folded.keys()
        got = mod.apply({"params": folded}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_fold_weight_norm_model_parity():
    """End-to-end: a tiny weight-normed HiFiGAN decodes identically with
    folded params (remove_weight_norm contract, Models/hifigan.py:126-133)."""
    from nvse_tpu.models import build_generator
    from nvse_tpu.utils import AttrDict

    h = AttrDict(dict(
        model_name="HiFiGAN", resblock="2", upsample_rates=[8, 2],
        upsample_kernel_sizes=[16, 4], upsample_initial_channel=16,
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000,
    ))
    gen, _ = build_generator(h)
    mel = jnp.asarray(RNG.standard_normal((1, 80, 11)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(3), mel)["params"]
    want = gen.apply({"params": params}, mel)
    want = want[-1] if isinstance(want, tuple) else want
    folded = L.fold_weight_norm(params)
    got = gen.apply({"params": folded}, mel)
    got = got[-1] if isinstance(got, tuple) else got
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # every (v, g) pair is gone from the folded tree
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    names = {p[-1].key for p, _ in flat}
    assert "v" not in names and "g" not in names
