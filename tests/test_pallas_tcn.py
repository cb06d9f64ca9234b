"""Fused TCN block tail (ops/pallas_tcn.py) vs the unfused module path.

Three layers of evidence:
  1. the Pallas kernel (interpret mode) matches the pure-XLA reference
     tail across dilations, batch, and non-tile-aligned lengths;
  2. tcn_block_tail's custom VJP produces gradients that match direct
     autodiff through the XLA tail;
  3. a full ConvTasNet forward with fused_tcn on equals the unfused
     module path (same params tree, same outputs) — this validates the
     algebraic rewrite (folded gLN, concatenated res/skip matmul)
     against the reference block semantics (Models/convtasnet.py:125-167).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvse_tpu.ops.pallas_tcn import (
    _pallas_tail,
    _xla_tail,
    tcn_block_tail,
)


def _make_inputs(rng, B, T, H, Bc, dtype=jnp.float32):
    ks = list(jax.random.split(rng, 8))
    c = jax.random.normal(ks[0], (B, T, H), dtype)
    x = jax.random.normal(ks[1], (B, T, Bc), dtype)
    gw = 1.0 + 0.1 * jax.random.normal(ks[2], (1, H), dtype)
    gb = 0.1 * jax.random.normal(ks[3], (1, H), dtype)
    wdw = jax.random.normal(ks[4], (3, H), dtype) / 3.0
    bdw = 0.1 * jax.random.normal(ks[5], (1, H), dtype)
    wrs = jax.random.normal(ks[6], (H, 2 * Bc), dtype) / np.sqrt(H)
    brs = 0.1 * jax.random.normal(ks[7], (1, 2 * Bc), dtype)
    return c, x, gw, gb, wdw, bdw, wrs, brs


def _fold(c, gw, gb, eps=1e-5):
    f32 = jnp.float32
    B = c.shape[0]
    m1 = jnp.mean(c, axis=(1, 2), dtype=f32).reshape(B, 1)
    m2 = jnp.mean(jnp.square(c.astype(f32)), axis=(1, 2)).reshape(B, 1)
    rstd = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + eps)
    a = gw.astype(f32) * rstd
    return a, gb.astype(f32) - m1 * a


@pytest.mark.parametrize("dilation", [1, 2, 16, 128])
def test_kernel_matches_xla_tail(dilation):
    args = _make_inputs(jax.random.PRNGKey(dilation), B=2, T=512, H=512, Bc=128)
    c, x, gw, gb, wdw, bdw, wrs, brs = args
    e_ref, s_ref = _xla_tail(*args, dilation, 1e-5)
    a, b2 = _fold(c, gw, gb)
    e, s = _pallas_tail(c, x, a, b2, wdw, bdw, wrs, brs, dilation,
                        interpret=True)
    np.testing.assert_allclose(e, e_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(s, s_ref, rtol=2e-5, atol=2e-5)


def test_kernel_pad_path_and_multibatch():
    # T=700 forces the pad-to-tile path; batch 3 exercises the b grid axis
    args = _make_inputs(jax.random.PRNGKey(7), B=3, T=700, H=512, Bc=128)
    c, x, gw, gb, wdw, bdw, wrs, brs = args
    e_ref, s_ref = _xla_tail(*args, 4, 1e-5)
    a, b2 = _fold(c, gw, gb)
    e, s = _pallas_tail(c, x, a, b2, wdw, bdw, wrs, brs, 4, interpret=True)
    assert e.shape == (3, 700, 128) and s.shape == (3, 700, 128)
    np.testing.assert_allclose(e, e_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(s, s_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_kernel_bf16():
    args = _make_inputs(jax.random.PRNGKey(3), B=1, T=256, H=512, Bc=128,
                        dtype=jnp.bfloat16)
    c, x, gw, gb, wdw, bdw, wrs, brs = args
    e_ref, s_ref = _xla_tail(*args, 8, 1e-5)
    a, b2 = _fold(c, gw, gb)
    e, s = _pallas_tail(c, x, a, b2, wdw, bdw, wrs, brs, 8, interpret=True)
    assert e.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(e, np.float32),
                               np.asarray(e_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(s, np.float32),
                               np.asarray(s_ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_custom_vjp_matches_autodiff():
    args = _make_inputs(jax.random.PRNGKey(11), B=2, T=96, H=256, Bc=128)

    def loss_fused(*p):
        e, s = tcn_block_tail(*p, 2, 1e-5)
        return jnp.sum(e**2) + jnp.sum(jnp.abs(s))

    def loss_ref(*p):
        e, s = _xla_tail(*p, 2, 1e-5)
        return jnp.sum(e**2) + jnp.sum(jnp.abs(s))

    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(gf, gr, rtol=1e-4, atol=1e-5)


def test_convtasnet_fused_flag_parity():
    """Full model: fused_tcn routing preserves the params tree and the
    decoded waveform (on CPU the fused op resolves to the rewritten XLA
    tail, so this checks the algebraic rewrite end to end)."""
    from nvse_tpu.models.convtasnet import ConvTasNet

    kw = dict(N=256, L=16, B=128, H=512, P=3, X=3, R=1, num_spks=1,
              skip_con=True, init_phase="zero", num_mels=80)
    m_on = ConvTasNet(fused_tcn=True, **kw)
    m_off = ConvTasNet(fused_tcn=False, **kw)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 80, 16))
    p_on = m_on.init(jax.random.PRNGKey(1), mel)
    p_off = m_off.init(jax.random.PRNGKey(1), mel)
    flat_on = jax.tree_util.tree_flatten_with_path(p_on)[0]
    flat_off = jax.tree_util.tree_flatten_with_path(p_off)[0]
    assert [k for k, _ in flat_on] == [k for k, _ in flat_off]
    y_on = m_on.apply(p_on, mel)
    y_off = m_off.apply(p_on, mel)
    np.testing.assert_allclose(y_on, y_off, rtol=2e-4, atol=2e-4)
