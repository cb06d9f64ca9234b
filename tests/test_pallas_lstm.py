"""Pallas LSTM kernel parity (interpret mode on CPU) + gradient path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.ops.pallas_lstm import _pallas_lstm_scan, _xla_lstm_scan, lstm_scan


def _data(T=37, B=20, H=16, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    return xp, whh


def test_kernel_matches_xla_scan_interpret():
    xp, whh = _data()
    ref = np.asarray(_xla_lstm_scan(xp, whh))
    got = np.asarray(_pallas_lstm_scan(xp, whh, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_kernel_batch_padding_path():
    # B=20 pads to 24 internally; output must crop back exactly
    xp, whh = _data(B=20)
    got = _pallas_lstm_scan(xp, whh, interpret=True)
    assert got.shape == (37, 20, 16)


def test_lstm_scan_gradients_finite():
    xp, whh = _data(T=9, B=8, H=8)

    def loss(xp, whh):
        return jnp.sum(lstm_scan(xp, whh) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(xp, whh)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()
    # grads match direct XLA implementation's grads
    gx2, gw2 = jax.grad(lambda a, b: jnp.sum(_xla_lstm_scan(a, b) ** 2),
                        argnums=(0, 1))(xp, whh)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2), rtol=1e-5, atol=1e-6)


def test_kernel_batch_tiling_large():
    # batch > _MAX_BATCH_TILE exercises the multi-tile grid path
    xp, whh = _data(T=5, B=1100, H=16, seed=1)
    ref = np.asarray(_xla_lstm_scan(xp, whh))
    got = np.asarray(_pallas_lstm_scan(xp, whh, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bidir_kernel_matches_two_scans_interpret():
    from nvse_tpu.ops.pallas_lstm import (
        _pallas_lstm_scan_bidir,
        _xla_lstm_scan_bidir,
    )
    rng = np.random.default_rng(2)
    T, B, H = 21, 20, 16
    xp = jnp.asarray(rng.standard_normal((T, 2 * B, 4 * H)).astype(np.float32) * 0.4)
    ws = jnp.asarray(rng.standard_normal((2 * H, 4 * H)).astype(np.float32) * 0.1)
    ref = np.asarray(_xla_lstm_scan_bidir(xp, ws))
    got = np.asarray(_pallas_lstm_scan_bidir(xp, ws, B, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bidir_kernel_multi_tile_interpret():
    # 2B > tile forces multiple tiles; boundary rows must route to the
    # right direction's weights
    from nvse_tpu.ops.pallas_lstm import (
        _MAX_BIDIR_TILE,
        _pallas_lstm_scan_bidir,
        _xla_lstm_scan_bidir,
    )
    rng = np.random.default_rng(3)
    T, B, H = 4, _MAX_BIDIR_TILE // 2 + 40, 8   # straddles the tile boundary
    xp = jnp.asarray(rng.standard_normal((T, 2 * B, 4 * H)).astype(np.float32) * 0.3)
    ws = jnp.asarray(rng.standard_normal((2 * H, 4 * H)).astype(np.float32) * 0.1)
    ref = np.asarray(_xla_lstm_scan_bidir(xp, ws))
    got = np.asarray(_pallas_lstm_scan_bidir(xp, ws, B, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bwd_kernel_parity_interpret():
    """Pallas backward kernel grads == autodiff of the XLA scan."""
    from nvse_tpu.ops.pallas_lstm_bwd import lstm_bwd, lstm_fwd_hc

    rng = np.random.default_rng(0)
    for (T, B, H) in [(13, 20, 16), (5, 1100, 8)]:
        xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.4)
        w = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.15)
        hs, cs = lstm_fwd_hc(xp, w, interpret=True)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(_xla_lstm_scan(xp, w)),
                                   rtol=1e-5, atol=1e-5)
        dhs = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
        gx_ref, gw_ref = jax.grad(
            lambda xp, w: jnp.sum(_xla_lstm_scan(xp, w) * dhs), argnums=(0, 1)
        )(xp, w)
        gx, gw = lstm_bwd(xp, hs, cs, dhs, w, interpret=True)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=2e-4, atol=2e-4)


def test_bidir2_kernel_matches_two_scans_interpret():
    from nvse_tpu.ops.pallas_lstm import (
        _pallas_lstm_scan_bidir2,
        _xla_lstm_scan,
    )
    rng = np.random.default_rng(3)
    T, B, H = 11, 12, 16
    xf = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    xb = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    wf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    got_f, got_b = _pallas_lstm_scan_bidir2(xf, xb, wf, wb, interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(_xla_lstm_scan(xf, wf)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(_xla_lstm_scan(xb, wb)),
                               rtol=1e-5, atol=1e-5)


def test_bidir2_gradients_match_xla():
    from nvse_tpu.ops.pallas_lstm import lstm_scan_bidir2, _xla_lstm_scan

    rng = np.random.default_rng(4)
    T, B, H = 7, 6, 8
    xf = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    xb = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    wf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)

    def loss(a, b, c, d):
        hf, hb = lstm_scan_bidir2(a, b, c, d)
        return jnp.sum(hf ** 2) + jnp.sum(hb * hb * 0.5)

    def loss_ref(a, b, c, d):
        return (jnp.sum(_xla_lstm_scan(a, c) ** 2)
                + jnp.sum(_xla_lstm_scan(b, d) ** 2 * 0.5))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(xf, xb, wf, wb)
    refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xf, xb, wf, wb)
    for g, r in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def _fused_data(T=13, B=10, C=12, H=16, seed=5, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(dtype) * 0.5)
    wif = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(dtype) * 0.1)
    wib = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(dtype) * 0.1)
    bf = jnp.asarray(rng.standard_normal(4 * H).astype(dtype) * 0.1)
    bb = jnp.asarray(rng.standard_normal(4 * H).astype(dtype) * 0.1)
    whf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(dtype) * 0.1)
    whb = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(dtype) * 0.1)
    return x, wif, wib, bf, bb, whf, whb


def test_fused_kernel_matches_ref_interpret():
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_fused,
                                          _xla_lstm_fused_ref)
    args = _fused_data()
    ref = np.asarray(_xla_lstm_fused_ref(*args))
    got = np.asarray(_pallas_lstm_fused(*args, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_kernel_batch_padding_interpret():
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_fused,
                                          _xla_lstm_fused_ref)
    args = _fused_data(B=20)  # pads to 24 internally
    ref = np.asarray(_xla_lstm_fused_ref(*args))
    got = np.asarray(_pallas_lstm_fused(*args, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_xla():
    from nvse_tpu.ops.pallas_lstm import lstm_scan_fused, _xla_lstm_fused_ref

    args = _fused_data(T=7, B=4, C=6, H=8, seed=6)

    def loss(*a):
        return jnp.sum(lstm_scan_fused(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_xla_lstm_fused_ref(*a) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(7)))(*args)
    refs = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for g, r in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_fused_vmem_guard_falls_back():
    from nvse_tpu.ops.pallas_lstm import (_FUSED_VMEM_BUDGET,
                                          _fused_vmem_bytes)
    # HD-Demucs bottleneck BLSTM (C=768, H=384) must NOT claim to fit
    assert _fused_vmem_bytes(1024, 768, 384, 4) > _FUSED_VMEM_BUDGET
    # flagship BSRNN shapes must fit
    assert _fused_vmem_bytes(1024, 128, 128, 4) <= _FUSED_VMEM_BUDGET


def test_fused_saving_fwd_bwd_interpret():
    """The residual-saving training path of lstm_scan_fused (the branch
    its custom_vjp takes on TPU) must match jax.grad of the XLA
    reference — exercised on CPU via interpret-mode Pallas kernels."""
    from nvse_tpu.ops.pallas_lstm import (_fused_bwd_saved,
                                          _fused_fwd_saving,
                                          _xla_lstm_fused_ref)

    args = _fused_data(T=7, B=4, C=6, H=8, seed=7)
    out, saved = _fused_fwd_saving(*args, interpret=True)
    ref_out = _xla_lstm_fused_ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)

    def loss_ref(*a):
        return jnp.sum(_xla_lstm_fused_ref(*a) ** 2)

    g = 2.0 * out
    grads = _fused_bwd_saved(saved, *args, g, interpret=True)
    refs = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    assert len(grads) == 7
    for got, ref in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_tiered_fallback_selection():
    """HD-Demucs bottleneck BLSTM (C=H=768): f32 must route to the
    per-direction kernel tier, bf16 to the shared dual-dot tier."""
    from nvse_tpu.ops.pallas_lstm import (_FUSED_VMEM_BUDGET,
                                          _bidir2_vmem_bytes,
                                          _fused_vmem_bytes,
                                          _scan_vmem_bytes)
    Bt, C, H = 8, 768, 768
    assert _fused_vmem_bytes(Bt, C, H, 4) > _FUSED_VMEM_BUDGET
    assert _fused_vmem_bytes(Bt, C, H, 2) > _FUSED_VMEM_BUDGET
    assert _bidir2_vmem_bytes(Bt, H, 4) > _FUSED_VMEM_BUDGET   # 19 MB
    assert _scan_vmem_bytes(Bt, H, 4) <= _FUSED_VMEM_BUDGET    # 9.6 MB
    assert _bidir2_vmem_bytes(Bt, H, 2) <= _FUSED_VMEM_BUDGET  # bf16 fits


def test_tiered_fallback_matches_fused_ref_interpret():
    """The dual-dot fallback composition (xg in XLA + bidir2 kernel +
    concat/flip) must equal _xla_lstm_fused_ref numerics."""
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_scan_bidir2,
                                          _xla_lstm_fused_ref)
    rng = np.random.default_rng(7)
    B, T, C, H = 3, 11, 10, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.5)
    wif = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(np.float32) * 0.2)
    wib = jnp.asarray(rng.standard_normal((C, 4 * H)).astype(np.float32) * 0.2)
    bf = jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1)
    bb = jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1)
    whf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    whb = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    want = np.asarray(_xla_lstm_fused_ref(x, wif, wib, bf, bb, whf, whb))
    xg_f = jnp.swapaxes(x @ wif + bf, 0, 1)
    xg_b = jnp.swapaxes(jnp.flip(x, axis=1) @ wib + bb, 0, 1)
    hs_f, hs_b = _pallas_lstm_scan_bidir2(xg_f, xg_b, whf, whb, interpret=True)
    got = np.concatenate(
        [np.swapaxes(np.asarray(hs_f), 0, 1),
         np.flip(np.swapaxes(np.asarray(hs_b), 0, 1), axis=1)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_kernels_accept_bf16_inputs_interpret():
    """bf16 x_proj tiles must write bf16 outputs (f32 state math inside);
    regression for the tiered-fallback path under compute_dtype=bf16."""
    xp, whh = _data(T=9, B=4, H=8)
    xpb = xp.astype(jnp.bfloat16)
    want = np.asarray(_xla_lstm_scan(xp, whh))
    got = _pallas_lstm_scan(xpb, whh, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0.05, atol=0.05)
    from nvse_tpu.ops.pallas_lstm import _pallas_lstm_scan_bidir2
    gf, gb = _pallas_lstm_scan_bidir2(xpb, xpb, whh, whh, interpret=True)
    assert gf.dtype == jnp.bfloat16 and gb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gf, np.float32), want,
                               rtol=0.05, atol=0.05)


def test_residual_kernels_accept_bf16_k1_interpret():
    """bf16 through the NON-unrolled residual kernels (k=1 is what the
    chooser picks for H % 128 != 0, e.g. BSRNN-S H=64): out-ref stores
    must cast f32 cell math back to the input dtype. Regression — the
    k=1 kernels crashed with 'Invalid dtype for swap' under bf16."""
    from nvse_tpu.ops.pallas_lstm_bwd import lstm_bwd, lstm_fwd_hc

    xp, whh = _data(T=6, B=4, H=8)
    hs32, cs32 = lstm_fwd_hc(xp, whh, interpret=True, unroll=1)
    hsb, csb = lstm_fwd_hc(xp.astype(jnp.bfloat16), whh.astype(jnp.bfloat16),
                           interpret=True, unroll=1)
    assert hsb.dtype == jnp.bfloat16 and csb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(hsb, np.float32), np.asarray(hs32),
                               rtol=0.05, atol=0.05)

    dhs = jnp.ones_like(hs32)
    dx32, dw32 = lstm_bwd(xp, hs32, cs32, dhs, whh, interpret=True, unroll=1)
    dxb, dwb = lstm_bwd(xp.astype(jnp.bfloat16), hsb, csb,
                        dhs.astype(jnp.bfloat16), whh.astype(jnp.bfloat16),
                        interpret=True, unroll=1)
    assert dxb.dtype == jnp.bfloat16 and dwb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dxb, np.float32), np.asarray(dx32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(dwb, np.float32), np.asarray(dw32),
                               rtol=0.1, atol=0.15)


def test_residual_tile_fit_and_feasibility():
    # Regression for the BSRNN-L VMEM OOM: at feature_dim=256 the
    # band-BiLSTM residual forward (f32[34,2048,256] outputs) blew the
    # 16 MB scoped VMEM with the fixed 1024-row tile. The adaptive fit
    # must (a) keep the flagship H=128 tiles unchanged, (b) shrink
    # H=256 until the estimate fits, (c) declare H>=512 infeasible so
    # the vjp rules fall back to XLA recompute.
    from nvse_tpu.ops.pallas_lstm import _FUSED_VMEM_BUDGET, _MAX_BATCH_TILE
    from nvse_tpu.ops.pallas_lstm_bwd import (_MAX_BWD_TILE, _bwd_vmem_bytes,
                                              _fit_tile, _fwd_hc_vmem_bytes,
                                              residual_path_feasible)

    # flagship BSRNN-M band-BiLSTM shape: unchanged tiles
    assert _fit_tile(_fwd_hc_vmem_bytes, 1040, _MAX_BATCH_TILE, 512, 128, 4) == 1024
    assert _fit_tile(_bwd_vmem_bytes, 1040, _MAX_BWD_TILE, 512, 128, 4) == 512
    # BSRNN-L: tiles shrink and the estimates fit the budget
    bf = _fit_tile(_fwd_hc_vmem_bytes, 1040, _MAX_BATCH_TILE, 1024, 256, 4)
    bb = _fit_tile(_bwd_vmem_bytes, 1040, _MAX_BWD_TILE, 1024, 256, 4)
    assert bf < 1024 and _fwd_hc_vmem_bytes(bf, 1024, 256, 4) <= _FUSED_VMEM_BUDGET
    assert bb < 512 and _bwd_vmem_bytes(bb, 1024, 256, 4) <= _FUSED_VMEM_BUDGET
    assert residual_path_feasible(1024, 256, 4)
    # HD-Demucs-class hidden sizes: W_hh + dW blocks alone exceed VMEM
    assert not residual_path_feasible(2048, 512, 4)
    assert not residual_path_feasible(3072, 768, 4)


def test_residual_kernels_multi_tile_shrunken_interpret():
    # Numeric parity through a genuinely SHRUNKEN tile (H=256 forces
    # Bt<B): forward states and backward grads must match the XLA scan.
    from nvse_tpu.ops.pallas_lstm_bwd import lstm_bwd, lstm_fwd_hc

    T, B, H = 3, 600, 256
    rng = np.random.default_rng(7)
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.05)
    hs, cs = lstm_fwd_hc(xp, whh, interpret=True)
    ref = np.asarray(_xla_lstm_scan(xp, whh))
    np.testing.assert_allclose(np.asarray(hs), ref, rtol=2e-5, atol=2e-5)

    g = jnp.ones_like(hs)
    dx, dw = lstm_bwd(xp, hs, cs, g, whh, interpret=True)
    _, vjp = jax.vjp(_xla_lstm_scan, xp, whh)
    dx_ref, dw_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-3)


def test_fused_unrolled_matches_ref_interpret():
    # k=4 with T=13 exercises time padding (pad block is the FIRST one
    # the reversed backward direction meets — masked state updates).
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_fused_unrolled,
                                          _xla_lstm_fused_ref)
    args = _fused_data()
    ref = np.asarray(_xla_lstm_fused_ref(*args))
    for k in (2, 4, 8):
        got = np.asarray(_pallas_lstm_fused_unrolled(*args, k=k,
                                                     interpret=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"unroll k={k}")


def test_fused_unrolled_exact_multiple_and_batch_pad_interpret():
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_fused_unrolled,
                                          _xla_lstm_fused_ref)
    # T=16 divisible by k=4; B=20 pads to 24 rows
    args = _fused_data(T=16, B=20, seed=9)
    ref = np.asarray(_xla_lstm_fused_ref(*args))
    got = np.asarray(_pallas_lstm_fused_unrolled(*args, k=4, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_unrolled_t_smaller_than_k_interpret():
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_fused_unrolled,
                                          _xla_lstm_fused_ref)
    args = _fused_data(T=3, seed=11)  # single, mostly-padded block
    ref = np.asarray(_xla_lstm_fused_ref(*args))
    got = np.asarray(_pallas_lstm_fused_unrolled(*args, k=8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_choose_fused_unroll_budget():
    from nvse_tpu.ops.pallas_lstm import (_FUSED_VMEM_BUDGET,
                                          _choose_fused_unroll,
                                          _fused_vmem_bytes_unrolled)
    # BSRNN-M time-LSTM shape: the chosen k must fit the budget and be
    # maximal among the candidates
    Bt, C, H, it = 240, 128, 128, 4
    k = _choose_fused_unroll(Bt, C, H, it)
    assert k >= 4
    assert _fused_vmem_bytes_unrolled(k, Bt, C, H, it) <= _FUSED_VMEM_BUDGET
    if k < 8:
        assert _fused_vmem_bytes_unrolled(2 * k, Bt, C, H, it) > _FUSED_VMEM_BUDGET
    # huge rows force k=1 (falls back to the non-unrolled kernel)
    assert _choose_fused_unroll(1024, 768, 768, 4) == 1


def test_scan_unrolled_matches_xla_interpret():
    from nvse_tpu.ops.pallas_lstm import _pallas_lstm_scan
    T, B, H = 13, 10, 16
    rng = np.random.default_rng(21)
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    ref = np.asarray(_xla_lstm_scan(xp, whh))
    for k in (2, 4, 8, 16):  # 16 > T: single mostly-padded block
        got = np.asarray(_pallas_lstm_scan(xp, whh, interpret=True, unroll=k))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"unroll k={k}")


def test_fwd_hc_unrolled_matches_interpret():
    from nvse_tpu.ops.pallas_lstm_bwd import lstm_fwd_hc
    T, B, H = 13, 10, 16
    rng = np.random.default_rng(31)
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    hs1, cs1 = lstm_fwd_hc(xp, whh, interpret=True, unroll=1)
    for k in (2, 4, 8, 16):
        hs, cs = lstm_fwd_hc(xp, whh, interpret=True, unroll=k)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(hs1),
                                   rtol=1e-5, atol=1e-5, err_msg=f"k={k}")
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cs1),
                                   rtol=1e-5, atol=1e-5, err_msg=f"k={k}")


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_bwd_unrolled_matches_interpret():
    # reversed scan meets the zero pad block first; grads must match
    # the k=1 kernel and the XLA vjp exactly
    from nvse_tpu.ops.pallas_lstm_bwd import lstm_bwd, lstm_fwd_hc
    T, B, H = 13, 10, 16
    rng = np.random.default_rng(33)
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.05)
    hs, cs = lstm_fwd_hc(xp, whh, interpret=True, unroll=1)
    g = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    dx1, dw1 = lstm_bwd(xp, hs, cs, g, whh, interpret=True, unroll=1)
    _, vjp = jax.vjp(_xla_lstm_scan, xp, whh)
    dx_ref, dw_ref = vjp(g)
    for k in (2, 4, 8, 16):
        dx, dw = lstm_bwd(xp, hs, cs, g, whh, interpret=True, unroll=k)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx1),
                                   rtol=1e-5, atol=1e-5, err_msg=f"k={k}")
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw1),
                                   rtol=1e-5, atol=1e-5, err_msg=f"k={k}")
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-3)


def test_choose_tile_and_unroll_never_shrinks_throughput():
    # unroll must never be bought by shrinking the batch tile into MORE
    # total grid steps than the k=1 choice
    from nvse_tpu.ops.pallas_lstm_bwd import (_bwd_vmem_bytes,
                                              _choose_tile_and_unroll,
                                              _fit_tile, _fwd_hc_vmem_bytes)
    for fn, start in ((_fwd_hc_vmem_bytes, 1024), (_bwd_vmem_bytes, 512)):
        for (B, T, G, H) in ((480, 65, 512, 128), (1040, 30, 512, 128),
                             (480, 65, 1024, 256), (8192, 30, 512, 128)):
            Bt1 = _fit_tile(fn, B, start, G, H, 4)
            base_steps = -(-B // Bt1) * T
            Bt, k = _choose_tile_and_unroll(fn, B, T, start, G, H, 4)
            steps = -(-B // Bt) * -(-T // k)
            assert steps <= base_steps, (B, T, G, H, Bt, k)


def test_stateful_kernel_matches_xla_scan_interpret():
    from nvse_tpu.ops.pallas_lstm import (_pallas_lstm_scan_stateful,
                                          _xla_lstm_scan_stateful)
    rng = np.random.default_rng(7)
    T, B, H = 23, 12, 16
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * .5)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * .1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * .3)
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * .3)
    ref_h, ref_c = _xla_lstm_scan_stateful(xp, whh, h0, c0)
    for k in (1, 4):  # zero-unroll and unrolled (time-padding) paths
        got_h, got_c = _pallas_lstm_scan_stateful(xp, whh, h0, c0,
                                                  interpret=True, unroll=k)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-5)


def test_stateful_kernel_chunk_equals_full_interpret():
    # two chunks with the carried (h, c) must reproduce the one-shot
    # decode exactly — the property synthesize_streaming_stateful
    # relies on for its zero-seam causal claim
    from nvse_tpu.ops.pallas_lstm import _pallas_lstm_scan_stateful
    rng = np.random.default_rng(11)
    T, B, H = 30, 20, 16  # B=20 also exercises the batch-pad crop
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * .5)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * .1)
    z = jnp.zeros((B, H), jnp.float32)
    full_h, full_c = _pallas_lstm_scan_stateful(xp, whh, z, z, interpret=True)
    cut = 17
    h1, c1 = _pallas_lstm_scan_stateful(xp[:cut], whh, z, z, interpret=True)
    h2, c2 = _pallas_lstm_scan_stateful(xp[cut:], whh, h1[-1], c1[-1],
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([h1, h2])),
                               np.asarray(full_h), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([c1, c2])),
                               np.asarray(full_c), rtol=1e-5, atol=1e-5)
