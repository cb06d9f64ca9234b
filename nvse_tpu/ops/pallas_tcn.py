"""Fused ConvTasNet TCN block tail (gLN + dilated dwconv + res/skip).

PERF.md classifies ConvTasNet as HBM-bound: each of its 24 TCN blocks
(reference Models/convtasnet.py:125-167) runs several full
elementwise/normalization passes over a (B, T', 512) f32 intermediate
(~256 MB at the bench shape), so the decode sits at ~7% MFU while the
matmuls themselves are tiny. This kernel fuses everything AFTER the
block's input 1x1 projection + PReLU into a single pass:

    gLN normalize -> dilated depthwise conv (k=3) -> residual 1x1 and
    skip 1x1 (one concatenated MXU matmul) -> residual add

The global-layer-norm statistics still need their own reduction over
the full (T, C) extent, so the op is two-phase: a cheap fused XLA
reduction produces per-batch (scale, shift) vectors, then one
pallas_call streams the projected tensor exactly once, applying the
normalization as an elementwise epilogue in VMEM instead of
materializing the normalized / conv-output tensors in HBM. Dilated
taps come from 128-row halo blocks of the same operand (dilation <= 128
covers the reference's 2**0..2**7 schedule), masked to the zero-padding
semantics of torch's Conv1d at the sequence edges.

Gradients: `tcn_block_tail` carries a custom VJP whose backward
re-derives the cotangents through the pure-XLA reference tail
(recompute — same policy as ops/pallas_lstm.py), so the fused path is
safe under `jax.grad` even though training normally keeps the unfused
module path.

MEASURED OUTCOME (v5e, bench_fleet batch 8 x 1024 frames): the kernel
is SLOWER than XLA's own fusion of the unfused tail — 519x vs 694x RT
full-model. The separate stats reduction re-reads `c`, the halo blocks
re-read another ~50% of it, and XLA already keeps the norm epilogue
fused into the depthwise conv, so the saved intermediates don't pay
for the extra traffic at this shape. The model therefore defaults to
`fused_tcn=False`; the kernel stays available (config "fused_tcn": 1)
for much longer sequences where XLA's fusion windows break down.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_HALO = 128  # rows of left/right context fetched per tile; >= max dilation


def _xla_tail(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs, dilation, eps):
    """Pure-XLA reference of the fused tail (also the VJP backward).

    c      (B, T, H)  PReLU'd output of the block's input 1x1 conv
    x      (B, T, Bc) block input (residual stream)
    gln_w  (1, H) / gln_b (1, H)
    w_dw   (k, H) depthwise kernel, b_dw (1, H)
    w_rs   (H, 2*Bc) concatenated [res | skip] 1x1 weights, b_rs (1, 2*Bc)
    -> (e_next (B, T, Bc), skip (B, T, Bc))
    """
    f32 = jnp.float32
    m1 = jnp.mean(c, axis=(1, 2), keepdims=True, dtype=f32)
    m2 = jnp.mean(jnp.square(c.astype(f32)), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    n = (gln_w[None] * rstd) * (c.astype(f32) - m1) + gln_b[None]
    k = w_dw.shape[0]
    pad = dilation * (k - 1) // 2
    q = jax.lax.conv_general_dilated(
        n.astype(c.dtype), w_dw[:, None, :].astype(c.dtype),
        window_strides=(1,), padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=w_dw.shape[1],
    ).astype(f32) + b_dw[None]
    out = jnp.dot(q.astype(c.dtype), w_rs.astype(c.dtype),
                  preferred_element_type=f32) + b_rs[None]
    Bc = x.shape[-1]
    e = x.astype(f32) + out[..., :Bc]
    return e.astype(x.dtype), out[..., Bc:].astype(x.dtype)


def _tcn_kernel(d: int, Tt: int, T: int, Bc: int):
    """One grid step: normalize a (Tt + 2d)-row window of c, apply the
    k=3 dilated depthwise conv, then the concatenated res/skip matmul."""

    def kernel(a_ref, b2_ref, lh_ref, cc_ref, rh_ref, x_ref,
               wdw_ref, bdw_ref, wrs_ref, brs_ref, eo_ref, sk_ref):
        t = pl.program_id(1)
        win = jnp.concatenate(
            [lh_ref[0][_HALO - d:], cc_ref[0], rh_ref[0][:d]], axis=0)
        # zero-padding semantics: taps outside [0, T) read a normalized
        # value of exactly 0 (torch pads the POST-norm tensor)
        grow = (t * Tt - d
                + jax.lax.broadcasted_iota(jnp.int32, (Tt + 2 * d, 1), 0))
        valid = (grow >= 0) & (grow < T)
        wn = jnp.where(valid, win.astype(jnp.float32) * a_ref[0] + b2_ref[0], 0.0)
        q = (wn[0:Tt] * wdw_ref[0:1, :]
             + wn[d:Tt + d] * wdw_ref[1:2, :]
             + wn[2 * d:Tt + 2 * d] * wdw_ref[2:3, :]
             + bdw_ref[...])
        wrs = wrs_ref[...]
        out = jnp.dot(q.astype(wrs.dtype), wrs,
                      preferred_element_type=jnp.float32) + brs_ref[...]
        e = x_ref[0].astype(jnp.float32) + out[:, :Bc]
        eo_ref[0] = e.astype(eo_ref.dtype)
        sk_ref[0] = out[:, Bc:].astype(sk_ref.dtype)

    return kernel


def _choose_tt(T: int) -> int:
    for tt in (512, 256, 128):
        if T % tt == 0:
            return tt
    return 512  # pad path


def _pallas_tail(c, x, a, b2, w_dw, b_dw, w_rs, b_rs, dilation: int,
                 interpret: bool = False):
    """Launch the fused kernel. a/b2 are the folded per-batch gLN
    scale/shift (B, H) f32; see tcn_block_tail for the fold."""
    B, T, H = c.shape
    Bc = x.shape[-1]
    assert 1 <= dilation <= _HALO and w_dw.shape[0] == 3
    Tt = _choose_tt(T)
    Tp = -(-T // Tt) * Tt
    if Tp != T:
        c = jnp.pad(c, ((0, 0), (0, Tp - T), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    r = Tt // _HALO
    nh = Tp // _HALO  # halo-sized blocks along T
    d = dilation
    eo, sk = pl.pallas_call(
        _tcn_kernel(d, Tt, T, Bc),
        grid=(B, Tp // Tt),
        in_specs=[
            # (B, 1, H) so the trailing block dims (1, H) exactly match
            # the array dims — the TPU lowering requires the last two
            # block dims be (8, 128)-divisible or full-extent
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),              # a
            pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0)),              # b2
            pl.BlockSpec((1, _HALO, H),
                         lambda b, t: (b, jnp.maximum(t * r - 1, 0), 0)),  # left halo
            pl.BlockSpec((1, Tt, H), lambda b, t: (b, t, 0)),             # center
            pl.BlockSpec((1, _HALO, H),
                         lambda b, t: (b, jnp.minimum(t * r + r, nh - 1), 0)),
            pl.BlockSpec((1, Tt, Bc), lambda b, t: (b, t, 0)),            # x
            pl.BlockSpec((3, H), lambda b, t: (0, 0)),                    # w_dw
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),                    # b_dw
            pl.BlockSpec((H, 2 * Bc), lambda b, t: (0, 0)),               # w_rs
            pl.BlockSpec((1, 2 * Bc), lambda b, t: (0, 0)),               # b_rs
        ],
        out_specs=[
            pl.BlockSpec((1, Tt, Bc), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Tt, Bc), lambda b, t: (b, t, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, Tp, Bc), x.dtype)] * 2,
        interpret=interpret,
    )(a[:, None], b2[:, None], c, c, c, x, w_dw, b_dw, w_rs, b_rs)
    if Tp != T:
        eo, sk = eo[:, :T], sk[:, :T]
    return eo, sk


def _tail_fwd_impl(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs,
                   dilation, eps):
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_tail(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs,
                         dilation, eps)
    f32 = jnp.float32
    B = c.shape[0]
    m1 = jnp.mean(c, axis=(1, 2), dtype=f32).reshape(B, 1)
    m2 = jnp.mean(jnp.square(c.astype(f32)), axis=(1, 2)).reshape(B, 1)
    rstd = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + eps)
    # fold gLN into per-batch scale/shift: n = a*c + b2
    a = gln_w.astype(f32) * rstd               # (B, H)
    b2 = gln_b.astype(f32) - m1 * a
    return _pallas_tail(c, x, a, b2, w_dw, b_dw, w_rs, b_rs, dilation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def tcn_block_tail(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs,
                   dilation: int, eps: float = 1e-5):
    """Fused TCN block tail: (e_next, skip) from the PReLU'd input
    projection `c` and the residual stream `x`. Shapes as in _xla_tail.
    Falls back to pure XLA off-TPU; backward always goes through XLA
    recompute."""
    return _tail_fwd_impl(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs,
                          dilation, eps)


def _tail_fwd(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs, dilation, eps):
    y = _tail_fwd_impl(c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs,
                       dilation, eps)
    return y, (c, x, gln_w, gln_b, w_dw, b_dw, w_rs, b_rs)


def _tail_bwd(dilation, eps, residuals, cts):
    _, vjp = jax.vjp(
        lambda *p: _xla_tail(*p, dilation, eps), *residuals)
    return vjp(cts)


tcn_block_tail.defvjp(_tail_fwd, _tail_bwd)
