"""Pallas backward kernel for the LSTM recurrence.

The forward kernel (pallas_lstm.py) left the backward as an XLA-scan
recompute: forward-again + reverse scan, both paying XLA's per-step
overhead. This module provides (a) a forward variant that also emits
the cell states and (b) a reverse-time Pallas kernel computing
dx_proj / dW_hh from (x_proj, hs, cs, dhs) with the gates recomputed
in-kernel (one matmul) — the same VMEM-resident structure as the
forward.

Backward math per step (gate order i,f,g,o; all elementwise except the
two matmuls):
  gates_t = x_t + h_{t-1} @ W
  dc_t    = dc_{t+1} + dh_t * o * (1 - tanh(c_t)^2)
  dgates  = [dc*g*i*(1-i), dc*c_{t-1}*f*(1-f), dc*i*(1-g^2), dh*tanh(c)*o*(1-o)]
  dh_{t-1}= dgates @ W^T        (added to the upstream dhs_{t-1})
  dc_{t-1}= dc_t * f
  dx_t    = dgates;  dW += h_{t-1}^T @ dgates
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .pallas_lstm import _FUSED_VMEM_BUDGET, _MAX_BATCH_TILE

# The backward kernel streams 5 tensors per step (x, h_prev, c, c_prev,
# upstream dh) plus dx out — with double buffering a 1024-row tile just
# overflows the 16 MB VMEM. Half-size tiles leave comfortable headroom.
_MAX_BWD_TILE = 512


def _fwd_hc_vmem_bytes(Bt: int, G: int, H: int, it: int) -> int:
    # double-buffered x tile + h/c out tiles, resident W_hh, f32 state
    return 2 * (Bt * G + 2 * Bt * H) * it + H * G * it + 2 * Bt * H * 4


def _bwd_vmem_bytes(Bt: int, G: int, H: int, it: int) -> int:
    # ins: x(G) + h_prev/c/c_prev/dh (4xH); outs: dx(G) + dW block —
    # all double-buffered; resident W_hh; f32 dh/dc/dW scratch
    tiles = 2 * (2 * Bt * G + 4 * Bt * H) * it
    return tiles + 3 * H * G * it + (2 * Bt * H + H * G) * 4


def residual_path_feasible(G: int, H: int, it: int) -> bool:
    """True if the residual-saving fwd+bwd kernels fit VMEM at ANY tile.

    For large H the resident W_hh plus the dW output/scratch blocks
    alone exceed the budget (H=512: 16.4 MB at an 8-row tile) — the
    custom-vjp rules must then fall back to XLA recompute autodiff
    instead of emitting a kernel the TPU compiler will reject.
    """
    return (_fwd_hc_vmem_bytes(8, G, H, it) <= _FUSED_VMEM_BUDGET
            and _bwd_vmem_bytes(8, G, H, it) <= _FUSED_VMEM_BUDGET)


def _fit_tile(bytes_fn, B: int, start: int, G: int, H: int, it: int,
              unroll: int = 1) -> int:
    """Largest 8-multiple tile <= start whose VMEM estimate fits.

    The fixed 1024/512 tiles overflow the 16 MB scoped VMEM once H
    reaches 256 (observed: BSRNN-L feature_dim=256 band-BiLSTM,
    f32[34,2048,256] residual outputs -> 18.04 MB > 16 MB); halving
    until the estimate fits keeps big-H models on the Pallas path.

    With unroll > 1 the streamed tiles are k-fold larger; estimating
    via bytes_fn(k*Bt) also scales the resident weight/state terms —
    a conservative overcount, never an undercount.
    """
    Bt = min(start, (B + 7) // 8 * 8)
    while Bt > 8 and bytes_fn(unroll * Bt, G, H, it) > _FUSED_VMEM_BUDGET:
        Bt = max(8, (Bt // 2 + 7) // 8 * 8)
    return Bt


def _choose_tile_and_unroll(bytes_fn, B: int, T: int, start: int, G: int,
                            H: int, it: int) -> tuple[int, int]:
    """Pick (Bt, k) minimizing total sequential grid steps
    ceil(B/Bt) * ceil(T/k); tie-break toward larger k (fewer, fatter
    steps amortize per-step overhead). bytes_fn(Bt, G, H, it) estimates
    VMEM for ONE time step; tiles scale linearly with k, the resident
    weights/state do not, so the k-step estimate is
    bytes_fn(k*Bt,...) - (k-1)*(fixed) — approximated conservatively by
    bytes_fn at k*Bt (overcounts fixed terms, never undercounts).

    Sub-lane-width H (e.g. BSRNN-S H=64) forces k=1: k>1 blocks with a
    last dim < 128 lanes crash the TPU compiler."""
    if H % 128:
        return _fit_tile(bytes_fn, B, start, G, H, it), 1
    best = None
    for k in (8, 4, 2, 1):
        Bt = _fit_tile(bytes_fn, B, start, G, H, it, unroll=k)
        steps = -(-B // Bt) * -(-T // k)
        cand = (steps, -k, Bt)
        if best is None or cand < best:
            best = cand
    return best[2], -best[1]


def _fwd_kernel_hc_unrolled(k: int):
    """k-step unrolled _fwd_kernel_hc (same overhead amortization as
    pallas_lstm._lstm_kernel_unrolled; trailing time pads are computed
    and sliced off — they never feed a real step)."""

    def kernel(xp_ref, whh_ref, h_out, c_out, h_scratch, c_scratch):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[...] = jnp.zeros_like(h_scratch)
            c_scratch[...] = jnp.zeros_like(c_scratch)

        h, c = h_scratch[...], c_scratch[...]
        H = h.shape[-1]
        whh = whh_ref[...]
        for i in range(k):
            gates = xp_ref[i] + jnp.dot(h, whh,
                                        preferred_element_type=jnp.float32)
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H : 2 * H])
            gg = jnp.tanh(gates[:, 2 * H : 3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H :])
            c = fg * c + ig * gg
            h = og * jnp.tanh(c)
            h_out[i] = h.astype(h_out.dtype)
            c_out[i] = c.astype(c_out.dtype)
        h_scratch[...] = h
        c_scratch[...] = c

    return kernel


def _fwd_kernel_hc(xp_ref, whh_ref, h_out, c_out, h_scratch, c_scratch):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        c_scratch[...] = jnp.zeros_like(c_scratch)

    h = h_scratch[...]
    gates = xp_ref[0] + jnp.dot(h, whh_ref[...], preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_scratch[...] + i * g
    h = o * jnp.tanh(c)
    c_scratch[...] = c
    h_scratch[...] = h
    h_out[0] = h.astype(h_out.dtype)
    c_out[0] = c.astype(c_out.dtype)


def lstm_fwd_hc(x_proj: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool = False,
                unroll: int | None = None):
    """(T, B, 4H), (H, 4H) -> (hs, cs), each (T, B, H)."""
    T, B, G = x_proj.shape
    H = w_hh.shape[0]
    it = x_proj.dtype.itemsize
    if unroll is None:
        Bt, k = _choose_tile_and_unroll(_fwd_hc_vmem_bytes, B, T,
                                        _MAX_BATCH_TILE, G, H, it)
    else:
        k = unroll
        Bt = _fit_tile(_fwd_hc_vmem_bytes, B, _MAX_BATCH_TILE, G, H, it,
                       unroll=k)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    Tb = -(-T // k)
    T_pad = Tb * k
    if B_pad != B or T_pad != T:
        x_proj = jnp.pad(x_proj, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
    hs, cs = pl.pallas_call(
        _fwd_kernel_hc_unrolled(k) if k > 1 else _fwd_kernel_hc,
        grid=(nb, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k, Bt, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((k, Bt, H), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T_pad, B_pad, H), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(x_proj, w_hh)
    return hs[:T, :B, :], cs[:T, :B, :]


def _bwd_kernel(xp_ref, hprev_ref, c_ref, cprev_ref, dh_up_ref, whh_ref,
                dx_ref, dw_ref, dh_scratch, dc_scratch, dw_scratch):
    # grid (nb, T); index maps feed REVERSED time (step 0 = last frame)
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dc_scratch[...] = jnp.zeros_like(dc_scratch)
        dw_scratch[...] = jnp.zeros_like(dw_scratch)

    h_prev = hprev_ref[0]
    w = whh_ref[...]
    H = h_prev.shape[-1]
    gates = xp_ref[0] + jnp.dot(h_prev, w, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])

    c = c_ref[0]
    c_prev = cprev_ref[0]
    tc = jnp.tanh(c)
    dh = dh_up_ref[0] + dh_scratch[...]
    dc = dc_scratch[...] + dh * o * (1.0 - tc * tc)

    dgi = dc * g * i * (1.0 - i)
    dgf = dc * c_prev * f * (1.0 - f)
    dgg = dc * i * (1.0 - g * g)
    dgo = dh * tc * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)

    dx_ref[0] = dgates.astype(dx_ref.dtype)
    dh_scratch[...] = jnp.dot(dgates, w.T, preferred_element_type=jnp.float32)
    dc_scratch[...] = dc * f
    dw_scratch[...] += jnp.dot(h_prev.T, dgates, preferred_element_type=jnp.float32)

    @pl.when(t == T - 1)
    def _():
        dw_ref[0] = dw_scratch[...].astype(dw_ref.dtype)


def _bwd_kernel_unrolled(k: int):
    """k-step unrolled _bwd_kernel. The reversed scan meets the time
    pads FIRST, but no validity mask is needed: the pad rows of every
    streamed tensor are zeros and the backward cell math is
    zero-preserving there (dh = 0 + 0, dc = 0 -> all four dgates are
    products with dc or dh -> 0 -> the dh/dc carries and dW update stay
    exactly zero until the first real step)."""

    def kernel(xp_ref, hprev_ref, c_ref, cprev_ref, dh_up_ref, whh_ref,
               dx_ref, dw_ref, dh_scratch, dc_scratch, dw_scratch):
        t = pl.program_id(1)
        Tb = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            dh_scratch[...] = jnp.zeros_like(dh_scratch)
            dc_scratch[...] = jnp.zeros_like(dc_scratch)
            dw_scratch[...] = jnp.zeros_like(dw_scratch)

        w = whh_ref[...]
        wT = w.T
        dh_c = dh_scratch[...]
        dc_c = dc_scratch[...]
        dw_acc = dw_scratch[...]
        H = dh_c.shape[-1]
        for i in range(k - 1, -1, -1):  # reversed global time
            h_prev = hprev_ref[i]
            gates = xp_ref[i] + jnp.dot(h_prev, w,
                                        preferred_element_type=jnp.float32)
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H : 2 * H])
            gg = jnp.tanh(gates[:, 2 * H : 3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H :])

            tc = jnp.tanh(c_ref[i])
            dh = dh_up_ref[i] + dh_c
            dc = dc_c + dh * og * (1.0 - tc * tc)

            dgi = dc * gg * ig * (1.0 - ig)
            dgf = dc * cprev_ref[i] * fg * (1.0 - fg)
            dgg = dc * ig * (1.0 - gg * gg)
            dgo = dh * tc * og * (1.0 - og)
            dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=1)

            dx_ref[i] = dgates.astype(dx_ref.dtype)
            dh_c = jnp.dot(dgates, wT, preferred_element_type=jnp.float32)
            dc_c = dc * fg
            dw_acc = dw_acc + jnp.dot(h_prev.T, dgates,
                                      preferred_element_type=jnp.float32)
        dh_scratch[...] = dh_c
        dc_scratch[...] = dc_c
        dw_scratch[...] = dw_acc

        @pl.when(t == Tb - 1)
        def _():
            dw_ref[0] = dw_scratch[...].astype(dw_ref.dtype)

    return kernel


def lstm_bwd(x_proj, hs, cs, dhs, w_hh, interpret: bool = False,
             unroll: int | None = None):
    """Reverse-time backward -> (dx_proj, dw_hh)."""
    T, B, G = x_proj.shape
    H = w_hh.shape[0]
    it = x_proj.dtype.itemsize
    if unroll is None:
        Bt, k = _choose_tile_and_unroll(_bwd_vmem_bytes, B, T,
                                        _MAX_BWD_TILE, G, H, it)
    else:
        k = unroll
        Bt = _fit_tile(_bwd_vmem_bytes, B, _MAX_BWD_TILE, G, H, it, unroll=k)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    Tb = -(-T // k)
    T_pad = Tb * k

    def padtb(a):
        if B_pad != B or T_pad != T:
            return jnp.pad(a, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        return a

    zeros = jnp.zeros((1, B, H), x_proj.dtype)
    h_prev = padtb(jnp.concatenate([zeros, hs[:-1]], axis=0))
    c_prev = padtb(jnp.concatenate([zeros, cs[:-1]], axis=0))
    x_proj = padtb(x_proj)
    cs = padtb(cs)
    dhs = padtb(dhs)

    Tbm1 = Tb - 1
    rev = lambda b, t: (Tbm1 - t, b, 0)  # reversed time blocks
    dx, dw = pl.pallas_call(
        _bwd_kernel_unrolled(k) if k > 1 else _bwd_kernel,
        grid=(nb, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, G), rev),        # x_proj
            pl.BlockSpec((k, Bt, H), rev),        # h_prev
            pl.BlockSpec((k, Bt, H), rev),        # c
            pl.BlockSpec((k, Bt, H), rev),        # c_prev
            pl.BlockSpec((k, Bt, H), rev),        # upstream dh
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k, Bt, G), rev),
            pl.BlockSpec((1, H, G), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, G), x_proj.dtype),
            jax.ShapeDtypeStruct((nb, H, G), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(x_proj, h_prev, cs, c_prev, dhs, w_hh)
    return dx[:T, :B, :], jnp.sum(dw, axis=0)
