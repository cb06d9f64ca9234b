"""Fused Pallas LSTM recurrence kernel for TPU.

Profiling shows BSRNN inference is sequential-latency-bound: its 16
time-LSTMs run 1024-step XLA scans whose per-step (B*, 4H) matmuls are
too small to hide loop overhead (bf16 gives no speedup; batch scaling
is linear). This kernel runs the WHOLE recurrence inside one
pallas_call: the grid iterates time steps sequentially (TPU grid
execution order), Pallas auto-pipelines the per-step input tile
HBM->VMEM, and the hidden/cell state + W_hh stay resident in VMEM
scratch across grid steps — no per-step HBM weight re-reads, no
per-step loop machinery.

Contract (matches layers.LSTM single direction):
  x_proj (T, B, 4H) = x @ W_ih + b (the big matmul stays in XLA/MXU)
  w_hh   (H, 4H)
  -> hs  (T, B, H)
Gate order (i, f, g, o), torch numerics.

Gradients: custom_vjp whose backward re-runs the pure-XLA scan under
jax.vjp (recompute); training uses the same public function.
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


def _hdot(h, w):
    """h @ w with h cast to the weights' dtype. The recurrent state is
    kept f32 in VMEM scratch, but bf16 weights want a uniform-dtype MXU
    dot: mixed f32 x bf16 operands both run slower and, at the BSRNN-L
    band shape ((1024, 256) @ (256, 1024)), fail Mosaic compilation
    outright (remote_compile HTTP 500, round 4). Accumulation stays
    f32 via preferred_element_type."""
    return jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _xla_lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation: lax.scan over time (T, B, 4H)->(T, B, H)."""
    H = w_hh.shape[0]
    B = x_proj.shape[1]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x_proj.dtype), jnp.zeros((B, H), x_proj.dtype))
    _, hs = jax.lax.scan(step, init, x_proj)
    return hs


def _xla_lstm_scan_stateful(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                            h0: jnp.ndarray, c0: jnp.ndarray):
    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), (h, c)

    _, (hs, cs) = jax.lax.scan(step, (h0, c0), x_proj)
    return hs, cs


def lstm_scan_stateful(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                       h0: jnp.ndarray, c0: jnp.ndarray):
    """(T, B, 4H), (H, 4H), (B, H), (B, H) -> (hs, cs), each (T, B, H).

    Streaming-decode variant: the recurrence starts from a CALLER
    state instead of zeros and the full (h, c) trajectories are
    returned so the caller can snapshot the carry at any chunk
    boundary (engine.synthesize_streaming_stateful). Same gate math as
    _xla_lstm_scan (torch i,f,g,o order). Inference-path only (no
    custom VJP — streaming decode is never differentiated); on TPU the
    same grid-scan Pallas kernel as lstm_scan runs with the zero-init
    replaced by h0/c0 tiles consumed at t == 0.
    """
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_scan_stateful(x_proj, w_hh, h0, c0)
    return _pallas_lstm_scan_stateful(x_proj, w_hh, h0, c0)


def _lstm_kernel(xp_ref, whh_ref, out_ref, h_scratch, c_scratch):
    # grid = (batch_tiles, T): batch tile is the OUTER axis, so for a
    # fixed tile the inner axis scans all T steps with h/c resident in
    # VMEM scratch; reset at t == 0
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        c_scratch[...] = jnp.zeros_like(c_scratch)

    h = h_scratch[...]
    gates = xp_ref[0] + _hdot(h, whh_ref[...])
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_scratch[...] + i * g
    h = o * jnp.tanh(c)
    c_scratch[...] = c
    h_scratch[...] = h
    out_ref[0] = h.astype(out_ref.dtype)


def _lstm_kernel_unrolled(k: int):
    """Unidirectional _lstm_kernel processing k time steps per grid
    step (same overhead-amortization rationale as
    _fused_kernel_unrolled; no validity mask needed — the time padding
    trails the real steps, so pad outputs are computed-and-discarded
    and never feed a real step's state)."""

    def kernel(xp_ref, whh_ref, out_ref, h_scratch, c_scratch):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[...] = jnp.zeros_like(h_scratch)
            c_scratch[...] = jnp.zeros_like(c_scratch)

        h, c = h_scratch[...], c_scratch[...]
        H = h.shape[-1]
        whh = whh_ref[...]
        for i in range(k):
            gates = xp_ref[i] + _hdot(h, whh)
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H : 2 * H])
            gg = jnp.tanh(gates[:, 2 * H : 3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H :])
            c = fg * c + ig * gg
            h = og * jnp.tanh(c)
            out_ref[i] = h.astype(out_ref.dtype)
        h_scratch[...] = h
        c_scratch[...] = c

    return kernel


def _scan_vmem_bytes_unrolled(k: int, Bt: int, H: int, itemsize: int) -> int:
    weights = H * 4 * H * itemsize
    tiles = 2 * (k * Bt * 4 * H + k * Bt * H) * itemsize
    state = 2 * Bt * H * 4
    return weights + tiles + state


def _choose_scan_unroll(Bt: int, H: int, itemsize: int) -> int:
    if H % 128:  # sub-lane-width H: k>1 blocks crash the TPU compiler
        return 1  # (observed: BSRNN-S H=64 remote-compile abort)
    # k=16/32 only reachable at itemsize 2 (bf16 tiles halve VMEM);
    # measured monotone wins on the dispatch-bound H=128 shapes
    # (PROFILE_LSTM_STEP.jsonl: per-grid-step floor ~10-14 us dominates)
    for k in (32, 16, 8, 4, 2):
        if _scan_vmem_bytes_unrolled(k, Bt, H, itemsize) <= _FUSED_VMEM_BUDGET:
            return k
    return 1


# Batch rows per tile. Each extra tile re-runs the whole sequential
# T-loop, so prefer ONE tile whenever VMEM allows: at H=128, G=512 a
# 1024-row tile costs ~6.3 MB (2x 2MB input buffers + 1MB out + 1MB
# state + W_hh) of the 16 MB VMEM.
_MAX_BATCH_TILE = 1024


def _batch_tile(B: int, H: int, itemsize: int) -> int:
    """Batch rows per tile. Prefer one tile (each extra tile re-runs the
    whole sequential T loop), bounded by _MAX_BATCH_TILE — and, for bf16
    blocks, by Bt*H <= 2**17: the Mosaic compiler rejects bf16 kernels
    with (1024, 256) state/tile blocks (remote_compile HTTP 500; (512,
    256) and (1024, 128) both compile — bisected round 4), so BSRNN-L
    band shapes split into more tiles instead of failing outright."""
    Bt = min(_MAX_BATCH_TILE, (B + 7) // 8 * 8)
    if itemsize == 2:
        cap = max(8, ((1 << 17) // H) // 8 * 8)
        Bt = min(Bt, cap)
    return Bt


def _pallas_lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                      interpret: bool = False,
                      unroll: int | None = None) -> jnp.ndarray:
    T, B, G = x_proj.shape
    H = w_hh.shape[0]
    Bt = _batch_tile(B, H, x_proj.dtype.itemsize)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    k = (_choose_scan_unroll(Bt, H, x_proj.dtype.itemsize)
         if unroll is None else unroll)
    Tb = -(-T // k)
    T_pad = Tb * k
    if B_pad != B or T_pad != T:
        x_proj = jnp.pad(x_proj, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
    out = pl.pallas_call(
        _lstm_kernel_unrolled(k) if k > 1 else _lstm_kernel,
        grid=(nb, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k, Bt, H), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, H), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(x_proj, w_hh)
    return out[:T, :B, :]


def _lstm_kernel_stateful(k: int):
    """Unidirectional grid-scan kernel with CALLER initial state: at
    t == 0 the VMEM h/c scratch loads from the h0/c0 input tiles
    instead of zeros, and the cell-state trajectory is emitted
    alongside h so the streaming caller can snapshot the carry at any
    chunk boundary. Same unroll-k amortization as
    _lstm_kernel_unrolled (trailing time padding is computed-and-
    discarded, never feeding a real step)."""

    def kernel(xp_ref, whh_ref, h0_ref, c0_ref, hs_ref, cs_ref,
               h_scratch, c_scratch):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[...] = h0_ref[...].astype(jnp.float32)
            c_scratch[...] = c0_ref[...].astype(jnp.float32)

        h, c = h_scratch[...], c_scratch[...]
        H = h.shape[-1]
        whh = whh_ref[...]
        for i in range(k):
            gates = xp_ref[i] + _hdot(h, whh)
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H : 2 * H])
            gg = jnp.tanh(gates[:, 2 * H : 3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H :])
            c = fg * c + ig * gg
            h = og * jnp.tanh(c)
            hs_ref[i] = h.astype(hs_ref.dtype)
            cs_ref[i] = c.astype(cs_ref.dtype)
        h_scratch[...] = h
        c_scratch[...] = c

    return kernel


def _choose_scan_unroll_stateful(Bt: int, H: int, itemsize: int) -> int:
    if H % 128:  # same Mosaic guard as _choose_scan_unroll
        return 1
    for k in (32, 16, 8, 4, 2):
        # base budget + the extra double-buffered cs out tile + h0/c0
        extra = 2 * k * Bt * H * itemsize + 2 * Bt * H * itemsize
        if (_scan_vmem_bytes_unrolled(k, Bt, H, itemsize) + extra
                <= _FUSED_VMEM_BUDGET):
            return k
    return 1


def _pallas_lstm_scan_stateful(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                               h0: jnp.ndarray, c0: jnp.ndarray,
                               interpret: bool = False,
                               unroll: int | None = None):
    T, B, G = x_proj.shape
    H = w_hh.shape[0]
    Bt = _batch_tile(B, H, x_proj.dtype.itemsize)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    k = (_choose_scan_unroll_stateful(Bt, H, x_proj.dtype.itemsize)
         if unroll is None else unroll)
    Tb = -(-T // k)
    T_pad = Tb * k
    if T_pad != T or B_pad != B:
        x_proj = jnp.pad(x_proj, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
    if B_pad != B:
        h0 = jnp.pad(h0, ((0, B_pad - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, B_pad - B), (0, 0)))
    hs, cs = pl.pallas_call(
        _lstm_kernel_stateful(k),
        grid=(nb, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0)),
            pl.BlockSpec((Bt, H), lambda b, t: (b, 0)),
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
    )(x_proj, w_hh, h0, c0)
    return hs[:T, :B], cs[:T, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """(T, B, 4H), (H, 4H) -> (T, B, H); Pallas on TPU, XLA scan elsewhere."""
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_scan(x_proj, w_hh)
    return _pallas_lstm_scan(x_proj, w_hh)


def _fwd(x_proj, w_hh):
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_scan(x_proj, w_hh), (None, x_proj, w_hh)
    from .pallas_lstm_bwd import lstm_fwd_hc, residual_path_feasible

    if not residual_path_feasible(x_proj.shape[-1], w_hh.shape[0],
                                  x_proj.dtype.itemsize):
        return _xla_lstm_scan(x_proj, w_hh), (None, x_proj, w_hh)
    hs, cs = lstm_fwd_hc(x_proj, w_hh)
    return hs, ((hs, cs), x_proj, w_hh)


def _bwd(res, g):
    saved, x_proj, w_hh = res
    if saved is None:  # CPU: autodiff the XLA scan (recompute)
        _, vjp = jax.vjp(_xla_lstm_scan, x_proj, w_hh)
        return vjp(g)
    from .pallas_lstm_bwd import lstm_bwd

    hs, cs = saved
    return lstm_bwd(x_proj, hs, cs, g, w_hh)


lstm_scan.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused bidirectional scan: both directions share each sequential grid
# step (halves the kernel's sequential step count — the flagship BSRNN
# is latency-bound on exactly these steps)
# ---------------------------------------------------------------------------

def _xla_lstm_scan_bidir(xp_cat, w_stack):
    """Reference semantics of the fused kernel on (T, 2B, 4H).

    Rows [0:B] use w_stack[:H] (forward), rows [B:2B] use w_stack[H:]
    (the backward direction, whose inputs/outputs are time-flipped by
    the caller).
    """
    B2 = xp_cat.shape[1]
    B = B2 // 2
    H = w_stack.shape[1] // 4
    hs_f = _xla_lstm_scan(xp_cat[:, :B], w_stack[:H])
    hs_b = _xla_lstm_scan(xp_cat[:, B:], w_stack[H:])
    return jnp.concatenate([hs_f, hs_b], axis=1)


def _make_bidir_kernel(nrows_fwd: int, Bt: int):
    """Kernel closure: nrows_fwd is static at trace time.

    grid (nb, T), T innermost. Rows with global index < nrows_fwd are
    forward-direction; the blockdiag trick routes each row through its
    direction's W_hh in ONE matmul: hcat = [h*m | h*(1-m)] (Bt, 2H),
    gates = x + hcat @ [W_f; W_b].
    """

    def kernel(xp_ref, wstack_ref, out_ref, h_scratch, c_scratch):
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[...] = jnp.zeros_like(h_scratch)
            c_scratch[...] = jnp.zeros_like(c_scratch)

        h = h_scratch[...]
        H = h.shape[1]
        rows = b * Bt + jax.lax.broadcasted_iota(jnp.int32, (Bt, 1), 0)
        m = (rows < nrows_fwd).astype(h.dtype)
        hcat = jnp.concatenate([h * m, h * (1.0 - m)], axis=1)
        gates = xp_ref[0] + _hdot(hcat, wstack_ref[...])
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_scratch[...] + i * g
        h = o * jnp.tanh(c)
        c_scratch[...] = c
        h_scratch[...] = h
        out_ref[0] = h.astype(out_ref.dtype)

    return kernel


_MAX_BIDIR_TILE = 1152  # 2x544 rows (BSRNN-M B=16) still one tile


def _pallas_lstm_scan_bidir(xp_cat, w_stack, nrows_fwd: int,
                            interpret: bool = False):
    T, B2, G = xp_cat.shape
    H = w_stack.shape[1] // 4
    Bt = min(_MAX_BIDIR_TILE, (B2 + 7) // 8 * 8)
    nb = -(-B2 // Bt)
    B_pad = nb * Bt
    if B_pad != B2:
        xp_cat = jnp.pad(xp_cat, ((0, 0), (0, B_pad - B2), (0, 0)))
    out = pl.pallas_call(
        _make_bidir_kernel(nrows_fwd, Bt),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((2 * H, G), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B_pad, H), xp_cat.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(xp_cat, w_stack)
    return out[:, :B2, :]


# ---------------------------------------------------------------------------
# dual-dot bidirectional scan: the blockdiag trick above fuses the two
# directions into ONE (2B, 2H) @ (2H, 4H) matmul — 2x the total FLOPs of
# running the directions separately, which measured SLOWER on v5e. This
# variant keeps the two directions' states in separate scratch and issues
# two (B, H) @ (H, 4H) dots per grid step: total matmul FLOPs identical
# to the unfused path, but the sequential grid is T steps instead of 2T
# and both directions share each step's DMA pipeline slot.
# ---------------------------------------------------------------------------


def _dualdot_kernel(xf_ref, xb_ref, wf_ref, wb_ref, of_ref, ob_ref,
                    hf_s, cf_s, hb_s, cb_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf_s[...] = jnp.zeros_like(hf_s)
        cf_s[...] = jnp.zeros_like(cf_s)
        hb_s[...] = jnp.zeros_like(hb_s)
        cb_s[...] = jnp.zeros_like(cb_s)

    H = hf_s.shape[-1]

    def cell(x_ref, w_ref, h_s, c_s, o_ref):
        gates = x_ref[0] + _hdot(h_s[...], w_ref[...])
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_s[...] + i * g
        h = o * jnp.tanh(c)
        c_s[...] = c
        h_s[...] = h
        o_ref[0] = h.astype(o_ref.dtype)

    cell(xf_ref, wf_ref, hf_s, cf_s, of_ref)
    cell(xb_ref, wb_ref, hb_s, cb_s, ob_ref)


def _xla_lstm_scan_bidir2(xp_f, xp_b, w_f, w_b):
    return _xla_lstm_scan(xp_f, w_f), _xla_lstm_scan(xp_b, w_b)


def _pallas_lstm_scan_bidir2(xp_f, xp_b, w_f, w_b, interpret=False):
    T, B, G = xp_f.shape
    H = w_f.shape[0]
    Bt = _batch_tile(B, H, xp_f.dtype.itemsize)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    if B_pad != B:
        pad = ((0, 0), (0, B_pad - B), (0, 0))
        xp_f = jnp.pad(xp_f, pad)
        xp_b = jnp.pad(xp_b, pad)
    hs_f, hs_b = pl.pallas_call(
        _dualdot_kernel,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, Bt, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H), xp_f.dtype),
            jax.ShapeDtypeStruct((T, B_pad, H), xp_b.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(xp_f, xp_b, w_f, w_b)
    return hs_f[:, :B], hs_b[:, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_scan_bidir2(xp_f, xp_b, w_f, w_b):
    """Dual-dot fused two-direction scan.

    (T, B, 4H) x2 + (H, 4H) x2 -> ((T, B, H), (T, B, H)). xp_b and the
    returned hs_b are in the backward direction's own (time-flipped)
    order; the caller flips. Matmul FLOPs match two independent scans;
    sequential steps are halved.
    """
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_scan_bidir2(xp_f, xp_b, w_f, w_b)
    return _pallas_lstm_scan_bidir2(xp_f, xp_b, w_f, w_b)


def _bidir2_fwd(xp_f, xp_b, w_f, w_b):
    return lstm_scan_bidir2(xp_f, xp_b, w_f, w_b), (xp_f, xp_b, w_f, w_b)


def _bidir2_bwd(res, g):
    xp_f, xp_b, w_f, w_b = res
    from .pallas_lstm_bwd import residual_path_feasible

    if (jax.default_backend() == "cpu" or pltpu is None
            or not residual_path_feasible(xp_f.shape[-1], w_f.shape[0],
                                          xp_f.dtype.itemsize)):
        _, vjp = jax.vjp(_xla_lstm_scan_bidir2, xp_f, xp_b, w_f, w_b)
        return vjp(g)
    # TPU: recompute each direction's (hs, cs) with the Pallas forward and
    # run the Pallas backward kernel — same path lstm_scan's vjp uses.
    from .pallas_lstm_bwd import lstm_bwd, lstm_fwd_hc

    g_f, g_b = g
    hs_f, cs_f = lstm_fwd_hc(xp_f, w_f)
    hs_b, cs_b = lstm_fwd_hc(xp_b, w_b)
    dxf, dwf = lstm_bwd(xp_f, hs_f, cs_f, g_f, w_f)
    dxb, dwb = lstm_bwd(xp_b, hs_b, cs_b, g_b, w_b)
    return dxf, dxb, dwf, dwb


lstm_scan_bidir2.defvjp(_bidir2_fwd, _bidir2_bwd)


# ---------------------------------------------------------------------------
# fused-projection bidirectional scan: the input projection x @ W_ih is
# computed INSIDE the kernel, per grid step, for both directions. On-chip
# measurement (scripts/bench_lstm_kernel.py) shows the standalone scan is
# HBM-bound streaming the precomputed x_proj (T, B, 4H) — 4x the traffic
# of x itself (T, B, C) at C = H. Fusing the projection removes the
# x_proj HBM round-trip AND the jnp.flip read/writes (the backward
# direction's tiles are addressed with a reversed index map), at the
# cost of one extra (B, C) @ (C, 4H) dot per step — which the MXU
# overlaps with the recurrence dot. Everything accumulates in f32; bf16
# inputs (engine compute_dtype) halve the remaining stream.
# ---------------------------------------------------------------------------


def _fused_kernel():
    def kernel(xf_ref, xb_ref, wif_ref, wib_ref, bf_ref, bb_ref,
               whf_ref, whb_ref, of_ref, ob_ref, hf_s, cf_s, hb_s, cb_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_s[...] = jnp.zeros_like(hf_s)
            cf_s[...] = jnp.zeros_like(cf_s)
            hb_s[...] = jnp.zeros_like(hb_s)
            cb_s[...] = jnp.zeros_like(cb_s)

        H = hf_s.shape[-1]

        def cell(x_ref, wi_ref, b_ref, wh_ref, h_s, c_s, o_ref):
            gates = (jnp.dot(x_ref[0], wi_ref[...],
                             preferred_element_type=jnp.float32)
                     + _hdot(h_s[...], wh_ref[...])
                     + b_ref[0])
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c = f * c_s[...] + i * g
            h = o * jnp.tanh(c)
            c_s[...] = c
            h_s[...] = h
            o_ref[0] = h.astype(o_ref.dtype)

        cell(xf_ref, wif_ref, bf_ref, whf_ref, hf_s, cf_s, of_ref)
        cell(xb_ref, wib_ref, bb_ref, whb_ref, hb_s, cb_s, ob_ref)

    return kernel


def _fused_kernel_unrolled(k: int, t_real: int, tb: int):
    """Fused bidirectional kernel processing k time steps per grid step.

    Per-grid-step fixed cost (DMA sync, Mosaic dispatch) dominates the
    recurrence: at H=128 the per-step cell math is ~0.1 us of MXU work
    against ~2.4 us wall (PERF.md roofline). Unrolling k micro-steps
    inside one grid step amortizes that overhead k-fold; the input/out
    tiles grow k-fold (VMEM-budgeted by _choose_fused_unroll) while
    total HBM traffic is unchanged.

    The time axis is padded to a multiple of k. Forward pad steps only
    produce out-rows >= t_real, which the caller slices off. The
    backward direction meets the pad block FIRST (reversed index map),
    so its state updates are masked to valid steps; masked rows write
    the un-updated state (zeros) into sliced-off positions.
    """

    def kernel(xf_ref, xb_ref, wif_ref, wib_ref, bf_ref, bb_ref,
               whf_ref, whb_ref, of_ref, ob_ref, hf_s, cf_s, hb_s, cb_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_s[...] = jnp.zeros_like(hf_s)
            cf_s[...] = jnp.zeros_like(cf_s)
            hb_s[...] = jnp.zeros_like(hb_s)
            cb_s[...] = jnp.zeros_like(cb_s)

        H = hf_s.shape[-1]

        def gates_to_hc(gates, c_prev):
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c = f * c_prev + i * g
            return o * jnp.tanh(c), c

        # Note: hoisting all k input projections into one batched
        # (k*Bt, C) @ (C, 4H) dot per direction was tried and measured
        # NO faster on v5e (the x-proj dot is off the critical path
        # either way; the wall is the dependent h @ W_hh + VPU chain)
        # while its live (k*Bt, 4H) f32 temporaries cost enough VMEM to
        # shrink the feasible k. Per-micro-step dots keep k maximal.

        # forward: micro-steps ascend within the block
        h, c = hf_s[...], cf_s[...]
        wif, whf, bf = wif_ref[...], whf_ref[...], bf_ref[0]
        for i in range(k):
            gates = (jnp.dot(xf_ref[i], wif, preferred_element_type=jnp.float32)
                     + _hdot(h, whf)
                     + bf)
            h, c = gates_to_hc(gates, c)
            of_ref[i] = h.astype(of_ref.dtype)
        hf_s[...] = h
        cf_s[...] = c

        # backward: this grid step holds original times
        # [blk*k, blk*k + k) with blk descending; micro-steps descend
        blk = tb - 1 - t
        h, c = hb_s[...], cb_s[...]
        wib, whb, bb = wib_ref[...], whb_ref[...], bb_ref[0]
        for i in range(k - 1, -1, -1):
            gates = (jnp.dot(xb_ref[i], wib, preferred_element_type=jnp.float32)
                     + _hdot(h, whb)
                     + bb)
            h2, c2 = gates_to_hc(gates, c)
            valid = blk * k + i < t_real
            h = jnp.where(valid, h2, h)
            c = jnp.where(valid, c2, c)
            ob_ref[i] = h.astype(ob_ref.dtype)
        hb_s[...] = h
        cb_s[...] = c

    return kernel


def _fused_vmem_bytes_unrolled(k: int, Bt: int, C: int, H: int,
                               itemsize: int) -> int:
    weights = 2 * (C * 4 * H + H * 4 * H + 4 * H) * itemsize
    tiles = 2 * 2 * (k * Bt * C + k * Bt * H) * itemsize
    state = 4 * Bt * H * 4
    return weights + tiles + state


def _choose_fused_unroll(Bt: int, C: int, H: int, itemsize: int) -> int:
    if H % 128 or C % 128:  # sub-lane-width blocks crash the TPU
        return 1            # compiler (observed: BSRNN-S H=64)
    for k in (32, 16, 8, 4, 2):
        if _fused_vmem_bytes_unrolled(k, Bt, C, H, itemsize) <= _FUSED_VMEM_BUDGET:
            return k
    return 1


def _pallas_lstm_fused_unrolled(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b,
                                k: int, interpret: bool = False):
    B, T, C = x.shape
    H = w_hh_f.shape[0]
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, C) time-major tiles
    Bt = _batch_tile(B, H, x.dtype.itemsize)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    Tb = -(-T // k)
    T_pad = Tb * k
    if B_pad != B or T_pad != T:
        xt = jnp.pad(xt, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
    b2_f = b_f.reshape(1, -1)
    b2_b = b_b.reshape(1, -1)
    Tbm1 = Tb - 1
    hs_f, hs_b = pl.pallas_call(
        _fused_kernel_unrolled(k, T, Tb),
        grid=(nb, Tb),
        in_specs=[
            pl.BlockSpec((k, Bt, C), lambda b, t: (t, b, 0)),
            pl.BlockSpec((k, Bt, C), lambda b, t: (Tbm1 - t, b, 0)),
            pl.BlockSpec((C, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((k, Bt, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((k, Bt, H), lambda b, t: (Tbm1 - t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad, H), x.dtype),
            jax.ShapeDtypeStruct((T_pad, B_pad, H), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(xt, xt, w_ih_f, w_ih_b, b2_f, b2_b, w_hh_f, w_hh_b)
    # hs_b comes out already unflipped (reversed out index map)
    out = jnp.concatenate([hs_f[:T, :B], hs_b[:T, :B]], axis=-1)
    return jnp.swapaxes(out, 0, 1)


def _xla_lstm_fused_ref(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b):
    """Reference semantics: (B, T, C) -> (B, T, 2H) torch-BiLSTM order."""
    xg_f = jnp.swapaxes(x @ w_ih_f + b_f, 0, 1)
    xg_b = jnp.swapaxes(jnp.flip(x, axis=1) @ w_ih_b + b_b, 0, 1)
    hs_f = jnp.swapaxes(_xla_lstm_scan(xg_f.astype(jnp.float32),
                                       w_hh_f.astype(jnp.float32)), 0, 1)
    hs_b = jnp.swapaxes(_xla_lstm_scan(xg_b.astype(jnp.float32),
                                       w_hh_b.astype(jnp.float32)), 0, 1)
    out = jnp.concatenate([hs_f, jnp.flip(hs_b, axis=1)], axis=-1)
    return out.astype(x.dtype)


# VMEM budget guard: weights + double-buffered x/out tiles + f32 state
# must fit in ~12 of the 16 MB. Models whose (C, H) exceed it (e.g. the
# HD-Demucs H=768 bottleneck BLSTM: 38 MB of f32 weights) fall through
# a tiered fallback — dual-dot kernel (only the two W_hh resident),
# then per-direction kernels (one W_hh), then the pure XLA scan.
_FUSED_VMEM_BUDGET = 12 * 1024 * 1024


def _fused_vmem_bytes(Bt: int, C: int, H: int, itemsize: int) -> int:
    weights = 2 * (C * 4 * H + H * 4 * H + 4 * H) * itemsize
    tiles = 2 * 2 * (Bt * C + Bt * H) * itemsize  # 2 dirs x double buffer
    state = 4 * Bt * H * 4
    return weights + tiles + state


def _bidir2_vmem_bytes(Bt: int, H: int, itemsize: int) -> int:
    weights = 2 * H * 4 * H * itemsize
    tiles = 2 * 2 * (Bt * 4 * H + Bt * H) * itemsize  # 2 dirs x double buffer
    state = 4 * Bt * H * 4
    return weights + tiles + state


def _scan_vmem_bytes(Bt: int, H: int, itemsize: int) -> int:
    weights = H * 4 * H * itemsize
    tiles = 2 * (Bt * 4 * H + Bt * H) * itemsize
    state = 2 * Bt * H * 4
    return weights + tiles + state


def _pallas_lstm_fused(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b,
                       interpret=False):
    B, T, C = x.shape
    H = w_hh_f.shape[0]
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, C) time-major tiles
    Bt = _batch_tile(B, H, x.dtype.itemsize)
    nb = -(-B // Bt)
    B_pad = nb * Bt
    if B_pad != B:
        xt = jnp.pad(xt, ((0, 0), (0, B_pad - B), (0, 0)))
    b2_f = b_f.reshape(1, -1)
    b2_b = b_b.reshape(1, -1)
    Tm1 = T - 1
    hs_f, hs_b = pl.pallas_call(
        _fused_kernel(),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, Bt, C), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, Bt, C), lambda b, t: (Tm1 - t, b, 0)),
            pl.BlockSpec((C, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((C, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, Bt, H), lambda b, t: (Tm1 - t, b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B_pad, H), x.dtype),
            jax.ShapeDtypeStruct((T, B_pad, H), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
    )(xt, xt, w_ih_f, w_ih_b, b2_f, b2_b, w_hh_f, w_hh_b)
    # hs_b comes out already unflipped (reversed out index map)
    out = jnp.concatenate([hs_f[:, :B], hs_b[:, :B]], axis=-1)
    return jnp.swapaxes(out, 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_scan_fused(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b):
    """(B, T, C) -> (B, T, 2H) fused-projection bidirectional LSTM."""
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_fused_ref(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
    B, T, C = x.shape
    H = w_hh_f.shape[0]
    Bt = _batch_tile(B, H, x.dtype.itemsize)
    it = x.dtype.itemsize
    if _fused_vmem_bytes(Bt, C, H, it) <= _FUSED_VMEM_BUDGET:
        k = _choose_fused_unroll(Bt, C, H, it)
        if k > 1:
            return _pallas_lstm_fused_unrolled(
                x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b, k)
        return _pallas_lstm_fused(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
    # Weights too large for the fused kernel: precompute x_proj in XLA
    # (one MXU matmul per direction) and keep the recurrence in Pallas,
    # sharing each sequential step between directions when both W_hh fit.
    xg_f = jnp.swapaxes(x @ w_ih_f + b_f, 0, 1)  # (T, B, 4H)
    xg_b = jnp.swapaxes(jnp.flip(x, axis=1) @ w_ih_b + b_b, 0, 1)
    if _bidir2_vmem_bytes(Bt, H, it) <= _FUSED_VMEM_BUDGET:
        hs_f, hs_b = lstm_scan_bidir2(xg_f, xg_b, w_hh_f, w_hh_b)
    elif _scan_vmem_bytes(Bt, H, it) <= _FUSED_VMEM_BUDGET:
        hs_f = lstm_scan(xg_f, w_hh_f)
        hs_b = lstm_scan(xg_b, w_hh_b)
    else:  # W_hh alone exceeds VMEM: pure XLA scan
        return _xla_lstm_fused_ref(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
    out = jnp.concatenate(
        [jnp.swapaxes(hs_f, 0, 1), jnp.flip(jnp.swapaxes(hs_b, 0, 1), axis=1)],
        axis=-1,
    )
    return out.astype(x.dtype)


def _fused_fwd(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b):
    # Under differentiation the fused kernel is the WRONG forward: its
    # residuals (hidden/cell states) stay in VMEM, so a recompute-based
    # backward would pay the whole bidirectional scan twice (measured:
    # the flagship GAN train step went 205 -> 450 ms when this path
    # recomputed). Instead run the residual-saving decomposition —
    # projection matmuls + lstm_fwd_hc per direction — exactly the
    # round-2 training path, and keep the fused kernel for primal-only
    # (inference) calls where custom_vjp never invokes this rule.
    from .pallas_lstm_bwd import residual_path_feasible

    H = w_hh_f.shape[0]
    if (jax.default_backend() == "cpu" or pltpu is None
            or not residual_path_feasible(4 * H, H, x.dtype.itemsize)):
        out = _xla_lstm_fused_ref(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
        return out, (None, x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
    out, saved = _fused_fwd_saving(x, w_ih_f, w_ih_b, b_f, b_b,
                                   w_hh_f, w_hh_b)
    return out, (saved, x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)


def _fused_fwd_saving(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b,
                      interpret: bool = False):
    """Residual-saving bidirectional forward (Pallas fwd_hc kernels)."""
    from .pallas_lstm_bwd import lstm_fwd_hc

    xg_f = jnp.swapaxes(x @ w_ih_f + b_f, 0, 1)                 # (T, B, 4H)
    xg_b = jnp.swapaxes(jnp.flip(x, axis=1) @ w_ih_b + b_b, 0, 1)
    hs_f, cs_f = lstm_fwd_hc(xg_f, w_hh_f, interpret=interpret)
    hs_b, cs_b = lstm_fwd_hc(xg_b, w_hh_b, interpret=interpret)
    out = jnp.concatenate(
        [jnp.swapaxes(hs_f, 0, 1), jnp.flip(jnp.swapaxes(hs_b, 0, 1), axis=1)],
        axis=-1,
    ).astype(x.dtype)
    return out, (xg_f, xg_b, hs_f, cs_f, hs_b, cs_b)


def _fused_bwd(res, g):
    saved, x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b = res
    if saved is None:  # CPU: autodiff the XLA composition (recompute)
        _, vjp = jax.vjp(_xla_lstm_fused_ref,
                         x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
        return vjp(g)
    return _fused_bwd_saved(saved, x, w_ih_f, w_ih_b, b_f, b_b,
                            w_hh_f, w_hh_b, g)


def _fused_bwd_saved(saved, x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b, g,
                     interpret: bool = False):
    from .pallas_lstm_bwd import lstm_bwd

    xg_f, xg_b, hs_f, cs_f, hs_b, cs_b = saved
    H = w_hh_f.shape[0]
    g_f = jnp.swapaxes(g[..., :H], 0, 1)                        # (T, B, H)
    g_b = jnp.swapaxes(jnp.flip(g[..., H:], axis=1), 0, 1)
    dxg_f, dw_hh_f = lstm_bwd(xg_f, hs_f, cs_f, g_f, w_hh_f,
                              interpret=interpret)
    dxg_b, dw_hh_b = lstm_bwd(xg_b, hs_b, cs_b, g_b, w_hh_b,
                              interpret=interpret)
    dxg_f_bm = jnp.swapaxes(dxg_f, 0, 1)                        # (B, T, 4H)
    dxg_b_bm = jnp.swapaxes(dxg_b, 0, 1)
    x_flip = jnp.flip(x, axis=1)
    dx = (dxg_f_bm @ w_ih_f.T
          + jnp.flip(dxg_b_bm @ w_ih_b.T, axis=1)).astype(x.dtype)
    dw_ih_f = jnp.einsum("btc,btg->cg", x, dxg_f_bm).astype(w_ih_f.dtype)
    dw_ih_b = jnp.einsum("btc,btg->cg", x_flip, dxg_b_bm).astype(w_ih_b.dtype)
    db_f = jnp.sum(dxg_f, axis=(0, 1)).astype(b_f.dtype)
    db_b = jnp.sum(dxg_b, axis=(0, 1)).astype(b_b.dtype)
    return (dx, dw_ih_f, dw_ih_b, db_f, db_b,
            dw_hh_f.astype(w_hh_f.dtype), dw_hh_b.astype(w_hh_b.dtype))


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_scan_bidir(xp_cat: jnp.ndarray, w_stack: jnp.ndarray) -> jnp.ndarray:
    """(T, 2B, 4H), (2H, 4H) -> (T, 2B, H) fused two-direction scan.

    Caller stacks forward rows then (time-flipped) backward rows and
    splits/unflips the result (see layers.LSTM).
    """
    B = xp_cat.shape[1] // 2
    if jax.default_backend() == "cpu" or pltpu is None:
        return _xla_lstm_scan_bidir(xp_cat, w_stack)
    return _pallas_lstm_scan_bidir(xp_cat, w_stack, B)


def _bidir_fwd(xp_cat, w_stack):
    return lstm_scan_bidir(xp_cat, w_stack), (xp_cat, w_stack)


def _bidir_bwd(res, g):
    xp_cat, w_stack = res
    _, vjp = jax.vjp(_xla_lstm_scan_bidir, xp_cat, w_stack)
    return vjp(g)


lstm_scan_bidir.defvjp(_bidir_fwd, _bidir_bwd)
