"""Flax layer library with torch-matching semantics.

Building blocks for the generator/discriminator zoo. Semantics (shapes,
padding, weight-norm parameterisation, default inits) re-derived from the
reference's torch usage so that (a) parameter counts match the paper
table (SURVEY.md §6) and (b) pretrained torch checkpoints can be imported
for parity validation.

Layout: all layers operate channels-last (B, T, C) / (B, H, W, C) — the
XLA:TPU-preferred layout (C on the 128-lane minor dimension). Models
transpose once at their boundary from the reference's (B, C, T) contract.

Key torch semantics implemented:
  * Conv1d/2d: symmetric zero padding, dilation, groups
    (reference Models/hifigan.py:24-39, Models/models.py:20-61).
  * ConvTranspose1d/2d: out_len = (T-1)*stride - 2*pad + k, via
    lhs-dilated conv with flipped kernel (Models/hifigan.py:93-96).
  * weight_norm: w = g * v / ||v||, norms taken over all dims except
    dim 0 of the torch weight (out-channels for Conv, in-channels for
    ConvTranspose); g initialised to ||v|| at init time.
  * spectral_norm: one power iteration per call, u persisted in the
    'spectral' variable collection (Models/models.py:221).
  * LSTM: torch gate order (i, f, g, o), uniform(-1/sqrt(H), 1/sqrt(H))
    init, optional bidirectional — time-major lax.scan with the input
    projection hoisted into one large MXU matmul (Models/bsrnn.py:23).
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels (reference utils.py:47-48)."""
    return (kernel_size * dilation - dilation) // 2


def torch_conv_init(fan_in: int):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float = 0.01):
    """init_weights from the reference (utils.py:35-38): N(0, std).

    Only meaningful on NON-weight-normed convs: the reference applies
    init_weights after weight_norm(), which in torch mutates the stale
    computed weight tensor and leaves weight_v/weight_g untouched — a
    no-op. Weight-normed convs here keep the torch default init."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def _norm_except_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    axes = tuple(i for i in range(v.ndim) if i != axis)
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


def fold_weight_norm(params):
    """Fold every weight-norm (v, g) pair into a plain 'kernel'.

    The `remove_weight_norm` contract of the reference
    (Models/hifigan.py:126-133, called before decoding in every
    inference script, e.g. infers/inference_bsrnn.py:60-63): at
    inference the g·v/‖v‖ recompute is dead weight, so the folded
    kernel w = g·v/‖v‖ replaces the pair. The conv layers detect the
    folded parameter structure at apply time (has_variable('params',
    'kernel')) and skip the normalisation — outputs are bitwise the
    products of the same floats, so folded == unfolded to float
    rounding. Returns a NEW tree; inputs untouched. Spectral norm
    (MSD) is deliberately NOT folded: discriminators never run at
    inference, and folding would bake a power-iteration estimate into
    the weights.
    """
    def fold(node):
        if not isinstance(node, dict):
            return node
        if "v" in node and "g" in node and hasattr(node["v"], "ndim"):
            v, g = node["v"], node["g"]
            if getattr(g, "ndim", None) == v.ndim:
                # the norm axis is the one where g matches v (others are
                # broadcast 1s); for 1-channel convs g is all-ones and
                # any size-1 axis gives the identical full-tensor norm
                axis = next(
                    (i for i in range(v.ndim)
                     if g.shape[i] == v.shape[i]
                     and all(g.shape[j] == 1 for j in range(v.ndim) if j != i)),
                    None,
                )
                if axis is not None:
                    w = g * v / jnp.maximum(_norm_except_axis(v, axis), 1e-12)
                    rest = {k: fold(val) for k, val in node.items()
                            if k not in ("v", "g")}
                    return {"kernel": w, **rest}
                # g doesn't match the one-broadcast-axis weight-norm
                # pattern (e.g. an imported/hand-edited tree that merely
                # happens to hold 'v' and 'g' arrays) — not a weight-norm
                # pair; leave the node untouched rather than raising an
                # opaque StopIteration.
        return {k: fold(val) for k, val in node.items()}

    if hasattr(params, "unfreeze"):  # FrozenDict
        params = params.unfreeze()
    return fold(params)


def _wn_folded(mod: nn.Module) -> bool:
    """True when this layer is being applied with FOLDED params.

    Folded params (fold_weight_norm) carry 'kernel' where the module
    would otherwise declare ('v', 'g'); detecting the structure at apply
    time keeps the fold a pure parameter transform — no module flags, no
    global state, training paths untouched. During init nothing exists
    yet, so the unfolded parameterisation is always created.
    """
    return (not mod.is_initializing()) and mod.has_variable("params", "kernel")


class Conv1d(nn.Module):
    """torch.nn.Conv1d semantics on (B, T, C) inputs.

    use_weight_norm reparameterises the kernel as g * v/||v|| (per
    out-channel), matching torch.nn.utils.weight_norm(Conv1d) — used on
    nearly every conv in the reference models.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, cin, cout, g = self.kernel_size, self.in_channels, self.out_channels, self.groups
        fan_in = (cin // g) * k
        kinit = self.kernel_init or torch_conv_init(fan_in)
        # kernel layout (k, cin/groups, cout) == flax 'WIO'
        kshape = (k, cin // g, cout)
        if self.use_weight_norm and not _wn_folded(self):
            v = self.param("v", kinit, kshape)
            gscale = self.param(
                "g", lambda rng, shape: _norm_except_axis(v, axis=2).reshape(shape), (1, 1, cout)
            )
            kernel = gscale * v / jnp.maximum(_norm_except_axis(v, axis=2), 1e-12)
        else:
            kernel = self.param("kernel", kinit, kshape)

        # lax.conv requires matching operand dtypes; under mixed
        # precision the input may arrive f32 (e.g. after f32 DSP ops)
        # while params are bf16, or vice versa — follow the params
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init or torch_conv_init(fan_in), (cout,))
            y = y + bias
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d semantics on (B, T, C) inputs.

    out_len = (T-1)*stride - 2*padding + kernel_size. Implemented as an
    lhs-dilated convolution with a spatially flipped kernel. Weight norm
    normalises per *input* channel (torch weight_norm dim=0 on the
    (in, out, k) weight) — matters for importing torch checkpoints.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    # polyphase=True computes the transposed conv as ONE stride-1 conv
    # with ceil(k/s) taps and s*cout output channels, then interleaves
    # the s phases (subpixel layout) — float-identical, but the MXU
    # never multiplies the lhs-dilation zeros (s x fewer effective
    # MACs when XLA lowers input dilation literally). dilation==1 only.
    # None = follow the NVSE_POLYPHASE_CT env default (A/B switch).
    polyphase: bool | None = None

    def _use_polyphase(self) -> bool:
        if self.polyphase is not None:
            return self.polyphase
        import os
        return os.environ.get("NVSE_POLYPHASE_CT", "0") == "1"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, cin, cout = self.kernel_size, self.in_channels, self.out_channels
        # torch ConvTranspose default init uses fan_in = out_channels * k
        fan_in = cout * k
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kshape = (k, cin, cout)  # (spatial, in, out)
        if self.use_weight_norm and not _wn_folded(self):
            v = self.param("v", kinit, kshape)
            gscale = self.param(
                "g", lambda rng, shape: _norm_except_axis(v, axis=1).reshape(shape), (1, cin, 1)
            )
            kernel = gscale * v / jnp.maximum(_norm_except_axis(v, axis=1), 1e-12)
        else:
            kernel = self.param("kernel", kinit, kshape)

        if self._use_polyphase() and self.dilation == 1 and self.stride > 1:
            s = self.stride
            ku = -(-k // s)
            B, T, _ = x.shape
            x = x.astype(kernel.dtype)
            # phase r, tap u reads W[r + s*u]: pad taps to s*ku, fold to
            # (ku, s, cin, cout), flip tap axis for the correlation
            Wp = jnp.pad(kernel, ((0, s * ku - k), (0, 0), (0, 0)))
            Wp = jnp.flip(Wp.reshape(ku, s, cin, cout), axis=0)
            Kp = jnp.transpose(Wp, (0, 2, 1, 3)).reshape(ku, cin, s * cout)
            E = ku - 1  # right zero-pad so the tail phases are produced
            y = jax.lax.conv_general_dilated(
                x, Kp, window_strides=(1,), padding=[(ku - 1, E)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )                                        # (B, T+E, s*cout)
            f = y.reshape(B, (T + E) * s, cout)      # interleave phases
            out_len = (T - 1) * s - 2 * self.padding + k
            y = f[:, self.padding : self.padding + out_len]
            if self.use_bias:
                bias = self.param(
                    "bias", self.bias_init or torch_conv_init(fan_in), (cout,))
                y = y + bias
            return y

        eff_k = self.dilation * (k - 1) + 1
        pad = eff_k - 1 - self.padding
        # lax.conv requires matching operand dtypes; under mixed
        # precision the input may arrive f32 (e.g. after f32 DSP ops)
        # while params are bf16, or vice versa — follow the params
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init or torch_conv_init(fan_in), (cout,))
            y = y + bias
        return y


class Conv2d(nn.Module):
    """torch.nn.Conv2d semantics on (B, H, W, C) inputs."""

    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dilation: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: Callable | None = None
    # register this module's params (same names/shapes/checkpoint
    # layout) and return (kernel, bias) WITHOUT convolving, so a parent
    # can fuse several same-shaped convs over one input into a single
    # wider GEMM (see gcrn.GluConv2d)
    return_params: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kh, kw = self.kernel_size
        cin, cout, g = self.in_channels, self.out_channels, self.groups
        fan_in = (cin // g) * kh * kw
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kshape = (kh, kw, cin // g, cout)
        if self.use_weight_norm and not _wn_folded(self):
            v = self.param("v", kinit, kshape)
            gscale = self.param(
                "g", lambda rng, shape: _norm_except_axis(v, axis=3).reshape(shape), (1, 1, 1, cout)
            )
            kernel = gscale * v / jnp.maximum(_norm_except_axis(v, axis=3), 1e-12)
        else:
            kernel = self.param("kernel", kinit, kshape)
        if self.return_params:
            bias = self.param("bias", torch_conv_init(fan_in), (cout,)) \
                if self.use_bias else None
            return kernel, bias

        # lax.conv requires matching operand dtypes; under mixed
        # precision the input may arrive f32 (e.g. after f32 DSP ops)
        # while params are bf16, or vice versa — follow the params
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (cout,))
            y = y + bias
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d semantics on (B, H, W, C) inputs."""

    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: Callable | None = None
    return_params: bool = False  # see Conv2d.return_params

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kh, kw = self.kernel_size
        cin, cout = self.in_channels, self.out_channels
        fan_in = cout * kh * kw
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kshape = (kh, kw, cin, cout)
        if self.use_weight_norm and not _wn_folded(self):
            v = self.param("v", kinit, kshape)
            gscale = self.param(
                "g", lambda rng, shape: _norm_except_axis(v, axis=2).reshape(shape), (1, 1, cin, 1)
            )
            kernel = gscale * v / jnp.maximum(_norm_except_axis(v, axis=2), 1e-12)
        else:
            kernel = self.param("kernel", kinit, kshape)
        if self.return_params:
            bias = self.param("bias", torch_conv_init(fan_in), (cout,)) \
                if self.use_bias else None
            return kernel, bias

        pads = [(kh - 1 - self.padding[0],) * 2, (kw - 1 - self.padding[1],) * 2]
        # lax.conv requires matching operand dtypes; under mixed
        # precision the input may arrive f32 (e.g. after f32 DSP ops)
        # while params are bf16, or vice versa — follow the params
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(jnp.flip(kernel, axis=0), axis=1),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (cout,))
            y = y + bias
        return y


class SNConv1d(nn.Module):
    """Spectrally normalised Conv1d (one power iteration per call).

    Matches torch.nn.utils.spectral_norm on Conv1d: the weight matrix is
    reshaped to (out, in/groups * k) and divided by its top singular
    value, estimated with persistent power iteration (the 'spectral'
    variable collection holds u). Used by the first MSD discriminator
    (reference Models/models.py:221).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = True) -> jnp.ndarray:
        k, cin, cout, g = self.kernel_size, self.in_channels, self.out_channels, self.groups
        fan_in = (cin // g) * k
        kernel = self.param("kernel", torch_conv_init(fan_in), (k, cin // g, cout))

        w = kernel.transpose(2, 1, 0).reshape(cout, -1)  # (out, in/g * k) torch order
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(self.make_rng("params"), (cout,))
        )
        # power iteration always in f32 (norm estimates drift in bf16);
        # sigma is cast back so a bf16 kernel stays bf16 — otherwise the
        # f32 u state silently promoted the whole branch to f32 under
        # mixed precision
        w32 = w.astype(jnp.float32)
        u = u_var.value
        # the power-iteration vectors are buffers (torch runs the
        # iteration under no_grad) but sigma = u^T W v is a live
        # function of the weight: torch backprops d(W/sigma)/dW through
        # the quotient, which is what keeps the spectral norm pinned
        # near 1 during training — so only u/v are stop_gradiented here
        sg = jax.lax.stop_gradient
        v = sg(w32).T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = sg(w32) @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = sg(u_new) @ w32 @ sg(v)
        if update_stats and not self.is_initializing():
            u_var.value = sg(u_new)
        kernel = kernel / sigma.astype(kernel.dtype)

        # lax.conv requires matching operand dtypes; under mixed
        # precision the input may arrive f32 (e.g. after f32 DSP ops)
        # while params are bf16, or vice versa — follow the params
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (cout,))
            y = y + bias
        return y


class Linear(nn.Module):
    """torch.nn.Linear semantics (U(±1/sqrt(fan_in)) init by default)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        default = torch_conv_init(self.in_features)
        w = self.param("kernel", self.kernel_init or default,
                       (self.in_features, self.out_features))
        # follow the params' dtype (conv-layer convention): keeps mixed-
        # precision trunks in bf16 through the pointwise glue instead of
        # silently promoting every residual chain back to f32
        y = x.astype(w.dtype) @ w
        if self.use_bias:
            b = self.param("bias", self.bias_init or default, (self.out_features,))
            y = y + b
        return y


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the trailing dims (elementwise affine)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # stats always in f32 (bf16 mean/var wobbles at feature widths
        # >= 128); output follows the params' dtype so mixed-precision
        # trunks stay bf16 through the norm instead of promoting back
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y.astype(scale.dtype) * scale + bias


class LSTM(nn.Module):
    """Single-layer (bi)LSTM matching torch.nn.LSTM numerics.

    Input (B, T, C) -> output (B, T, H * (2 if bidirectional else 1)).

    TPU-first shape: the input projection x @ W_ih^T for ALL timesteps is
    one large matmul (MXU); the lax.scan carries only the (B, 4H) hidden
    matmul per step. Gate order (i, f, g, o) and U(±1/sqrt(H)) init match
    torch so checkpoints can be imported.
    """

    input_size: int
    hidden_size: int
    bidirectional: bool = False
    # return_params: define this module's parameters (keeping the child
    # name / checkpoint layout) but return them instead of scanning, so
    # a parent can batch several independent unidirectional scans into
    # one Pallas kernel (see gcrn.GLSTM: two group-LSTMs share each
    # sequential grid step via ops.pallas_lstm.lstm_scan_bidir2).
    return_params: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None,
                 return_state: bool = False, carry_idx: int | None = None):
        """Standard call: x (B, S, C) -> (B, S, H*dirs).

        Streaming decode (initial_state / return_state): the FORWARD
        direction starts from `initial_state` (h, c), each (B, H), and
        the returned state is its (h, c) snapshot after `carry_idx`
        steps (default S) — the exact recurrent state a subsequent
        chunk should resume from. The backward direction of a biLSTM
        always starts from zeros over the given window (its exact state
        would need the whole future); callers bound that error with a
        right-lookahead (engine.synthesize_streaming_stateful). Returns
        (y, state) when return_state.
        """
        H = self.hidden_size
        bound = 1.0 / math.sqrt(H)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        # bidirectional pairs run through the fused-projection kernel
        # (ops.pallas_lstm.lstm_scan_fused): the x @ W_ih projection is
        # computed inside the recurrence kernel per grid step, so the
        # (T, B, 4H) x_proj tensor — 4x the HBM traffic of x at C = H,
        # the measured bottleneck of the standalone scan — never exists,
        # and the backward direction's time flip is a reversed tile
        # index map instead of an HBM round-trip.
        from ..ops.pallas_lstm import lstm_scan, lstm_scan_fused

        def direction_params(name):
            w_ih = self.param(f"w_ih_{name}", uinit, (self.input_size, 4 * H))
            w_hh = self.param(f"w_hh_{name}", uinit, (H, 4 * H))
            b = self.param(f"b_ih_{name}", uinit, (4 * H,)) + self.param(
                f"b_hh_{name}", uinit, (4 * H,)
            )
            return w_ih, w_hh, b

        w_ih_f, w_hh_f, b_f = direction_params("fwd")
        if self.return_params:
            assert not self.bidirectional
            return w_ih_f, w_hh_f, b_f
        # follow the params' dtype (same convention as the conv layers):
        # under mixed precision the upstream f32 DSP/residual glue would
        # otherwise promote the whole recurrence back to f32 — the scan
        # kernels take their compute dtype from x, and bf16 tiles halve
        # the per-grid-step DMA that bounds them (PROFILE_LSTM_STEP)
        x = x.astype(w_ih_f.dtype)

        if initial_state is not None or return_state:
            from ..ops.pallas_lstm import lstm_scan_stateful

            B, S, _ = x.shape
            if initial_state is None:
                h0 = jnp.zeros((B, H), x.dtype)
                c0 = h0
            else:
                h0 = initial_state[0].astype(x.dtype)
                c0 = initial_state[1].astype(x.dtype)
            xg_f = jnp.swapaxes(x @ w_ih_f + b_f, 0, 1)      # (S, B, 4H)
            hs_f, cs_f = lstm_scan_stateful(xg_f, w_hh_f, h0, c0)
            ci = S if carry_idx is None else int(carry_idx)
            state = (hs_f[ci - 1], cs_f[ci - 1])
            y = jnp.swapaxes(hs_f, 0, 1)
            if self.bidirectional:
                w_ih_b, w_hh_b, b_b = direction_params("bwd")
                xg_b = jnp.swapaxes(x @ w_ih_b + b_b, 0, 1)[::-1]
                hs_b, _ = lstm_scan_stateful(
                    xg_b, w_hh_b, jnp.zeros_like(h0), jnp.zeros_like(c0))
                y = jnp.concatenate([y, jnp.swapaxes(hs_b[::-1], 0, 1)], -1)
            return (y, state) if return_state else y

        if not self.bidirectional:
            xg_f = jnp.swapaxes(x @ w_ih_f + b_f, 0, 1)  # time-major
            return jnp.swapaxes(lstm_scan(xg_f, w_hh_f), 0, 1)

        w_ih_b, w_hh_b, b_b = direction_params("bwd")
        return lstm_scan_fused(x, w_ih_f, w_ih_b, b_f, b_b, w_hh_f, w_hh_b)
