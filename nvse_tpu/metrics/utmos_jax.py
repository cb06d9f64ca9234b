"""UTMOS MOS prediction on-device (JAX): wav2vec2-base + MOS head.

VERDICT r2 next #10: the torch scoring path (metrics/utmos_torch.py)
runs the wav2vec2 backbone on host CPU; this module runs the identical
computation as one jitted JAX function, so MOS prediction can ride the
TPU alongside decoding instead of serializing on the host.

Design: a pure function over a flat params dict (converted once from
the torch/lightning state dict by ``torch_to_jax_params``) rather than
a flax module — the parameter set is fixed by the public checkpoint,
there is no training, and a dict-driven forward keeps the torch-name ->
array mapping 1:1 auditable. Weight-norm on the positional conv is
folded at conversion (inference only). Numerical parity with the torch
implementation is pinned to ~1e-4 by tests/test_utmos_jax.py on random
weights.

Architecture (reference Metrics/utmos.py:54-157; layout documented in
metrics/utmos_torch.py): 7-layer strided conv extractor (GELU,
GroupNorm on layer 0), LN + 512->768 projection, grouped positional
conv (k=128, g=16, SamePad trim), 12 post-norm transformer layers
(12-head SDPA + 3072 GELU MLP), domain(3,128) + judge(3000,128)
embeddings broadcast over time, BiLSTM(1024 -> 512x2), MLP
1024->2048->1, score = mean_t * 2 + 3.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

SSL_DIM = 768
CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


# ---------------------------------------------------------------------------
# parameter conversion
# ---------------------------------------------------------------------------

def torch_to_jax_params(state_dict) -> dict:
    """torch UTMOSModel state dict (utmos_torch naming) -> numpy dict.

    Accepts tensors or numpy arrays; folds the pos-conv weight norm."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    p = dict(sd)
    g = sd["ssl_model.encoder.pos_conv.0.weight_g"]
    v = sd["ssl_model.encoder.pos_conv.0.weight_v"]
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True)).clip(1e-12)
    p["ssl_model.encoder.pos_conv.0.weight"] = g * v / norm
    return {k: jnp.asarray(v) for k, v in p.items()}


# ---------------------------------------------------------------------------
# building blocks (torch layouts kept: conv weights are (out, in, k))
# ---------------------------------------------------------------------------

def _conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    """x (B, C, T), w (O, I/g, K) — torch Conv1d semantics."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups)
    if b is not None:
        y = y + b[None, :, None]
    return y

def _ln(x, w, b, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default


def _extractor(p, wav):
    x = wav[:, None, :]  # (B, 1, L)
    for i, (_dim, k, stride) in enumerate(CONV_LAYERS):
        x = _conv1d(x, p[f"ssl_model.feature_extractor.conv_layers.{i}.0.weight"],
                    stride=stride)
        if i == 0:
            # GroupNorm(512, 512): per-channel normalization over time
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            x = (x - m) / jnp.sqrt(v + 1e-5)
            x = (x * p["ssl_model.feature_extractor.conv_layers.0.2.weight"][None, :, None]
                 + p["ssl_model.feature_extractor.conv_layers.0.2.bias"][None, :, None])
        x = _gelu(x)
    return jnp.swapaxes(x, 1, 2)  # (B, T, 512)


def _attention(p, pre, x, heads=12):
    B, T, D = x.shape
    hd = D // heads

    def proj(name):
        return x @ p[f"{pre}.{name}.weight"].T + p[f"{pre}.{name}.bias"]

    def split(t):
        return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(proj("q_proj")), split(proj("k_proj")), split(proj("v_proj"))
    att = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / jnp.sqrt(hd), axis=-1)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ p[f"{pre}.out_proj.weight"].T + p[f"{pre}.out_proj.bias"]


def _encoder(p, x):
    # grouped positional conv + SamePad trim (k even -> drop last)
    w = p["ssl_model.encoder.pos_conv.0.weight"]
    k = w.shape[-1]
    pc = _conv1d(jnp.swapaxes(x, 1, 2), w, p["ssl_model.encoder.pos_conv.0.bias"],
                 padding=k // 2, groups=16)
    if k % 2 == 0:
        pc = pc[..., :-1]
    x = x + jnp.swapaxes(_gelu(pc), 1, 2)
    x = _ln(x, p["ssl_model.encoder.layer_norm.weight"],
            p["ssl_model.encoder.layer_norm.bias"])
    for i in range(12):
        pre = f"ssl_model.encoder.layers.{i}"
        x = _ln(x + _attention(p, f"{pre}.self_attn", x),
                p[f"{pre}.self_attn_layer_norm.weight"],
                p[f"{pre}.self_attn_layer_norm.bias"])
        h = _gelu(x @ p[f"{pre}.fc1.weight"].T + p[f"{pre}.fc1.bias"])
        h = h @ p[f"{pre}.fc2.weight"].T + p[f"{pre}.fc2.bias"]
        x = _ln(x + h, p[f"{pre}.final_layer_norm.weight"],
                p[f"{pre}.final_layer_norm.bias"])
    return x


def _lstm_dir(x, w_ih, w_hh, b, reverse=False):
    """Single-direction LSTM over (B, T, I); torch gate order i,f,g,o."""
    B, T, _ = x.shape
    H = w_hh.shape[1]
    xs = x @ w_ih.T + b  # (B, T, 4H)
    if reverse:
        xs = xs[:, ::-1]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(xs, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    return hs[:, ::-1] if reverse else hs


def utmos_forward(p: dict, wav: jnp.ndarray, domain_id: int = 0,
                  judge_id: int = 288) -> jnp.ndarray:
    """wav (B, L) float32 @16 kHz -> MOS scores (B,). Jittable."""
    x = _extractor(p, wav)
    x = _ln(x, p["ssl_model.layer_norm.weight"], p["ssl_model.layer_norm.bias"])
    x = x @ p["ssl_model.post_extract_proj.weight"].T + p["ssl_model.post_extract_proj.bias"]
    x = _encoder(p, x)  # (B, T, 768)

    B, T, _ = x.shape
    dom = jnp.broadcast_to(p["domain_embedding.weight"][domain_id], (B, T, 128))
    jud = jnp.broadcast_to(p["judge_embedding.weight"][judge_id], (B, T, 128))
    x = jnp.concatenate([x, dom, jud], axis=-1)

    fwd = _lstm_dir(x, p["decoder_rnn.weight_ih_l0"], p["decoder_rnn.weight_hh_l0"],
                    p["decoder_rnn.bias_ih_l0"] + p["decoder_rnn.bias_hh_l0"])
    bwd = _lstm_dir(x, p["decoder_rnn.weight_ih_l0_reverse"],
                    p["decoder_rnn.weight_hh_l0_reverse"],
                    p["decoder_rnn.bias_ih_l0_reverse"] + p["decoder_rnn.bias_hh_l0_reverse"],
                    reverse=True)
    x = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T, 1024)

    h = jax.nn.relu(x @ p["net.0.weight"].T + p["net.0.bias"])
    out = h @ p["net.3.weight"].T + p["net.3.bias"]  # (B, T, 1)
    return out.mean(axis=1)[:, 0] * 2.0 + 3.0


def score_dir(deg_dir: str, ckpt_path: str, sr: int = 16000) -> tuple[float, float]:
    """Mean/std UTMOS over a wav dir, scored on the default JAX device
    (reference Metrics/utmos.py:24-52 contract)."""
    import os

    from ..data.audio_io import load_wav
    from .utmos_torch import load_utmos

    model = load_utmos(ckpt_path)
    params = torch_to_jax_params(model.state_dict())
    fn = jax.jit(utmos_forward)
    scores = []
    for name in sorted(os.listdir(deg_dir)):
        if not name.endswith(".wav"):
            continue
        audio = np.asarray(load_wav(os.path.join(deg_dir, name), sr), np.float32)
        scores.append(float(fn(params, jnp.asarray(audio)[None, :])[0]))
    if not scores:
        raise RuntimeError(f"no wav files in {deg_dir}")
    return float(np.mean(scores)), float(np.std(scores))
