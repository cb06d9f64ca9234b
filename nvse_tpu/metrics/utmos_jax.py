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


def _valid_frames(n_samples):
    """Wav sample count -> extractor output frame count (conv length
    recurrence; works on traced int scalars)."""
    L = n_samples
    for _dim, k, s in CONV_LAYERS:
        L = (L - k) // s + 1
    return L


def _extractor(p, wav, n_samples=None):
    """wav (B, 1, L) -> (B, T, 512).

    n_samples (traced scalar or None) marks how much of a zero-padded
    wav is real. Valid output frames are bit-identical to an unpadded
    run (the convs are VALID convs — a frame < T_valid never touches a
    padded sample); the only cross-time op, the layer-0 GroupNorm, gets
    masked statistics. Frames >= T_valid are garbage and must be masked
    by the caller.
    """
    x = wav[:, None, :]  # (B, 1, L)
    Lv = n_samples
    for i, (_dim, k, stride) in enumerate(CONV_LAYERS):
        x = _conv1d(x, p[f"ssl_model.feature_extractor.conv_layers.{i}.0.weight"],
                    stride=stride)
        if Lv is not None:
            Lv = (Lv - k) // stride + 1
        if i == 0:
            # GroupNorm(512, 512): per-channel normalization over time
            if Lv is None:
                m = x.mean(-1, keepdims=True)
                v = ((x - m) ** 2).mean(-1, keepdims=True)
            else:
                msk = (jnp.arange(x.shape[-1]) < Lv)[None, None, :]
                cnt = jnp.maximum(Lv, 1).astype(x.dtype)
                m = jnp.sum(x * msk, -1, keepdims=True) / cnt
                v = jnp.sum(jnp.square((x - m) * msk), -1, keepdims=True) / cnt
            x = (x - m) / jnp.sqrt(v + 1e-5)
            x = (x * p["ssl_model.feature_extractor.conv_layers.0.2.weight"][None, :, None]
                 + p["ssl_model.feature_extractor.conv_layers.0.2.bias"][None, :, None])
        x = _gelu(x)
    return jnp.swapaxes(x, 1, 2)  # (B, T, 512)


def _attention(p, pre, x, heads=12, key_mask=None):
    B, T, D = x.shape
    hd = D // heads

    def proj(name):
        return x @ p[f"{pre}.{name}.weight"].T + p[f"{pre}.{name}.bias"]

    def split(t):
        return t.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(proj("q_proj")), split(proj("k_proj")), split(proj("v_proj"))
    logits = q @ jnp.swapaxes(k, -1, -2) / jnp.sqrt(hd)
    if key_mask is not None:  # exclude padded frames as keys
        logits = jnp.where(key_mask[None, None, None, :], logits, -1e9)
    att = jax.nn.softmax(logits, axis=-1)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ p[f"{pre}.out_proj.weight"].T + p[f"{pre}.out_proj.bias"]


def _encoder(p, x, mask=None):
    # grouped positional conv + SamePad trim (k even -> drop last).
    # x must arrive zeroed at masked frames: the pos conv then sees
    # zeros past the valid length — exactly what torch's zero padding
    # yields at the true (unpadded) length.
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
        x = _ln(x + _attention(p, f"{pre}.self_attn", x, key_mask=mask),
                p[f"{pre}.self_attn_layer_norm.weight"],
                p[f"{pre}.self_attn_layer_norm.bias"])
        h = _gelu(x @ p[f"{pre}.fc1.weight"].T + p[f"{pre}.fc1.bias"])
        h = h @ p[f"{pre}.fc2.weight"].T + p[f"{pre}.fc2.bias"]
        x = _ln(x + h, p[f"{pre}.final_layer_norm.weight"],
                p[f"{pre}.final_layer_norm.bias"])
    return x


def _lstm_dir(x, w_ih, w_hh, b, reverse=False, mask=None):
    """Single-direction LSTM over (B, T, I); torch gate order i,f,g,o.

    mask (T,) bool: padded steps leave the carry untouched, so the
    reverse direction effectively starts at the true last frame."""
    B, T, _ = x.shape
    H = w_hh.shape[1]
    xs = x @ w_ih.T + b  # (B, T, 4H)
    ms = None if mask is None else mask.astype(x.dtype)
    if reverse:
        xs = xs[:, ::-1]
        ms = None if ms is None else ms[::-1]

    def step(carry, inp):
        h, c = carry
        xt = inp if ms is None else inp[0]
        gates = xt + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cn = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        hn = jax.nn.sigmoid(o) * jnp.tanh(cn)
        if ms is not None:
            m = inp[1]
            cn = m * cn + (1.0 - m) * c
            hn = m * hn + (1.0 - m) * h
        return (hn, cn), hn

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    seq = jnp.swapaxes(xs, 0, 1) if ms is None else (
        jnp.swapaxes(xs, 0, 1), ms[:, None, None])
    _, hs = jax.lax.scan(step, init, seq)
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    return hs[:, ::-1] if reverse else hs


def utmos_forward(p: dict, wav: jnp.ndarray, domain_id: int = 0,
                  judge_id: int = 288, n_samples=None) -> jnp.ndarray:
    """wav (B, L) float32 @16 kHz -> MOS scores (B,). Jittable.

    n_samples (None | traced int scalar): how many leading samples of a
    zero-padded wav are real. With it, the score equals the unpadded
    run's (masked GroupNorm stats, attention key mask, carry-through
    LSTM steps, masked time mean) — so score_dir can pad every file to
    a length bucket and compile once per bucket instead of once per
    distinct utterance length.
    """
    x = _extractor(p, wav, n_samples)
    x = _ln(x, p["ssl_model.layer_norm.weight"], p["ssl_model.layer_norm.bias"])
    x = x @ p["ssl_model.post_extract_proj.weight"].T + p["ssl_model.post_extract_proj.bias"]

    B, T = x.shape[0], x.shape[1]
    mask = None
    if n_samples is not None:
        Tv = _valid_frames(n_samples)
        mask = jnp.arange(T) < Tv
        x = x * mask[None, :, None]  # pos conv must see zeros past Tv
    x = _encoder(p, x, mask)  # (B, T, 768)

    dom = jnp.broadcast_to(p["domain_embedding.weight"][domain_id], (B, T, 128))
    jud = jnp.broadcast_to(p["judge_embedding.weight"][judge_id], (B, T, 128))
    x = jnp.concatenate([x, dom, jud], axis=-1)

    fwd = _lstm_dir(x, p["decoder_rnn.weight_ih_l0"], p["decoder_rnn.weight_hh_l0"],
                    p["decoder_rnn.bias_ih_l0"] + p["decoder_rnn.bias_hh_l0"],
                    mask=mask)
    bwd = _lstm_dir(x, p["decoder_rnn.weight_ih_l0_reverse"],
                    p["decoder_rnn.weight_hh_l0_reverse"],
                    p["decoder_rnn.bias_ih_l0_reverse"] + p["decoder_rnn.bias_hh_l0_reverse"],
                    reverse=True, mask=mask)
    x = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T, 1024)

    h = jax.nn.relu(x @ p["net.0.weight"].T + p["net.0.bias"])
    out = h @ p["net.3.weight"].T + p["net.3.bias"]  # (B, T, 1)
    if mask is None:
        return out.mean(axis=1)[:, 0] * 2.0 + 3.0
    Tv = jnp.maximum(_valid_frames(n_samples), 1).astype(out.dtype)
    return jnp.sum(out[:, :, 0] * mask[None, :], axis=1) / Tv * 2.0 + 3.0


def score_dir(deg_dir: str, ckpt_path: str, sr: int = 16000,
              bucket_sec: float = 0.5) -> tuple[float, float]:
    """Mean/std UTMOS over a wav dir, scored on the default JAX device
    (reference Metrics/utmos.py:24-52 contract).

    Files are zero-padded up to `bucket_sec` length buckets so XLA
    compiles once per bucket, not once per distinct utterance length
    (a real corpus has a unique length per file — per-length compiles
    of the 12-layer transformer would dwarf the scoring itself). The
    masked forward makes the padded score equal the exact-length one.
    """
    import os

    from ..data.audio_io import load_wav
    from .utmos_torch import load_utmos

    model = load_utmos(ckpt_path)
    params = torch_to_jax_params(model.state_dict())
    fn = jax.jit(utmos_forward)
    bucket = max(1, int(bucket_sec * sr))
    scores = []
    for name in sorted(os.listdir(deg_dir)):
        if not name.endswith(".wav"):
            continue
        audio = np.asarray(load_wav(os.path.join(deg_dir, name), sr), np.float32)
        L = len(audio)
        Lb = ((L + bucket - 1) // bucket) * bucket
        padded = np.pad(audio, (0, Lb - L))
        scores.append(float(fn(params, jnp.asarray(padded)[None, :],
                                n_samples=jnp.int32(L))[0]))
    if not scores:
        raise RuntimeError(f"no wav files in {deg_dir}")
    return float(np.mean(scores)), float(np.std(scores))
