"""CREPE pitch/periodicity in JAX, fed by torchcrepe checkpoints.

The reference scores Periodicity / Pitch-RMSE / V-UV F1 with
cargan + torchcrepe (reference Metrics/evaluate.py:35-76): CREPE
'full' run on 16 kHz audio at 10 ms hops, pitch decoded from the 360
cent-bin posterior, periodicity = the posterior mass at the decoded
bin. The torchcrepe package (and its pretrained weights) are not in
this environment, so this module re-implements the network in JAX as
plain functions over a params dict (same pattern as utmos_jax.py) and
imports the public `torchcrepe/assets/full.pth` state dict directly.
Without a checkpoint, callers fall back to the YIN-based stand-in in
dsp.periodicity_metrics.

Architecture (torchcrepe/model.py, CREPE 2018 paper): six blocks of
[pad -> Conv2d -> ReLU -> BatchNorm(eval) -> MaxPool(2,1)] over frames
of 1024 samples shaped (B, 1, 1024, 1), then Linear(in_features, 360)
+ sigmoid. 'full': channels 1024/128/128/128/256/512, first kernel
(512,1) stride (4,1) pad (254,254), rest (64,1) stride 1 pad (31,32);
classifier in_features 2048. 'tiny': channels /8, in_features 256.

Bin -> cents mapping: cents(b) = 20*b + 1997.3794084376191,
f = 10 * 2**(cents/1200) (torchcrepe/convert.py). Decoding here is
torchcrepe's "weighted_argmax": average cents over +-4 bins around the
peak weighted by the posterior.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = [
    "torch_to_jax_params", "crepe_forward", "predict_f0_periodicity",
    "CENTS_OFFSET", "CENTS_PER_BIN", "PITCH_BINS",
]

PITCH_BINS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
WINDOW = 1024
SAMPLE_RATE = 16000
HOP = 160  # 10 ms


def _spec(model: str):
    if model == "full":
        out_ch = [1024, 128, 128, 128, 256, 512]
        in_feats = 2048
    elif model == "tiny":
        out_ch = [128, 16, 16, 16, 32, 64]
        in_feats = 256
    else:  # pragma: no cover
        raise ValueError(f"unknown CREPE capacity {model!r}")
    return out_ch, in_feats


def torch_to_jax_params(state_dict, model: str = "full") -> dict:
    """Map a torchcrepe state dict (conv{i}.weight/bias,
    conv{i}_BN.{weight,bias,running_mean,running_var}, classifier.*)
    to a flat dict of numpy arrays; validates shapes."""
    out_ch, in_feats = _spec(model)
    p = {}
    for i in range(1, 7):
        w = np.asarray(state_dict[f"conv{i}.weight"], np.float32)
        assert w.shape[0] == out_ch[i - 1], (i, w.shape)
        p[f"conv{i}_w"] = w  # (O, I, kh, 1)
        p[f"conv{i}_b"] = np.asarray(state_dict[f"conv{i}.bias"], np.float32)
        for k in ("weight", "bias", "running_mean", "running_var"):
            p[f"bn{i}_{k}"] = np.asarray(state_dict[f"conv{i}_BN.{k}"],
                                         np.float32)
    p["fc_w"] = np.asarray(state_dict["classifier.weight"], np.float32)
    assert p["fc_w"].shape == (PITCH_BINS, in_feats), p["fc_w"].shape
    p["fc_b"] = np.asarray(state_dict["classifier.bias"], np.float32)
    return p


_BN_EPS = 0.0010000000474974513  # torchcrepe's batch_norm_fn eps


def crepe_forward(p: dict, frames, model: str = "full"):
    """(B, 1024) normalized frames -> (B, 360) bin posteriors."""
    import jax
    import jax.numpy as jnp

    x = frames[:, :, None]  # (B, H, C=1) height-major, channels-last
    pads = [(254, 254)] + [(31, 32)] * 5
    strides = [4] + [1] * 5
    for i in range(1, 7):
        w = jnp.asarray(p[f"conv{i}_w"])[:, :, :, 0]       # (O, I, kh)
        w = jnp.transpose(w, (2, 1, 0))                    # (kh, I, O)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(strides[i - 1],),
            padding=[pads[i - 1]],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + jnp.asarray(p[f"conv{i}_b"])
        x = jax.nn.relu(x)  # torchcrepe: ReLU BEFORE the (eval) BN
        mean = jnp.asarray(p[f"bn{i}_running_mean"])
        var = jnp.asarray(p[f"bn{i}_running_var"])
        x = (x - mean) * jax.lax.rsqrt(var + _BN_EPS)
        x = x * jnp.asarray(p[f"bn{i}_weight"]) + jnp.asarray(p[f"bn{i}_bias"])
        B, H, C = x.shape
        x = x.reshape(B, H // 2, 2, C).max(axis=2)         # MaxPool (2,1)
    # torch permute(0, 2, 1, 3): flatten height-major over (H, C)
    B, H, C = x.shape
    x = x.reshape(B, H * C)
    logits = x @ jnp.asarray(p["fc_w"]).T + jnp.asarray(p["fc_b"])
    return jax.nn.sigmoid(logits)


def _bin_to_hz(bins_cents: np.ndarray) -> np.ndarray:
    return 10.0 * 2.0 ** (bins_cents / 1200.0)


def _decode_weighted_argmax(probs: np.ndarray, fmin: float, fmax: float):
    """torchcrepe weighted_argmax: posterior-weighted mean cents over
    +-4 bins around the peak, restricted to [fmin, fmax]."""
    cents_axis = CENTS_PER_BIN * np.arange(PITCH_BINS) + CENTS_OFFSET
    hz_axis = _bin_to_hz(cents_axis)
    masked = probs.copy()
    masked[:, (hz_axis < fmin) | (hz_axis > fmax)] = -np.inf
    peak = np.argmax(masked, axis=1)
    periodicity = probs[np.arange(len(peak)), peak]
    lo = np.maximum(peak - 4, 0)
    hi = np.minimum(peak + 5, PITCH_BINS)
    cents = np.empty(len(peak), np.float64)
    for t in range(len(peak)):  # ragged windows; T is small (frames)
        w = probs[t, lo[t]:hi[t]]
        cents[t] = float(np.sum(w * cents_axis[lo[t]:hi[t]]) / max(np.sum(w), 1e-9))
    return _bin_to_hz(cents), periodicity


def predict_f0_periodicity(audio: np.ndarray, sr: int, params: dict,
                           model: str = "full", fmin: float = 50.0,
                           fmax: float = 550.0, batch_frames: int = 512,
                           hop: int = HOP):
    """audio (T,) at sr -> (f0_hz, periodicity) at `hop`-sample hops
    on the 16 kHz grid (default 160 = 10 ms).

    Mirrors torchcrepe.predict(..., return_periodicity=True) with the
    weighted_argmax decoder; frames are per-frame mean/std normalized
    (torchcrepe.preprocess).
    """
    from scipy.signal import resample_poly

    audio = np.asarray(audio, np.float64)
    if sr != SAMPLE_RATE:
        g = np.gcd(int(sr), SAMPLE_RATE)
        audio = resample_poly(audio, SAMPLE_RATE // g, sr // g)
    # torchcrepe pads WINDOW//2 both sides so frame t is centered at t*hop
    audio = np.pad(audio, (WINDOW // 2, WINDOW // 2))
    n_frames = 1 + (len(audio) - WINDOW) // hop
    idx = np.arange(WINDOW)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = audio[idx].astype(np.float32)
    mu = frames.mean(axis=1, keepdims=True)
    sd = np.maximum(frames.std(axis=1, keepdims=True), 1e-10)
    frames = (frames - mu) / sd

    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda fr: crepe_forward(params, fr, model))
    probs = []
    for s in range(0, n_frames, batch_frames):
        chunk = frames[s:s + batch_frames]
        pad = batch_frames - len(chunk)  # static shape: one compile
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        out = np.asarray(fwd(jnp.asarray(chunk)))
        probs.append(out[:len(frames[s:s + batch_frames])] if pad else out)
    probs = np.concatenate(probs, axis=0)
    return _decode_weighted_argmax(probs, fmin, fmax)


def load_params(ckpt_path: str, model: str = "full") -> dict:
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    return torch_to_jax_params({k: v.numpy() for k, v in sd.items()}, model)


def crepe_ckpt_from_env() -> str | None:
    """Path from $NVSE_CREPE_CKPT if it exists (else None -> YIN path)."""
    path = os.environ.get("NVSE_CREPE_CKPT", "")
    return path if path and os.path.exists(path) else None


def crepe_model_from_env() -> str:
    """Capacity from $NVSE_CREPE_MODEL ('full' default, or 'tiny')."""
    return os.environ.get("NVSE_CREPE_MODEL", "full")
