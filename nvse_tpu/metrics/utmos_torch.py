"""UTMOS MOS predictor: full scoring path in plain torch (no fairseq).

The reference (``/root/reference/Metrics/utmos.py:54-157``) loads the
sarulab-speech UTMOS strong learner: a fairseq wav2vec2-base SSL
backbone + domain/judge embeddings + BiLSTM + projection head,
checkpointed as a pytorch-lightning ``epoch=3-step=7459.ckpt``. That
checkpoint contains the *fine-tuned* wav2vec2 weights under
``model.feature_extractors.0.ssl_model.*`` — so scoring needs no
fairseq at all, only a wav2vec2 forward whose parameter names match the
fairseq layout. This module implements exactly that:

  * ``Wav2Vec2Base`` — the public wav2vec2-base architecture (7-layer
    conv feature extractor, 512->768 projection, grouped positional
    conv, 12 post-norm transformer layers) with fairseq-style parameter
    names, so ``load_state_dict`` consumes the checkpoint directly.
  * ``UTMOSModel`` — DomainEmbedding(3,128) + judge Embedding(3000,128)
    broadcast over time, BiLSTM(1024->512x2), Projection(1024->2048->1);
    score = mean_t(out) * 2 + 3 (reference utmos.py:92).

Inference is eval-mode CPU torch; dropouts are inert. Scoring uses
domain id 0 and judge id 288, as the reference does (utmos.py:84-87).
"""
from __future__ import annotations

import math
import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

SSL_DIM = 768
CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


class _ConvFeatureExtractor(nn.Module):
    """wav2vec2-base conv front end: 7 strided Conv1d, GELU, group-norm
    on the first layer only, no biases. Matches fairseq key layout
    ``conv_layers.{i}.0`` (conv) and ``conv_layers.0.2`` (GroupNorm)."""

    def __init__(self):
        super().__init__()
        self.conv_layers = nn.ModuleList()
        in_d = 1
        for i, (dim, k, stride) in enumerate(CONV_LAYERS):
            mods = [nn.Conv1d(in_d, dim, k, stride=stride, bias=False), nn.Dropout(0.0)]
            if i == 0:
                mods.append(nn.GroupNorm(dim, dim, affine=True))
            mods.append(nn.GELU())
            self.conv_layers.append(nn.Sequential(*mods))
            in_d = dim

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x.unsqueeze(1)  # (B, 1, L)
        for layer in self.conv_layers:
            x = layer(x)
        return x  # (B, 512, T)


class _SelfAttention(nn.Module):
    """12-head attention with separate q/k/v/out projections (fairseq
    ``self_attn.{q,k,v,out}_proj`` key layout)."""

    def __init__(self, dim: int = SSL_DIM, heads: int = 12):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.q_proj = nn.Linear(dim, dim)
        self.k_proj = nn.Linear(dim, dim)
        self.v_proj = nn.Linear(dim, dim)
        self.out_proj = nn.Linear(dim, dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        B, T, D = x.shape
        def split(t):
            return t.view(B, T, self.heads, self.head_dim).transpose(1, 2)
        q, k, v = split(self.q_proj(x)), split(self.k_proj(x)), split(self.v_proj(x))
        att = F.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, T, D)
        return self.out_proj(att)


class _TransformerLayer(nn.Module):
    """Post-norm (layer_norm_first=False, the base config): residual ->
    attn -> LN, residual -> GELU MLP -> LN."""

    def __init__(self, dim: int = SSL_DIM, ffn: int = 3072):
        super().__init__()
        self.self_attn = _SelfAttention(dim)
        self.self_attn_layer_norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn)
        self.fc2 = nn.Linear(ffn, dim)
        self.final_layer_norm = nn.LayerNorm(dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.self_attn_layer_norm(x + self.self_attn(x))
        return self.final_layer_norm(x + self.fc2(F.gelu(self.fc1(x))))


class _PosConv(nn.Module):
    """Grouped positional conv (k=128, groups=16) with the weight-norm
    (g, v) parametrization stored exactly as fairseq checkpoints it."""

    def __init__(self, dim: int = SSL_DIM, k: int = 128, groups: int = 16):
        super().__init__()
        self.k = k
        self.groups = groups
        self.weight_g = nn.Parameter(torch.ones(dim, 1, 1))
        self.weight_v = nn.Parameter(torch.zeros(dim, dim // groups, k))
        self.bias = nn.Parameter(torch.zeros(dim))
        nn.init.normal_(self.weight_v, std=math.sqrt(4.0 / (k * dim)))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        # weight-norm fold: w = g * v / ||v|| over (in, k) dims
        norm = self.weight_v.norm(dim=(1, 2), keepdim=True).clamp_min(1e-12)
        w = self.weight_g * self.weight_v / norm
        y = F.conv1d(x, w, self.bias, padding=self.k // 2, groups=self.groups)
        return y[..., :-1] if self.k % 2 == 0 else y  # fairseq SamePad


class _Encoder(nn.Module):
    def __init__(self, layers: int = 12):
        super().__init__()
        self.pos_conv = nn.ModuleList([_PosConv()])
        self.layer_norm = nn.LayerNorm(SSL_DIM)
        self.layers = nn.ModuleList([_TransformerLayer() for _ in range(layers)])

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x + F.gelu(self.pos_conv[0](x.transpose(1, 2))).transpose(1, 2)
        x = self.layer_norm(x)
        for layer in self.layers:
            x = layer(x)
        return x


class Wav2Vec2Base(nn.Module):
    """wav2vec2-base forward (features_only) with fairseq param names."""

    def __init__(self):
        super().__init__()
        self.feature_extractor = _ConvFeatureExtractor()
        self.layer_norm = nn.LayerNorm(512)
        self.post_extract_proj = nn.Linear(512, SSL_DIM)
        self.encoder = _Encoder()

    def forward(self, wav: torch.Tensor) -> torch.Tensor:
        feats = self.feature_extractor(wav).transpose(1, 2)  # (B, T, 512)
        feats = self.layer_norm(feats)
        return self.encoder(self.post_extract_proj(feats))  # (B, T, 768)


class UTMOSModel(nn.Module):
    """SSL features ++ domain ++ judge embedding -> BiLSTM -> MLP -> MOS.

    Parameter names mirror the lightning checkpoint so loading is a
    prefix strip (reference utmos.py:137-157 module structure).
    """

    def __init__(self):
        super().__init__()
        self.ssl_model = Wav2Vec2Base()
        self.domain_embedding = nn.Embedding(3, 128)
        self.judge_embedding = nn.Embedding(3000, 128)
        self.decoder_rnn = nn.LSTM(
            input_size=SSL_DIM + 128 + 128, hidden_size=512,
            num_layers=1, batch_first=True, bidirectional=True,
        )
        self.net = nn.Sequential(
            nn.Linear(1024, 2048), nn.ReLU(), nn.Dropout(0.3), nn.Linear(2048, 1),
        )

    def forward(self, wav: torch.Tensor, domain_id: int = 0, judge_id: int = 288) -> torch.Tensor:
        B = wav.shape[0]
        x = self.ssl_model(wav)  # (B, T, 768)
        T = x.shape[1]
        dom = self.domain_embedding(torch.full((B,), domain_id, dtype=torch.long))
        jud = self.judge_embedding(torch.full((B,), judge_id, dtype=torch.long))
        x = torch.cat([x, dom[:, None, :].expand(-1, T, -1),
                       jud[:, None, :].expand(-1, T, -1)], dim=2)
        x, _ = self.decoder_rnn(x)
        out = self.net(x)  # (B, T, 1)
        return out.mean(dim=1).squeeze(-1) * 2.0 + 3.0  # (B,)


# ---------------------------------------------------------------------------
# Checkpoint loading: map the lightning state dict onto UTMOSModel.

_PREFIX_MAP = [
    ("feature_extractors.0.ssl_model.", "ssl_model."),
    ("feature_extractors.1.embedding.", "domain_embedding."),
    ("output_layers.0.judge_embedding.", "judge_embedding."),
    ("output_layers.0.decoder_rnn.", "decoder_rnn."),
    ("output_layers.1.net.", "net."),
]

# fairseq pretraining-only tensors dropped by remove_pretraining_modules
_SKIP_SUBSTR = ("mask_emb", "quantizer", "project_q", "final_proj", "label_embs")


def map_lightning_state_dict(sd: dict) -> dict:
    """Lightning/fairseq key names -> UTMOSModel names."""
    out = {}
    for key, value in sd.items():
        k = key[6:] if key.startswith("model.") else key
        if any(s in k for s in _SKIP_SUBSTR):
            continue
        for src, dst in _PREFIX_MAP:
            if k.startswith(src):
                out[dst + k[len(src):]] = value
                break
    return out


def load_utmos(ckpt_path: str) -> UTMOSModel:
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    model = UTMOSModel()
    mapped = map_lightning_state_dict(sd)
    missing, unexpected = model.load_state_dict(mapped, strict=False)
    real_missing = [m for m in missing if not m.endswith("num_batches_tracked")]
    if real_missing:
        raise RuntimeError(
            f"UTMOS checkpoint at {ckpt_path} is missing {len(real_missing)} "
            f"tensors (e.g. {real_missing[:4]}); unexpected={unexpected[:4]}"
        )
    return model.eval()


def score_dir(deg_dir: str, ckpt_path: str, sr: int = 16000) -> tuple[float, float]:
    """Mean/std UTMOS over a wav directory (reference utmos.py:24-52)."""
    from ..data.audio_io import load_wav

    model = load_utmos(ckpt_path)
    scores = []
    for name in sorted(os.listdir(deg_dir)):
        if not name.endswith(".wav"):
            continue
        audio = load_wav(os.path.join(deg_dir, name), sr)
        with torch.no_grad():
            s = model(torch.from_numpy(np.asarray(audio, np.float32))[None, :])
        scores.append(float(s[0]))
    if not scores:
        raise RuntimeError(f"no wav files in {deg_dir}")
    return float(np.mean(scores)), float(np.std(scores))
