"""Batch inference engine: mel->wav decoding with RTF accounting.

Replaces the reference's per-file CPU loops (infers/inference_bsrnn.py:41-134,
byte-identical across 8 scripts) with one engine:

  * wav -> mel on device, generator forward, PCM_16 wav out — same
    contract (TF models return the 5-tuple, take [-1]).
  * static-shape bucketing: utterances are padded to the next length
    bucket (multiples of `bucket_frames` mel frames) so jit re-compiles
    only once per bucket, then cropped back — the TPU answer to the
    reference's ragged per-file shapes (SURVEY.md §7).
  * RTF = generated-audio-seconds / wall-seconds, excluding compile
    time (first call per bucket is warmed up separately), matching the
    reference printout (infers/inference_bsrnn.py:98-102).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..data import load_wav, write_wav
from ..models import build_generator, model_input_bins
from ..models.layers import fold_weight_norm
from ..ops import mel_spectrogram
from ..parallel import batch_sharding, get_mesh, replicated_sharding
from ..train.checkpoint import load_generator_params, scan_checkpoint


def _bucket(n: int, step: int) -> int:
    return max(step, ((n + step - 1) // step) * step)


@dataclass
class InferenceEngine:
    h: object
    params: dict | None = None
    bucket_frames: int = 64
    _fns: dict = field(default_factory=dict)
    _warmed: set = field(default_factory=set)

    def __post_init__(self):
        self.generator, self.domain = build_generator(self.h)
        if self.params is None:
            example = jnp.zeros((1, model_input_bins(self.h), 16), jnp.float32)
            variables = self.generator.init(jax.random.PRNGKey(0), example)
            template = variables["params"]
            ckpt = self.h.get("checkpoint_file_load")
            if ckpt and os.path.exists(ckpt):
                self.params = load_generator_params(ckpt, template)
            elif self.h.get("checkpoint_path") and scan_checkpoint(self.h.checkpoint_path, "g_"):
                self.params = load_generator_params(
                    scan_checkpoint(self.h.checkpoint_path, "g_"), template
                )
            else:
                self.params = template  # random init (benchmarks / smoke)
        # remove_weight_norm parity (reference Models/hifigan.py:126-133,
        # applied in every inference script before decoding): fold each
        # (v, g) pair into a plain kernel so the per-forward g·v/‖v‖
        # recompute disappears from the decode graph. Opt-out via
        # h.fold_weight_norm=false (e.g. to decode with training-shaped
        # params mid-run).
        if bool(self.h.get("fold_weight_norm", True)):
            self.params = fold_weight_norm(self.params)
        # Multi-chip serving: h.infer_dp_devices = N (or -1 for all
        # local devices) shards the decode batch over a 1-D data mesh —
        # params replicated once, batch rows split over ICI-connected
        # chips, XLA runs each shard's generator forward independently
        # (no collectives on this path; scaling is embarrassingly
        # parallel). The reference has no multi-device inference at all
        # (device hard-coded, infers/inference_bsrnn.py:129).
        n_dp = int(self.h.get("infer_dp_devices", 1) or 1)
        if n_dp == -1:
            n_dp = len(jax.local_devices())
        self.mesh = get_mesh(n_dp) if n_dp > 1 else None
        # Pin params on device once: checkpoint restore yields host
        # arrays, and passing those to a jitted fn re-uploads the whole
        # tree on EVERY call (~40MB/call for BSRNN-M — dominates
        # per-file decode latency through the remote-TPU tunnel).
        if self.mesh is not None:
            self.params = jax.device_put(
                self.params, replicated_sharding(self.mesh))
        else:
            self.params = jax.device_put(self.params)

    def _fn(self, T: int):
        if T not in self._fns:
            gen = self.generator
            # compute_dtype="bfloat16" runs the trunk in bf16 (worth
            # ~1.3-1.4x on the conv/matmul models; no effect on the
            # latency-bound LSTM models); output is cast back to f32
            dtype = jnp.bfloat16 if str(self.h.get("compute_dtype")) == "bfloat16" else None

            def run(params, mel):
                if dtype is not None:
                    params = jax.tree.map(lambda x: x.astype(dtype), params)
                    mel = mel.astype(dtype)
                out = gen.apply({"params": params}, mel)
                out = out[-1] if isinstance(out, tuple) else out
                return out.astype(jnp.float32)

            if self.mesh is not None:
                bs = batch_sharding(self.mesh)
                run = jax.jit(run, in_shardings=(
                    replicated_sharding(self.mesh), bs), out_shardings=bs)
            else:
                run = jax.jit(run)
            self._fns[T] = run
        return self._fns[T]

    def mel_of(self, audio: np.ndarray) -> jnp.ndarray:
        h = self.h
        return mel_spectrogram(
            jnp.asarray(audio[None, :]), h.n_fft, h.num_mels, h.sampling_rate,
            h.hop_size, h.win_size, h.fmin, h.fmax,
        )

    def synthesize_mel(self, mel: jnp.ndarray, out_len: int | None = None) -> np.ndarray:
        """mel (B, M, T) -> wav (B, L); pads T to a bucket, crops output.

        Under a data mesh (h.infer_dp_devices) the batch axis is also
        padded to a multiple of the mesh size and sharded across chips.
        """
        B, _, T = mel.shape
        Tb = _bucket(T, self.bucket_frames)
        n_dp = self.mesh.devices.size if self.mesh is not None else 1
        Bb = _bucket(B, n_dp) if n_dp > 1 else B
        melp = jnp.pad(mel, ((0, Bb - B), (0, 0), (0, Tb - T)),
                       constant_values=float(np.log(1e-5)))
        wav = self._fn(Tb)(self.params, melp)
        wav = np.asarray(wav)[:B]
        if out_len is None:
            out_len = T * self.h.hop_size
        return wav[..., :out_len]

    def synthesize_streaming(self, mel: jnp.ndarray, out_len: int | None = None,
                             chunk_frames: int = 64, context_frames: int = 16
                             ) -> np.ndarray:
        """Chunked decode for unbounded-length inputs (SURVEY §5.7).

        One static shape regardless of utterance length: mel is cut into
        `chunk_frames` windows with `context_frames` of context on each
        side; each window is decoded independently and only the centre
        `chunk_frames * hop` samples are kept. Exactly one XLA compile,
        O(chunk) latency, constant memory — the TPU answer to the
        reference's run-the-whole-utterance decode
        (infers/inference_bsrnn.py:82-84). For causal models the left
        context reproduces the recurrent state almost exactly; for
        non-causal models it bounds the lookahead error.
        """
        B, M, T = mel.shape
        c, ctx = chunk_frames, context_frames
        hop = self.h.hop_size
        n_chunks = (T + c - 1) // c
        pad_val = float(np.log(1e-5))
        # under a data mesh the jitted fn shards the batch axis — pad B
        # to a mesh multiple exactly as synthesize_mel does
        n_dp = self.mesh.devices.size if self.mesh is not None else 1
        Bb = _bucket(B, n_dp) if n_dp > 1 else B
        # pad so every window [i*c - ctx, (i+1)*c + ctx) is in range
        melp = jnp.pad(mel, ((0, Bb - B), (0, 0), (ctx, n_chunks * c - T + ctx)),
                       constant_values=pad_val)
        fn = self._fn(c + 2 * ctx)
        pieces = []
        for i in range(n_chunks):
            win = jax.lax.dynamic_slice_in_dim(melp, i * c, c + 2 * ctx, axis=2)
            wav = fn(self.params, win)
            pieces.append(np.asarray(wav[:B, ..., ctx * hop : (ctx + c) * hop]))
        out = np.concatenate(pieces, axis=-1)
        if out_len is None:
            out_len = T * hop
        return out[..., :out_len]

    # ---- state-carrying streaming (recurrent models) -------------------

    def _stream_state_zeros(self, B: int):
        """Zero recurrent state for BSRNN-family models: num_repeat
        layers of forward-direction time-LSTM (h, c), each
        (B, nband, feature_dim) — identical to the zero init the
        offline decode starts from, so chunk 1 is exact by
        construction."""
        from ..models.bsrnn import band_plan

        h = self.h
        nband = len(band_plan(h.sampling_rate, h.n_fft))
        z = jnp.zeros((B, nband, int(h.feature_dim)), jnp.float32)
        return tuple((z, z) for _ in range(int(h.num_repeat)))

    def _stream_step(self, c: int, la: int):
        key = ("stateful", c, la)
        if key not in self._fns:
            gen = self.generator
            h = self.h
            dtype = jnp.bfloat16 if str(h.get("compute_dtype")) == "bfloat16" else None
            from ..ops import hann_window, istft_frames

            win = hann_window(h.win_size)
            n_fft, win_size = h.n_fft, h.win_size

            def run(params, states, mel_win):
                if dtype is not None:
                    params = jax.tree.map(lambda x: x.astype(dtype), params)
                    mel_win = mel_win.astype(dtype)
                    states = jax.tree.map(lambda x: x.astype(dtype), states)
                outs, new_states = gen.apply(
                    {"params": params}, mel_win, stream_state=states,
                    return_state=True, carry_idx=c)
                rea, imag = outs[2], outs[3]
                fr = istft_frames(rea[..., :c].astype(jnp.float32),
                                  imag[..., :c].astype(jnp.float32),
                                  n_fft, win_size, window=win)
                return fr, jax.tree.map(
                    lambda x: x.astype(jnp.float32), new_states)

            self._fns[key] = jax.jit(run)
        return self._fns[key]

    def synthesize_streaming_stateful(self, mel: jnp.ndarray,
                                      out_len: int | None = None,
                                      chunk_frames: int = 64,
                                      lookahead_frames: int = 16
                                      ) -> np.ndarray:
        """Chunked decode that CARRIES the recurrent state across chunks
        (BSRNN-family models, supports_stream_state).

        Against the context-recompute decoder (synthesize_streaming):
          * causal configs: exact — the forward LSTM state at each chunk
            boundary is the true state, no left context is recomputed,
            and the carried-tail overlap-add (ops.StreamingOLA)
            reproduces the offline iSTFT sample-for-sample. Zero seam.
          * non-causal (bidirectional) configs: the forward direction is
            exact; only the backward direction sees a bounded
            `lookahead_frames` future window, so the per-chunk window is
            c + la frames instead of c + 2*ctx and the seam error drops.
        Batch rows are independent streams — B > 1 serves that many
        concurrent streams per dispatch.
        """
        if not getattr(type(self.generator), "supports_stream_state", False):
            raise ValueError(
                f"{self.h.model_name} has no stream_state support; use "
                "synthesize_streaming (context recompute)")
        from ..ops import StreamingOLA, hann_window

        h = self.h
        B, _, T = mel.shape
        c, la = chunk_frames, lookahead_frames
        hop = h.hop_size
        n_chunks = (T + c - 1) // c
        melp = jnp.pad(mel, ((0, 0), (0, 0), (0, n_chunks * c - T + la)),
                       constant_values=float(np.log(1e-5)))
        step = self._stream_step(c, la)
        states = self._stream_state_zeros(B)
        ola = StreamingOLA(h.n_fft, hop, h.win_size,
                           window=np.asarray(hann_window(h.win_size)))
        pieces = []
        for i in range(n_chunks):
            win = jax.lax.dynamic_slice_in_dim(melp, i * c, c + la, axis=2)
            fr, states = step(self.params, states, win)
            pieces.append(ola.push(np.asarray(fr)))
        pieces.append(ola.flush())
        y = np.concatenate(pieces, axis=-1)[:, h.n_fft // 2 :]
        if out_len is None:
            out_len = T * hop
        return y[:, :out_len]

    def warmup(self, T: int, exact: bool = False, batch: int | None = None) -> None:
        """Compile + run the T-frame shape once, outside any timer.

        Idempotent per shape: every distinct bucket pays its XLA compile
        here, never inside the timed region (a length-diverse test set
        hits several buckets, not just the first file's). exact=True
        compiles T itself (streaming windows are not bucket-aligned).
        batch warms that batch size (the batched decode path runs a
        fixed batch per bucket so each bucket compiles exactly once).
        """
        Tb = T if exact else _bucket(T, self.bucket_frames)
        B = batch or (self.mesh.devices.size if self.mesh is not None else 1)
        if (Tb, B) in self._warmed:
            return
        mel = jnp.full((B, model_input_bins(self.h), Tb), float(np.log(1e-5)))
        # sync via host transfer, not block_until_ready: through the TPU
        # tunnel block_until_ready is a no-op and the compile+execute
        # would otherwise be deferred into the first timed np.asarray
        np.asarray(self._fn(Tb)(self.params, mel))
        self._warmed.add((Tb, B))


def resolve_filelist(h) -> list[str]:
    """Reference filelist semantics (infers/inference_bsrnn.py:47-55)."""
    src = h.test_input_wavs_dir
    if os.path.isfile(src):
        with open(src) as f:
            names = [l.strip().split("/")[1].split("|")[0] for l in f if l.strip()]
        return [os.path.join(h.raw_wavfile_path, n) for n in names]
    return [os.path.join(src, n) for n in sorted(os.listdir(src)) if n.endswith(".wav")]


def run_inference(h, limit: int | None = None, log_fn=print,
                  stream: bool = False, batch: int | None = None) -> dict:
    """Decode the test set, write wavs, print + return RTF stats.

    stream=True (or h.stream) uses the chunked constant-memory decoder:
    a single compiled window shape for any utterance length.

    batch (default h.infer_batch, else 8) groups files into
    fixed-size batches per length bucket — one device dispatch per
    GROUP instead of per file, replacing the reference's per-file
    loop (infers/inference_bsrnn.py:82-102). Mels are computed with
    the exact host-side numpy mel (ops.mel_spectrogram_np) so the
    accelerator only runs the batched generator. batch=1 restores the
    per-file path (and streaming always decodes per file).
    """
    engine = InferenceEngine(h)
    if model_input_bins(h) != h.num_mels and not h.get("test_mel_load"):
        # BSRNN_24k-style models consume a log-magnitude spectrum
        # (n_fft//2+1 bins), not a mel — feeding engine.mel_of() output
        # would decode garbage and warm up a never-used shape. Those
        # configs go through infers/inference_joint_denoise_vocoder_bsrnn
        # (--processing_mode) or scripts/enhance_eval.py instead.
        raise ValueError(
            f"model expects {model_input_bins(h)} input bins but "
            f"run_inference feeds {h.num_mels}-mel features; use the "
            "joint inference CLI (--processing_mode denoise|vocoder) "
            "for spectrum-input models"
        )
    stream = stream or bool(h.get("stream"))
    chunk = int(h.get("stream_chunk_frames", 64))
    ctx = int(h.get("stream_context_frames", 16))
    files = resolve_filelist(h)
    if limit:
        files = files[:limit]
    os.makedirs(h.test_output_dir, exist_ok=True)
    if batch is None:
        batch = int(h.get("infer_batch") or 8)

    total_audio_sec = 0.0
    total_wall = 0.0

    if batch > 1 and not stream and not h.get("test_mel_load"):
        from ..ops import mel_spectrogram_np

        M = model_input_bins(h)
        pad_val = float(np.log(1e-5))
        items = []  # (path, mel (M,T) np, audio_len)
        for path in files:
            audio = load_wav(path, h.sampling_rate)
            mel = mel_spectrogram_np(
                audio[None, :], h.n_fft, h.num_mels, h.sampling_rate,
                h.hop_size, h.win_size, h.fmin, h.fmax)[0]
            items.append((path, mel, len(audio)))
        groups: dict[int, list[int]] = {}
        for i, (_p, mel, _a) in enumerate(items):
            groups.setdefault(_bucket(mel.shape[-1], engine.bucket_frames),
                              []).append(i)
        for Tb in sorted(groups):
            idxs = groups[Tb]
            for s in range(0, len(idxs), batch):
                grp = idxs[s : s + batch]
                melb = np.full((batch, M, Tb), pad_val, np.float32)
                for r, i in enumerate(grp):
                    m = items[i][1]
                    melb[r, :, : m.shape[-1]] = m
                engine.warmup(Tb, batch=batch)
                t0 = time.time()
                wavs = np.asarray(
                    engine.synthesize_mel(jnp.asarray(melb)))
                total_wall += time.time() - t0
                for r, i in enumerate(grp):
                    path, _mel, alen = items[i]
                    total_audio_sec += alen / h.sampling_rate
                    out = os.path.join(h.test_output_dir,
                                       os.path.basename(path))
                    write_wav(out, wavs[r, :alen], h.sampling_rate)
        rtf = total_audio_sec / max(total_wall, 1e-9)
        log_fn(f"decoded {len(files)} files | wall {total_wall:.2f}s | "
               f"audio {total_audio_sec:.2f}s | RTF {rtf:.2f}x realtime")
        return {"files": len(files), "wall_sec": total_wall,
                "audio_sec": total_audio_sec, "rtf": rtf}

    for path in files:
        if h.get("test_mel_load"):
            mel = jnp.asarray(np.load(path)[None, ...])
            audio_len = mel.shape[-1] * h.hop_size
        else:
            audio = load_wav(path, h.sampling_rate)
            mel = engine.mel_of(audio)
            audio_len = len(audio)
        stateful = stream and str(h.get("stream_mode", "")) == "stateful" \
            and getattr(type(engine.generator), "supports_stream_state", False)
        if stream and not stateful:
            engine.warmup(chunk + 2 * ctx, exact=True)
        elif not stream:
            engine.warmup(mel.shape[-1])
        t0 = time.time()
        if stateful:
            wav = engine.synthesize_streaming_stateful(
                mel, out_len=audio_len, chunk_frames=chunk,
                lookahead_frames=ctx)
        elif stream:
            wav = engine.synthesize_streaming(mel, out_len=audio_len,
                                              chunk_frames=chunk,
                                              context_frames=ctx)
        else:
            wav = engine.synthesize_mel(mel, out_len=audio_len)
        wav = np.asarray(wav)
        total_wall += time.time() - t0
        total_audio_sec += audio_len / h.sampling_rate
        out = os.path.join(h.test_output_dir, os.path.basename(path))
        write_wav(out, wav[0], h.sampling_rate)

    rtf = total_audio_sec / max(total_wall, 1e-9)
    log_fn(f"decoded {len(files)} files | wall {total_wall:.2f}s | "
           f"audio {total_audio_sec:.2f}s | RTF {rtf:.2f}x realtime")
    return {"files": len(files), "wall_sec": total_wall,
            "audio_sec": total_audio_sec, "rtf": rtf}
