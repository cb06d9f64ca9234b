"""Inference engine tests: bucketing, wav writing, RTF accounting."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from nvse_tpu.data import load_wav, write_wav
from nvse_tpu.infer import InferenceEngine, run_inference
from nvse_tpu.utils import AttrDict


def _h(tmp_path, wav_dir):
    return AttrDict(dict(
        model_name="HiFiGAN", resblock="2",
        upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_input_wavs_dir=wav_dir,
        test_output_dir=str(tmp_path / "out"),
        test_mel_load=0,
    ))


@pytest.fixture
def wavs(tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sr = 22050
    for i, n in enumerate([5000, 9000]):  # different lengths -> two buckets
        t = np.arange(n) / sr
        x = 0.3 * np.sin(2 * np.pi * (220 + 110 * i) * t)
        write_wav(str(wav_dir / f"u{i}.wav"), x.astype(np.float32), sr)
    return str(wav_dir)


def test_engine_bucketing(wavs, tmp_path):
    h = _h(tmp_path, wavs)
    engine = InferenceEngine(h, bucket_frames=32)
    mel = engine.mel_of(load_wav(os.path.join(wavs, "u0.wav"), 22050))
    wav = engine.synthesize_mel(mel, out_len=5000)
    assert wav.shape == (1, 5000)
    # two different T land in the same or different buckets; compiled fns cached
    mel2 = engine.mel_of(load_wav(os.path.join(wavs, "u1.wav"), 22050))
    wav2 = engine.synthesize_mel(mel2, out_len=9000)
    assert wav2.shape == (1, 9000)
    assert len(engine._fns) <= 2


@pytest.mark.slow
def test_engine_log_spectrum_model(tmp_path):
    """BSRNN_24k consumes a full (F=n_fft//2+1)-bin log-spectrum, not a
    mel: the engine's init example and warmup shapes must follow
    model_input_bins (the joint denoise/vocoder CLI path)."""
    import jax.numpy as jnp

    from nvse_tpu.ops import amp_pha_spectrum

    h = AttrDict(dict(
        model_name="BSRNN_24k", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=24000, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=100, fmin=0, fmax=12000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=16)
    sr = 24000
    t = np.arange(6000) / sr
    x = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    spec = amp_pha_spectrum(jnp.asarray(x[None, :]), 1024, 256, 1024, eps=1e-5)[0]
    assert spec.shape[1] == 513
    engine.warmup(spec.shape[-1])
    wav = engine.synthesize_mel(spec, out_len=6000)
    assert wav.shape == (1, 6000)
    assert np.all(np.isfinite(wav))


def test_run_inference_writes_wavs_and_rtf(wavs, tmp_path):
    h = _h(tmp_path, wavs)
    stats = run_inference(h, log_fn=lambda s: None)
    assert stats["files"] == 2
    assert stats["rtf"] > 0
    outs = sorted(os.listdir(h.test_output_dir))
    assert outs == ["u0.wav", "u1.wav"]
    y = load_wav(os.path.join(h.test_output_dir, "u0.wav"), 22050)
    assert len(y) == 5000


def test_run_inference_batched_matches_perfile(wavs, tmp_path):
    """The batched decode path (fixed batch per length bucket, host
    numpy mel) must produce the same audio as the per-file path; its
    RTF accounting covers only real rows."""
    h = _h(tmp_path, wavs)
    h["test_output_dir"] = str(tmp_path / "out_batched")
    stats_b = run_inference(h, log_fn=lambda s: None)  # default batch=8
    h2 = _h(tmp_path, wavs)
    h2["test_output_dir"] = str(tmp_path / "out_perfile")
    stats_1 = run_inference(h2, batch=1, log_fn=lambda s: None)
    assert stats_b["files"] == stats_1["files"] == 2
    assert abs(stats_b["audio_sec"] - stats_1["audio_sec"]) < 1e-6
    for n in ("u0.wav", "u1.wav"):
        a = load_wav(os.path.join(h["test_output_dir"], n), 22050)
        b = load_wav(os.path.join(h2["test_output_dir"], n), 22050)
        assert len(a) == len(b)
        denom = float(np.abs(b).max()) + 1e-9
        assert float(np.abs(a - b).max()) / denom < 5e-3


def test_engine_bf16_mode(wavs, tmp_path):
    h = _h(tmp_path, wavs)
    h.compute_dtype = "bfloat16"
    engine = InferenceEngine(h, bucket_frames=32)
    mel = engine.mel_of(load_wav(os.path.join(wavs, "u0.wav"), 22050))
    wav = engine.synthesize_mel(mel, out_len=5000)
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_streaming_decode_matches_full_for_causal_bsrnn(tmp_path):
    """Causal BSRNN: chunked decode with left context reproduces the
    full-utterance decode away from window edges; one compiled shape."""
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=True, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=32)
    rng = np.random.default_rng(0)
    T = 96
    mel = jnp.asarray(rng.standard_normal((1, 80, T)).astype(np.float32) - 4.0)

    # a T-frame iSTFT yields (T-1)*hop samples; compare on that length
    out_len = (T - 1) * 256
    full = np.asarray(engine.synthesize_mel(mel, out_len=out_len))
    stream = engine.synthesize_streaming(mel, out_len=out_len,
                                         chunk_frames=32, context_frames=24)
    assert stream.shape == full.shape
    # compare away from the global edges (iSTFT boundary taper) on the
    # middle chunk, where 24 frames of causal context have converged
    a = full[0, 32 * 256: 64 * 256]
    b = stream[0, 32 * 256: 64 * 256]
    err = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert err < 0.15, err
    # exactly one compiled window shape used for streaming
    assert (32 + 2 * 24) in engine._fns


def test_stateful_streaming_exact_for_causal_bsrnn(tmp_path):
    """Causal BSRNN with carried LSTM state + carried-tail OLA: the
    chunked decode must equal the full-utterance decode sample-for-
    sample (float-order noise only) — zero seam, no context recompute."""
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=2, dropout=0.0,
        causal=True, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=32)
    rng = np.random.default_rng(0)
    T = 96
    mel = jnp.asarray(rng.standard_normal((1, 80, T)).astype(np.float32) - 4.0)
    out_len = (T - 1) * 256
    full = np.asarray(engine.synthesize_mel(mel, out_len=out_len))
    stream = engine.synthesize_streaming_stateful(
        mel, out_len=out_len, chunk_frames=32, lookahead_frames=0)
    assert stream.shape == full.shape
    err = np.abs(full - stream).max() / (np.abs(full).max() + 1e-9)
    assert err < 1e-4, err


def test_stateful_streaming_beats_recompute_for_noncausal_bsrnn(tmp_path):
    """Non-causal BSRNN: carrying the forward state (exact) and bounding
    only the backward direction by a lookahead must give a SMALLER
    chunked-vs-full error than the symmetric context-recompute decoder
    at the same context budget."""
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=2, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=32)
    rng = np.random.default_rng(1)
    T = 128
    mel = jnp.asarray(rng.standard_normal((1, 80, T)).astype(np.float32) - 4.0)
    out_len = (T - 1) * 256
    full = np.asarray(engine.synthesize_mel(mel, out_len=out_len))
    recompute = np.asarray(engine.synthesize_streaming(
        mel, out_len=out_len, chunk_frames=32, context_frames=16))
    stateful = engine.synthesize_streaming_stateful(
        mel, out_len=out_len, chunk_frames=32, lookahead_frames=16)
    # interior region (skip global iSTFT edge taper)
    sl = slice(16 * 256, out_len - 16 * 256)
    scale = np.abs(full[0, sl]).mean() + 1e-9
    err_r = np.abs(full[0, sl] - recompute[0, sl]).mean() / scale
    err_s = np.abs(full[0, sl] - stateful[0, sl]).mean() / scale
    assert err_s < err_r, (err_s, err_r)
    assert err_s < 0.15, err_s


def test_stateful_streaming_multi_stream_batch(tmp_path):
    """B>1 rows are independent concurrent streams: decoding 2 streams
    batched equals decoding each alone."""
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=True, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=32)
    rng = np.random.default_rng(2)
    T = 64
    mel = jnp.asarray(rng.standard_normal((2, 80, T)).astype(np.float32) - 4.0)
    out_len = (T - 1) * 256
    both = engine.synthesize_streaming_stateful(
        mel, out_len=out_len, chunk_frames=32, lookahead_frames=0)
    solo0 = engine.synthesize_streaming_stateful(
        mel[:1], out_len=out_len, chunk_frames=32, lookahead_frames=0)
    np.testing.assert_allclose(both[:1], solo0, rtol=0, atol=1e-5)


def test_run_inference_stream_flag(wavs, tmp_path):
    h = _h(tmp_path, wavs)
    h["stream"] = 1
    h["stream_chunk_frames"] = 16
    h["stream_context_frames"] = 8
    stats = run_inference(h, log_fn=lambda s: None)
    assert stats["files"] == 2
    y = load_wav(os.path.join(h.test_output_dir, "u0.wav"), 22050)
    assert len(y) == 5000


def test_engine_multichip_dp(wavs, tmp_path):
    """infer_dp_devices=N shards the decode batch over a data mesh;
    output matches the single-device decode exactly (no collectives on
    the forward — embarrassingly parallel serving)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    h = _h(tmp_path, wavs)
    single = InferenceEngine(h, bucket_frames=32)
    h_dp = AttrDict(dict(h, infer_dp_devices=8))
    sharded = InferenceEngine(h_dp, bucket_frames=32)
    assert sharded.mesh is not None

    mel1 = single.mel_of(load_wav(os.path.join(wavs, "u0.wav"), 22050))
    mel = jnp.concatenate([mel1] * 5, axis=0)  # B=5: pads to 8 rows
    ref = single.synthesize_mel(mel, out_len=5000)
    out = sharded.synthesize_mel(mel, out_len=5000)
    assert out.shape == (5, 5000)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_streaming_seam_error_bounded_noncausal_bsrnn(tmp_path):
    """Non-causal BSRNN (the flagship config is causal=false): the
    chunked decode's lookahead/seam error vs the full decode must be
    bounded and must not grow as context increases. This is the test
    counterpart of `scripts/bench_latency.py --seam` (BENCH_LATENCY
    records LSD/PESQ on the trained flagship)."""
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
        test_output_dir=str(tmp_path / "out"), test_mel_load=0,
    ))
    engine = InferenceEngine(h, bucket_frames=32)
    rng = np.random.default_rng(1)
    T = 96
    mel = jnp.asarray(rng.standard_normal((1, 80, T)).astype(np.float32) - 4.0)
    out_len = (T - 1) * 256
    full = np.asarray(engine.synthesize_mel(mel, out_len=out_len))

    errs = {}
    for ctx in (8, 24):
        stream = engine.synthesize_streaming(mel, out_len=out_len,
                                             chunk_frames=32,
                                             context_frames=ctx)
        a = full[0, 16 * 256: 80 * 256]
        b = stream[0, 16 * 256: 80 * 256]
        errs[ctx] = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    # bounded for the recommended context, and more context never hurts
    # (bidirectional LSTM influence decays with distance)
    assert errs[24] < 0.5, errs
    assert errs[24] <= errs[8] * 1.5 + 1e-3, errs
