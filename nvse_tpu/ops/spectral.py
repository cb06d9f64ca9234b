"""Pure-JAX spectral ops matching torch.stft/istft + librosa mel semantics.

Numerical contracts re-implemented from the reference (semantics only, no
code reuse):
  * ``stft``/``istft``    — torch.stft/torch.istft (center=True, reflect pad,
                            one-sided), as used in reference dataset.py:78-91
                            and Models/bsrnn.py:209-215.
  * ``mel_spectrogram``   — reference dataset.py:53-91 (librosa Slaney mel
                            filterbank @ |STFT|, log-clamp 1e-5 compression).
  * ``inverse_mel``       — reference dataset.py:94-120 (pinverse of the mel
                            basis applied to exp(mel)).
  * ``amp_pha_spectrum``  — reference dataset.py:123-139.

TPU-first notes: the mel basis / pseudo-inverse / DFT basis are computed
once on host (numpy, cached) and closed over as constants, so under jit
they live in HBM and every op is a large batched matmul / FFT that XLA
fuses and tiles onto the MXU. Overlap-add in ``istft`` is expressed as a
static shift-and-sum (hop divides n_fft for every config in this suite),
not a scatter, so it compiles to pure vector adds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "stft_ri",
    "istft",
    "istft_ri",
    "mel_filterbank",
    "inverse_mel_basis",
    "mel_spectrogram",
    "inverse_mel",
    "amp_pha_spectrum",
    "dynamic_range_compression",
    "dynamic_range_decompression",
]


# ---------------------------------------------------------------------------
# windows / filterbanks (host-side, cached, traced as constants)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _hann_np(win_size: int) -> np.ndarray:
    """Periodic Hann window == torch.hann_window(win_size)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann window as a HOST numpy array.

    Returned as numpy (not a device array) on purpose: windows are
    static, and stft/istft fold them into trace-time constants — a
    traced window would defeat that and break under jit.
    """
    return _hann_np(win_size)


def _hz_to_mel_slaney(f):
    """Slaney mel scale (librosa htk=False): linear < 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def _mel_filterbank_np(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel equivalent (Slaney norm, htk=False), float32.

    Triangular filters on the Slaney mel scale with area ('slaney')
    normalisation — the basis the reference builds at dataset.py:73.
    """
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_lo, mel_hi = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_lo, mel_hi, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    weights = np.zeros((n_mels, n_fft // 2 + 1), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalisation
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> jnp.ndarray:
    return jnp.asarray(_mel_filterbank_np(sr, n_fft, n_mels, float(fmin), float(fmax)))


@functools.lru_cache(maxsize=None)
def _inv_mel_basis_np(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Moore-Penrose pseudo-inverse of the mel basis (dataset.py:118)."""
    basis = _mel_filterbank_np(sr, n_fft, n_mels, fmin, fmax)
    return np.linalg.pinv(basis.astype(np.float64)).astype(np.float32)


def inverse_mel_basis(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> jnp.ndarray:
    return jnp.asarray(_inv_mel_basis_np(sr, n_fft, n_mels, float(fmin), float(fmax)))


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------

def _pad_window(window: np.ndarray, n_fft: int) -> np.ndarray:
    """Center-pad a win_size window to n_fft (torch.stft semantics)."""
    win_size = window.shape[0]
    if win_size == n_fft:
        return window
    left = (n_fft - win_size) // 2
    out = np.zeros(n_fft, dtype=window.dtype)
    out[left : left + win_size] = window
    return out


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., L) -> (..., T, n_fft) frames at stride hop."""
    L = y.shape[-1]
    n_frames = 1 + (L - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


def _use_matmul_dft() -> bool:
    """True on TPU-like backends.

    The TPU backend here has no FFT lowering; the DFT-as-matmul path is
    also the MXU-idiomatic formulation (large static matmuls that XLA
    tiles onto the systolic array), so it is the default off-CPU.
    """
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _rdft_basis_np(n_fft: int) -> np.ndarray:
    """(n_fft, 2F) real DFT basis: frames @ basis = [real | imag]."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(F, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_basis_np(n_fft: int) -> np.ndarray:
    """(2F, n_fft) inverse real DFT basis: [real | imag] @ basis = frames.

    Row weights fold in the Hermitian-symmetry factor (2 for interior
    bins, 1 for DC/Nyquist) and the 1/n_fft normalisation.
    """
    F = n_fft // 2 + 1
    w = np.full(F, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    f = np.arange(F, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * f * n / n_fft
    top = (w[:, None] * np.cos(ang)) / n_fft
    bot = (-w[:, None] * np.sin(ang)) / n_fft
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def stft_ri(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    window: jnp.ndarray | None = None,
    center: bool = True,
):
    """torch.stft equivalent returning (real, imag), each (..., F, T).

    center=True reflect-pads n_fft//2 on each side; one-sided output with
    F = n_fft//2 + 1 bins. window=None means rectangular (used by the
    multi-resolution discriminator, reference Models/models.py:367-379).
    Avoids complex dtypes end-to-end so results are TPU-host-transferable.
    """
    if window is None:
        # torch.stft's window=None is ones(win_length) zero-padded to
        # n_fft, NOT ones(n_fft) — they differ whenever win_size < n_fft
        win = _pad_window(np.ones(win_size, dtype=np.float32), n_fft)
    else:
        win = _pad_window(np.asarray(window), n_fft)
    win = jnp.asarray(win)

    if center:
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")

    F = n_fft // 2 + 1
    if _use_matmul_dft():
        # framing + window + DFT fused into ONE strided convolution:
        # kernel (n_fft, 1, 2F) = window ⊙ real-DFT basis. Critically,
        # the BACKWARD of a conv is a conv (fast on TPU) whereas the
        # backward of gather-based framing is a scatter-add, which is
        # catastrophically slow on TPU and sits on the G-loss gradient
        # path through every mel / consistency / MRD spectrogram.
        # kernel follows the input dtype: conv requires matching dtypes
        # (unlike einsum, which promotes) and a bf16 input means the
        # caller wants the bf16 MXU path (mixed-precision trunks).
        # precision=HIGHEST: TPU f32 convs otherwise run bf16 multiply
        # passes on the MXU, and near-silent bins amplify that noise
        # through the log-amplitude features (observed: per-term loss
        # values shifted up to 40% vs exact f32 on identical inputs).
        # Feature extraction feeds losses/targets, so it must be exact;
        # model trunks keep the fast default. bf16 inputs are unaffected.
        kernel = (jnp.asarray(_rdft_basis_np(n_fft)) * win[:, None])[
            :, None, :
        ].astype(y.dtype)
        lead = y.shape[:-1]
        ri = jax.lax.conv_general_dilated(
            y.reshape(-1, y.shape[-1], 1), kernel,
            window_strides=(hop_size,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )                                        # (prod(lead), T, 2F)
        ri = ri.reshape(*lead, *ri.shape[1:])
        re, im = ri[..., :F], ri[..., F:]
    else:
        frames = _frame(y, n_fft, hop_size) * jnp.asarray(win)
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    window: jnp.ndarray | None = None,
    center: bool = True,
):
    """torch.stft equivalent. y: (..., L) real -> complex (..., F, T)."""
    re, im = stft_ri(y, n_fft, hop_size, win_size, window=window, center=center)
    return jax.lax.complex(re, im)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of (..., T, n_fft) frames at stride hop -> (..., n_fft + hop*(T-1)).

    When hop divides n_fft (true for every config in this suite) this is a
    static shift-and-sum over r = n_fft//hop chunk lanes — no scatter.
    """
    *lead, T, n_fft = frames.shape
    if n_fft % hop == 0:
        r = n_fft // hop
        x = frames.reshape(*lead, T, r, hop)
        # out has T + r - 1 hop-chunks; chunk j = sum_k x[:, j-k, k, :]
        total = T + r - 1
        out = jnp.zeros((*lead, total, hop), frames.dtype)
        for k in range(r):
            out = out.at[..., k : k + T, :].add(x[..., :, k, :])
        return out.reshape(*lead, total * hop)
    # general fallback: scatter-add
    L = n_fft + hop * (T - 1)
    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros((*lead, L), frames.dtype)
    return out.at[..., idx.reshape(-1)].add(frames.reshape(*lead, -1))


def istft_ri(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """torch.istft equivalent on (real, imag) pairs, each (..., F, T).

    Synthesis: inverse real DFT per frame, multiply by (n_fft-padded)
    window, OLA, normalise by the OLA'd squared-window envelope, crop
    n_fft//2 per side when center=True. Default output length =
    hop_size * (T - 1). Matches reference Models/bsrnn.py:209-215 et al.
    """
    if window is None:
        # mirror torch: ones(win_length) zero-padded to n_fft
        win_np = _pad_window(np.ones(win_size, dtype=np.float32), n_fft)
    else:
        win_np = _pad_window(np.asarray(window), n_fft)
    win = jnp.asarray(win_np)

    xr = jnp.swapaxes(re, -1, -2)                # (..., T, F)
    xi = jnp.swapaxes(im, -1, -2)
    if _use_matmul_dft():
        basis = jnp.asarray(_irdft_basis_np(n_fft))
        ri = jnp.concatenate([xr, xi], axis=-1)  # (..., T, 2F)
        frames = jnp.einsum("...tk,kn->...tn", ri, basis,
                            precision=jax.lax.Precision.HIGHEST)
    else:
        frames = jnp.fft.irfft(jax.lax.complex(xr, xi), n=n_fft, axis=-1)
    frames = frames * win

    y = _overlap_add(frames, hop_size)           # (..., n_fft + hop*(T-1))

    T = re.shape[-1]
    env_frames = np.broadcast_to((win_np * win_np)[None, :], (T, n_fft))
    env = _overlap_add(jnp.asarray(env_frames), hop_size)
    y = y / jnp.where(env > 1e-11, env, 1.0)

    if center:
        pad = n_fft // 2
        y = y[..., pad:]
        target = length if length is not None else hop_size * (T - 1)
    else:
        target = length if length is not None else n_fft + hop_size * (T - 1)
    return y[..., :target]


def istft_frames(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int,
    win_size: int,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Windowed synthesis frames (..., T, n_fft): the pre-OLA stage of
    istft_ri, for streaming decode — the engine overlap-adds chunks of
    these with carried tails (StreamingOLA), which reproduces the
    offline istft exactly because a sample is only emitted once every
    window that touches it has arrived."""
    if window is None:
        win_np = _pad_window(np.ones(win_size, dtype=np.float32), n_fft)
    else:
        win_np = _pad_window(np.asarray(window), n_fft)
    xr = jnp.swapaxes(re, -1, -2)                # (..., T, F)
    xi = jnp.swapaxes(im, -1, -2)
    if _use_matmul_dft():
        basis = jnp.asarray(_irdft_basis_np(n_fft))
        ri = jnp.concatenate([xr, xi], axis=-1)
        frames = jnp.einsum("...tk,kn->...tn", ri, basis,
                            precision=jax.lax.Precision.HIGHEST)
    else:
        frames = jnp.fft.irfft(jax.lax.complex(xr, xi), n=n_fft, axis=-1)
    return frames * jnp.asarray(win_np)


class StreamingOLA:
    """Exact streaming overlap-add + squared-window normalisation.

    push() consumes windowed synthesis frames (B, c, n_fft) chunk by
    chunk and emits only the c*hop samples whose every contributing
    frame has arrived; the trailing (n_fft - hop) samples stay in a
    carried numerator/envelope tail. flush() finalises that tail. The
    concatenation of all emissions equals the offline istft_ri output
    BEFORE its center crop (the caller drops the first n_fft//2
    samples and trims to the target length).
    """

    def __init__(self, n_fft: int, hop_size: int, win_size: int,
                 window: np.ndarray | None = None):
        self.n_fft, self.hop = n_fft, hop_size
        if window is None:
            win = _pad_window(np.ones(win_size, dtype=np.float32), n_fft)
        else:
            win = _pad_window(np.asarray(window, np.float32), n_fft)
        self.env_frame = (win * win).astype(np.float64)
        self.num_tail: np.ndarray | None = None   # (B, n_fft - hop)
        self.env_tail: np.ndarray | None = None

    @staticmethod
    def _ola(frames: np.ndarray, hop: int) -> np.ndarray:
        B, T, n_fft = frames.shape
        L = n_fft + hop * (T - 1)
        out = np.zeros((B, L), frames.dtype)
        for t in range(T):
            out[:, t * hop : t * hop + n_fft] += frames[:, t]
        return out

    def push(self, frames: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames, np.float64)
        B, c, n_fft = frames.shape
        hop, ov = self.hop, self.n_fft - self.hop
        y = self._ola(frames, hop)                       # (B, hop*(c-1)+n_fft)
        env = self._ola(
            np.broadcast_to(self.env_frame, (1, c, n_fft)).copy(), hop)
        env = np.broadcast_to(env, y.shape).copy()
        if self.num_tail is not None:
            y[:, :ov] += self.num_tail
            env[:, :ov] += self.env_tail
        done_y, self.num_tail = y[:, : c * hop], y[:, c * hop :].copy()
        done_e, self.env_tail = env[:, : c * hop], env[:, c * hop :].copy()
        return (done_y / np.where(done_e > 1e-11, done_e, 1.0)).astype(np.float32)

    def flush(self) -> np.ndarray:
        if self.num_tail is None:
            return np.zeros((1, 0), np.float32)
        out = (self.num_tail /
               np.where(self.env_tail > 1e-11, self.env_tail, 1.0))
        self.num_tail = self.env_tail = None
        return out.astype(np.float32)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """torch.istft equivalent. spec: complex (..., F, T) -> (..., L) real."""
    return istft_ri(
        jnp.real(spec), jnp.imag(spec), n_fft, hop_size, win_size,
        window=window, center=center, length=length,
    )


# ---------------------------------------------------------------------------
# mel pipeline
# ---------------------------------------------------------------------------

def _safe_magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """sqrt(re^2 + im^2) with a well-defined gradient at 0.

    d/dx sqrt(x^2+y^2) is 0/0 at the origin; exact-zero spectrum bins
    (silence, padded regions) would propagate NaN into generator
    gradients through the mel loss. Clamping under the sqrt leaves the
    forward value numerically unchanged (floor 1e-12) and makes the
    gradient 0 at dead bins.
    """
    return jnp.sqrt(jnp.maximum(re * re + im * im, 1e-24))


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, 1e-5) * C) — reference dataset.py:27-28."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    return jnp.exp(x) / C


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
    center: bool = True,
) -> jnp.ndarray:
    """wave (..., L) -> log-mel (..., num_mels, T). Reference dataset.py:53-91."""
    basis = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    re, im = stft_ri(y, n_fft, hop_size, win_size, window=hann_window(win_size), center=center)
    mag = _safe_magnitude(re, im)
    mel = jnp.einsum("mf,...ft->...mt", basis, mag,
                     precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


def mel_spectrogram_np(
    y: np.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
    center: bool = True,
) -> np.ndarray:
    """Host-side numpy twin of mel_spectrogram (same torch.stft
    semantics, float64 accumulation -> float32).

    Inference feature prep: per-file device mel calls each pay a full
    remote-dispatch round trip and a compile per distinct utterance
    length; the host mel is exact (matches the device HIGHEST-precision
    path to ~1e-6 relative) and keeps the TPU free for the batched
    generator decode (engine.run_inference).
    """
    y = np.asarray(y, np.float64)
    if center:
        pad = n_fft // 2
        y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    win = _pad_window(_hann_np(win_size), n_fft).astype(np.float64)
    frames = _frame_np(y, n_fft, hop_size) * win
    mag = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))    # (..., T, F)
    mag = np.sqrt(np.maximum(mag * mag, 1e-24))            # _safe_magnitude
    basis = _mel_filterbank_np(sampling_rate, n_fft, num_mels,
                               float(fmin), float(fmax)).astype(np.float64)
    mel = np.einsum("mf,...tf->...mt", basis, mag)
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


def _frame_np(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


def inverse_mel(
    mel: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float,
) -> jnp.ndarray:
    """log-mel (..., M, T) -> pseudo magnitude spectrum (..., F, T).

    Reference dataset.py:94-120: pinv(mel_basis) @ exp(mel). Like the
    reference, the result may contain small negative values; callers
    apply abs().clamp_min(1e-5) (e.g. Models/bsrnn.py:153-166).
    """
    inv = inverse_mel_basis(sampling_rate, n_fft, num_mels, fmin, fmax)
    return jnp.einsum("fm,...mt->...ft", inv, dynamic_range_decompression(mel),
                      precision=jax.lax.Precision.HIGHEST)


def amp_pha_spectrum(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    eps: float = 1e-7,
):
    """wave (..., L) -> (log_amplitude, phase, real, imag), each (..., F, T).

    Reference dataset.py:123-139 (eps=1e-7; the joint-denoise duplicate
    uses eps=1e-5, pass it explicitly).
    """
    rea, imag = stft_ri(y, n_fft, hop_size, win_size, window=hann_window(win_size), center=True)
    log_amplitude = jnp.log(_safe_magnitude(rea, imag) + eps)
    phase = jnp.arctan2(imag, rea)
    return log_amplitude, phase, rea, imag
