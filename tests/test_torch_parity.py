"""Numeric output-parity for checkpoint importers, part 1: BSRNN.

Each test builds an INDEPENDENT torch implementation of the reference
architecture (same module/parameter naming as the reference state
dicts, written fresh from the architecture spec), randomises it,
imports the state dict with the nvse_tpu importer, and asserts the two
models produce the same outputs. This catches layout bugs (LSTM gate
order, grouped-band stacking, transpositions) that structural
name-checks cannot.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from nvse_tpu.models import build_generator
from nvse_tpu.models.bsrnn import band_plan
from nvse_tpu.utils import AttrDict
from nvse_tpu.utils.torch_import import import_bsrnn


# ---------------------------------------------------------------------------
# torch oracle: reference BSRNN topology (Models/bsrnn.py:7-217)
# ---------------------------------------------------------------------------

class _OracleResRNN(nn.Module):
    def __init__(self, size, hidden, causal):
        super().__init__()
        self.norm = nn.LayerNorm(size)
        self.rnn = nn.LSTM(size, hidden, 1, batch_first=True,
                           bidirectional=not causal)
        self.proj = nn.Linear(hidden * (2 - int(causal)), size)

    def forward(self, x):  # (B, G, S, C)
        B, G, S, C = x.shape
        y = self.norm(x).view(B * G, S, C)
        y, _ = self.rnn(y)
        return x + self.proj(y).view(B, G, S, C)


class _OracleBSNet(nn.Module):
    def __init__(self, dim, causal):
        super().__init__()
        self.time_rnn = _OracleResRNN(dim, dim, causal)
        self.band_rnn = _OracleResRNN(dim, dim, False)
        self.out_norm = nn.LayerNorm(dim)

    def forward(self, x):  # (B, nband, T, C)
        x = self.time_rnn(x)
        x = self.band_rnn(x.transpose(1, 2)).transpose(1, 2)
        return self.out_norm(x)


class OracleBSRNN(nn.Module):
    """Reference-topology BSRNN over a precomputed log-spectrum."""

    def __init__(self, h):
        super().__init__()
        self.h = h
        self.widths = band_plan(h.sampling_rate, h.n_fft)
        C = h.feature_dim
        self.encoder = nn.ModuleList(
            nn.Sequential(nn.LayerNorm(w), nn.Linear(w, C)) for w in self.widths)
        self.separator = nn.ModuleList(
            _OracleBSNet(C, h.causal) for _ in range(h.num_repeat))
        self.decoder_mag = nn.ModuleList(
            nn.Sequential(nn.LayerNorm(C), nn.Linear(C, 4 * C), nn.GELU(),
                          nn.Linear(4 * C, w)) for w in self.widths)
        self.decoder_phase = nn.ModuleList(
            nn.Sequential(nn.LayerNorm(C), nn.Linear(C, 4 * C), nn.GELU(),
                          nn.Linear(4 * C, 2 * w)) for w in self.widths)

    def forward(self, log_spec):  # (B, F, T)
        feats = []
        off = 0
        for enc, w in zip(self.encoder, self.widths):
            feats.append(enc(log_spec[:, off : off + w].transpose(-2, -1)))
            off += w
        x = torch.stack(feats, dim=1)  # (B, nband, T, C)
        for blk in self.separator:
            x = blk(x)

        resi, phase = [], []
        for i, w in enumerate(self.widths):
            resi.append(self.decoder_mag[i](x[:, i]))
            comp = self.decoder_phase[i](x[:, i])
            phase.append(torch.atan2(comp[..., w:], comp[..., :w]))
        resi = torch.cat(resi, dim=-1).transpose(-2, -1)     # (B, F, T)
        phase = torch.cat(phase, dim=-1).transpose(-2, -1)

        mag = torch.exp(resi + log_spec)
        logamp = torch.log(torch.clamp(mag, min=1e-5))
        rea = mag * torch.cos(phase)
        imag = mag * torch.sin(phase)
        wav = torch.istft(
            torch.complex(rea, imag), n_fft=self.h.n_fft,
            hop_length=self.h.hop_size, win_length=self.h.win_size,
            window=torch.hann_window(self.h.win_size))
        return logamp, phase, rea, imag, wav


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.slow
def test_bsrnn_import_output_parity(causal):
    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=2, dropout=0.0,
        causal=causal, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
    ))
    torch.manual_seed(0)
    oracle = OracleBSRNN(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 9)).astype(np.float32) - 4.0)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_bsrnn(sd, variables["params"], h)

    ours = gen.apply({"params": params}, mel)
    # feed the oracle the SAME log pseudo-inverse-mel spectrum the flax
    # model computes internally (inverse_mel itself is golden-tested
    # separately in test_spectral.py)
    from nvse_tpu.ops import inverse_mel
    inv = inverse_mel(mel, h.n_fft, h.num_mels, h.sampling_rate,
                      h.hop_size, h.win_size, h.fmin, h.fmax)
    log_spec = torch.from_numpy(
        np.log(np.clip(np.abs(np.asarray(inv)), 1e-5, None)))
    with torch.no_grad():
        theirs = oracle(log_spec)

    names = ("logamp", "phase", "rea", "imag", "wav")
    for name, a, b in zip(names, ours, theirs):
        a = np.asarray(a)
        b = b.numpy()
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if name == "phase":
            # atan2 branch-cut: compare the wrapped difference instead
            d = np.angle(np.exp(1j * (a.astype(np.float64) - b)))
            np.testing.assert_allclose(d, 0.0, atol=5e-3, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4, err_msg=name)


# ---------------------------------------------------------------------------
# torch oracle: reference GCRN topology (Models/gcrn.py:7-220)
# ---------------------------------------------------------------------------

class _OracleGlu2d(nn.Module):
    def __init__(self, ci, co, k, s, transpose=False):
        super().__init__()
        mk = nn.ConvTranspose2d if transpose else nn.Conv2d
        self.conv1 = mk(ci, co, k, s)
        self.conv2 = mk(ci, co, k, s)

    def forward(self, x):
        return self.conv1(x) * torch.sigmoid(self.conv2(x))


class _OracleGLSTM(nn.Module):
    def __init__(self, hidden=896, groups=2):
        super().__init__()
        hs = hidden // groups
        self.lstm_list1 = nn.ModuleList(nn.LSTM(hs, hs, 1, batch_first=True)
                                        for _ in range(groups))
        self.lstm_list2 = nn.ModuleList(nn.LSTM(hs, hs, 1, batch_first=True)
                                        for _ in range(groups))
        self.ln1 = nn.LayerNorm(hidden)
        self.ln2 = nn.LayerNorm(hidden)
        self.groups = groups

    def forward(self, x):  # (B, C, T, F)
        B, C, T, F = x.shape
        out = x.transpose(1, 2).reshape(B, T, C * F)
        chunks = out.chunk(self.groups, dim=-1)
        out = torch.stack([m(c)[0] for m, c in zip(self.lstm_list1, chunks)], dim=-1)
        out = self.ln1(out.flatten(-2))
        chunks = out.chunk(self.groups, dim=-1)
        out = torch.cat([m(c)[0] for m, c in zip(self.lstm_list2, chunks)], dim=-1)
        out = self.ln2(out)
        return out.view(B, T, C, F).transpose(1, 2)


class OracleGCRN(nn.Module):
    """Reference-topology GCRN over a precomputed inverse-mel amplitude."""

    def __init__(self, h):
        super().__init__()
        self.h = h
        enc = [(1, 16, 5), (16, 32, 3), (32, 64, 3), (64, 128, 3),
               (128, 128, 3), (128, 128, 3)]
        fr = [255, 127, 63, 31, 15, 7]
        for i, (ci, co, k) in enumerate(enc):
            setattr(self, f"conv{i+1}", _OracleGlu2d(ci, co, (1, k), (1, 2)))
            setattr(self, f"bn{i+1}", nn.LayerNorm(fr[i]))
        self.glstm = _OracleGLSTM()
        dec = [(256, 128, 3), (256, 128, 3), (256, 64, 3), (128, 32, 3), (64, 16, 3)]
        dfr = [15, 31, 63, 127, 255]
        for br, last_co in ((1, 1), (2, 2)):
            for step in range(6):
                k = 6 - step
                ci, co, ks = dec[step] if step < 5 else (32, last_co, 5)
                f_out = dfr[step] if step < 5 else 513
                setattr(self, f"conv{k}_t_{br}",
                        _OracleGlu2d(ci, co, (1, ks), (1, 2), transpose=True))
                setattr(self, f"bn{k}_t_{br}", nn.LayerNorm(f_out))
        self.fc1 = nn.Linear(513, 513)
        self.fc2 = nn.Linear(513, 513)

    def forward(self, inv_amp):  # (B, F, T) amplitude
        elu = torch.nn.functional.elu
        log_spec = inv_amp.log()
        x = log_spec.transpose(-2, -1).unsqueeze(1)  # (B, 1, T, F)
        skips = []
        for i in range(6):
            x = elu(getattr(self, f"bn{i+1}")(getattr(self, f"conv{i+1}")(x)))
            skips.append(x)
        out = torch.cat((self.glstm(x), x), dim=1)

        def run_branch(x, br):
            for step in range(6):
                k = 6 - step
                y = getattr(self, f"bn{k}_t_{br}")(getattr(self, f"conv{k}_t_{br}")(x))
                x = elu(torch.cat((y, skips[4 - step]), dim=1) if step < 5 else y)
            return x

        d1 = run_branch(out, 1)  # (B, 1, T, 513)
        d2 = run_branch(out, 2)  # (B, 2, T, 513)
        resi = self.fc1(d1).transpose(-2, -1).squeeze(1)
        mag = torch.exp(resi + log_spec)
        real, imag_p = self.fc2(d2).transpose(-2, -1).chunk(2, dim=1)
        phase = torch.atan2(imag_p.squeeze(1), real.squeeze(1))
        rea = mag * torch.cos(phase)
        imag = mag * torch.sin(phase)
        logamp = torch.log(mag + 1e-5)
        wav = torch.istft(torch.complex(rea, imag), n_fft=self.h.n_fft,
                          hop_length=self.h.hop_size, win_length=self.h.win_size,
                          window=torch.hann_window(self.h.win_size))
        return logamp, phase, rea, imag, wav


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_gcrn_import_output_parity():
    from nvse_tpu.utils.torch_import import import_gcrn

    h = AttrDict(dict(model_name="GCRN", sampling_rate=22050, n_fft=1024,
                      hop_size=256, win_size=1024, num_mels=80, fmin=0, fmax=8000))
    torch.manual_seed(1)
    oracle = OracleGCRN(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(1)
    log_spec = rng.standard_normal((1, 513, 5)).astype(np.float32) * 0.5 - 2.0
    inv_amp = np.exp(log_spec)

    mel = jnp.zeros((1, 80, 5))
    variables = gen.init(jax.random.PRNGKey(0), mel, jnp.asarray(inv_amp))
    params = import_gcrn(sd, variables["params"], h)
    ours = gen.apply({"params": params}, mel, jnp.asarray(inv_amp))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(inv_amp))

    for name, a, b in zip(("logamp", "phase", "rea", "imag", "wav"), ours, theirs):
        a, b = np.asarray(a), b.numpy()
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if name == "phase":
            d = np.angle(np.exp(1j * (a.astype(np.float64) - b)))
            np.testing.assert_allclose(d, 0.0, atol=5e-3, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=3e-4, err_msg=name)


# ---------------------------------------------------------------------------
# torch oracle: reference ConvTasNet topology (Models/convtasnet.py:8-328)
# ---------------------------------------------------------------------------

class _OracleGLN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim, 1))
        self.bias = nn.Parameter(torch.zeros(dim, 1))

    def forward(self, x):  # (B, C, L)
        mean = torch.mean(x, (1, 2), keepdim=True)
        var = torch.mean((x - mean) ** 2, (1, 2), keepdim=True)
        return self.weight * (x - mean) / torch.sqrt(var + 1e-5) + self.bias


class _OracleTCNBlock(nn.Module):
    def __init__(self, ci, co, k, dilation, skip_con):
        super().__init__()
        self.conv1x1 = nn.Conv1d(ci, co, 1)
        self.PReLU_1 = nn.PReLU()
        self.norm_1 = _OracleGLN(co)
        pad = (dilation * (k - 1)) // 2
        self.dwconv = nn.Conv1d(co, co, k, groups=co, padding=pad, dilation=dilation)
        self.PReLU_2 = nn.PReLU()
        self.norm_2 = _OracleGLN(co)
        self.Sc_conv = nn.Conv1d(co, ci, 1)
        self.skip_con = skip_con
        if skip_con:
            self.skip_conv = nn.Conv1d(co, ci, 1)

    def forward(self, x):
        # PReLU_2/norm_2 are constructed but NOT called — matching the
        # actual reference forward (convtasnet.py:150-167), which feeds
        # the dwconv output straight to the residual/skip 1x1s
        c = self.norm_1(self.PReLU_1(self.conv1x1(x)))
        c = self.dwconv(c)
        if self.skip_con:
            return x + self.Sc_conv(c), self.skip_conv(c)
        return x + self.Sc_conv(c), None


class OracleConvTasNet(nn.Module):
    """Reference-topology ConvTasNet over a precomputed inverse-mel
    amplitude (zero initial phase for determinism)."""

    def __init__(self, h):
        super().__init__()
        self.h = h
        self.encoder = nn.Conv1d(1, h.N, h.L, stride=h.L // 2)
        self.LayerN_S = _OracleGLN(h.N)
        self.BottleN_S = nn.Conv1d(h.N, h.B, 1)
        self.separation = nn.ModuleList(
            _OracleTCNBlock(h.B, h.H, h.P, 2 ** i, h.skip_con)
            for _ in range(h.R) for i in range(h.X))
        self.gen_masks = nn.Conv1d(h.B, h.num_spks * h.N, 1)
        self.decoder = nn.ConvTranspose1d(h.N, 1, h.L, stride=h.L // 2)

    def forward(self, inv_amp):  # (B, F, T) amplitude
        wav0 = torch.istft(torch.complex(inv_amp, torch.zeros_like(inv_amp)),
                           n_fft=self.h.n_fft, hop_length=self.h.hop_size,
                           win_length=self.h.win_size,
                           window=torch.hann_window(self.h.win_size))
        w = self.encoder(wav0.unsqueeze(1))
        e = self.BottleN_S(self.LayerN_S(w))
        skip_sum = torch.zeros_like(e)
        for blk in self.separation:
            e, skip = blk(e)
            if self.h.skip_con:
                skip_sum = skip_sum + skip
        m = self.gen_masks(skip_sum if self.h.skip_con else e)
        return self.decoder(w * m).squeeze(1)


def test_convtasnet_import_output_parity():
    from nvse_tpu.utils.torch_import import import_convtasnet

    h = AttrDict(dict(
        model_name="ConvTasNet", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        N=16, L=16, B=8, H=16, P=3, X=2, R=2, norm="gln", num_spks=1,
        activate="relu", causal=False, skip_con=True, init_phase="zero",
    ))
    torch.manual_seed(2)
    oracle = OracleConvTasNet(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(2)
    log_spec = rng.standard_normal((2, 513, 9)).astype(np.float32) * 0.5 - 2.0
    inv_amp = np.exp(log_spec)
    mel = jnp.zeros((2, 80, 9))
    variables = gen.init(jax.random.PRNGKey(0), mel, jnp.asarray(inv_amp))
    params = import_convtasnet(sd, variables["params"], h)
    ours = np.asarray(gen.apply({"params": params}, mel, jnp.asarray(inv_amp)))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(inv_amp)).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-4)


# ---------------------------------------------------------------------------
# torch oracles: APNet / APNet2 / FreeV (Models/apnet.py:25-157,
# apnet2.py:13-188, freeV.py:69-187)
# ---------------------------------------------------------------------------

from torch.nn.utils import weight_norm


def _gp(k, d=1):
    return (k * d - d) // 2


class _OracleWNResBlock(nn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.convs1 = nn.ModuleList(
            weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d, padding=_gp(k, d)))
            for d in dils)
        self.convs2 = nn.ModuleList(
            weight_norm(nn.Conv1d(ch, ch, k, 1, padding=_gp(k))) for _ in dils)

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(torch.nn.functional.leaky_relu(
                c1(torch.nn.functional.leaky_relu(x, 0.1)), 0.1))
            x = xt + x
        return x


def _tf_synth(h, logamp, R, I):
    pha = torch.atan2(I, R)
    rea = torch.exp(logamp) * torch.cos(pha)
    imag = torch.exp(logamp) * torch.sin(pha)
    wav = torch.istft(torch.complex(rea, imag), h.n_fft,
                      hop_length=h.hop_size, win_length=h.win_size,
                      window=torch.hann_window(h.win_size))
    return logamp, pha, rea, imag, wav


class OracleAPNet(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.h = h
        F_bins = h.n_fft // 2 + 1
        self.ASP_input_conv = weight_norm(nn.Conv1d(
            h.num_mels, h.ASP_channel, h.ASP_input_conv_kernel_size, 1,
            padding=_gp(h.ASP_input_conv_kernel_size)))
        self.PSP_input_conv = weight_norm(nn.Conv1d(
            h.num_mels, h.PSP_channel, h.PSP_input_conv_kernel_size, 1,
            padding=_gp(h.PSP_input_conv_kernel_size)))
        self.ASP_ResNet = nn.ModuleList(
            _OracleWNResBlock(h.ASP_channel, k, d)
            for k, d in zip(h.ASP_resblock_kernel_sizes, h.ASP_resblock_dilation_sizes))
        self.PSP_ResNet = nn.ModuleList(
            _OracleWNResBlock(h.PSP_channel, k, d)
            for k, d in zip(h.PSP_resblock_kernel_sizes, h.PSP_resblock_dilation_sizes))
        self.ASP_output_conv = weight_norm(nn.Conv1d(
            h.ASP_channel, F_bins, h.ASP_output_conv_kernel_size, 1,
            padding=_gp(h.ASP_output_conv_kernel_size)))
        self.PSP_output_R_conv = weight_norm(nn.Conv1d(
            h.PSP_channel, F_bins, h.PSP_output_R_conv_kernel_size, 1,
            padding=_gp(h.PSP_output_R_conv_kernel_size)))
        self.PSP_output_I_conv = weight_norm(nn.Conv1d(
            h.PSP_channel, F_bins, h.PSP_output_I_conv_kernel_size, 1,
            padding=_gp(h.PSP_output_I_conv_kernel_size)))

    def forward(self, mel):
        lrelu = torch.nn.functional.leaky_relu

        def branch(inp_conv, blocks, out_convs):
            y = inp_conv(mel)
            acc = None
            for blk in blocks:
                o = blk(y)
                acc = o if acc is None else acc + o
            y = lrelu(acc / len(blocks))  # default slope 0.01 (apnet.py:131)
            return [c(y) for c in out_convs]

        (logamp,) = branch(self.ASP_input_conv, self.ASP_ResNet, [self.ASP_output_conv])
        R, I = branch(self.PSP_input_conv, self.PSP_ResNet,
                      [self.PSP_output_R_conv, self.PSP_output_I_conv])
        return _tf_synth(self.h, logamp, R, I)


class _OracleGRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(1, 1, dim))
        self.beta = nn.Parameter(torch.zeros(1, 1, dim))

    def forward(self, x):  # (B, T, C); norm over time (apnet2.py:22-24)
        gx = torch.norm(x, p=2, dim=1, keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class _OracleConvNeXt(nn.Module):
    def __init__(self, dim, mid):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, mid)
        self.grn = _OracleGRN(mid)
        self.pwconv2 = nn.Linear(mid, dim)

    def forward(self, x):  # (B, C, T)
        r = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.pwconv2(self.grn(torch.nn.functional.gelu(self.pwconv1(self.norm(x)))))
        return r + x.transpose(1, 2)


class OracleAPNet2(nn.Module):
    def __init__(self, h, dim=512, layers=8, mid=1536):
        super().__init__()
        self.h = h
        F_bins = h.n_fft // 2 + 1
        self.ASP_input_conv = nn.Conv1d(h.num_mels, h.ASP_channel,
                                        h.ASP_input_conv_kernel_size, 1,
                                        padding=_gp(h.ASP_input_conv_kernel_size))
        self.PSP_input_conv = nn.Conv1d(h.num_mels, h.PSP_channel,
                                        h.PSP_input_conv_kernel_size, 1,
                                        padding=_gp(h.PSP_input_conv_kernel_size))
        self.ASP_output_conv = nn.Conv1d(h.ASP_channel, F_bins,
                                         h.ASP_output_conv_kernel_size, 1,
                                         padding=_gp(h.ASP_output_conv_kernel_size))
        self.PSP_output_R_conv = nn.Conv1d(dim, F_bins,
                                           h.PSP_output_R_conv_kernel_size, 1,
                                           padding=_gp(h.PSP_output_R_conv_kernel_size))
        self.PSP_output_I_conv = nn.Conv1d(dim, F_bins,
                                           h.PSP_output_I_conv_kernel_size, 1,
                                           padding=_gp(h.PSP_output_I_conv_kernel_size))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList(_OracleConvNeXt(dim, mid) for _ in range(layers))
        self.convnext2 = nn.ModuleList(_OracleConvNeXt(dim, mid) for _ in range(layers))
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)
        self.final_layer_norm2 = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, mel):
        a = self.ASP_input_conv(mel)
        a = self.norm2(a.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext2:
            a = blk(a)
        a = self.final_layer_norm2(a.transpose(1, 2)).transpose(1, 2)
        logamp = self.ASP_output_conv(a)

        p = self.PSP_input_conv(mel)
        p = self.norm(p.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext:
            p = blk(p)
        p = self.final_layer_norm(p.transpose(1, 2)).transpose(1, 2)
        return _tf_synth(self.h, logamp,
                         self.PSP_output_R_conv(p), self.PSP_output_I_conv(p))


class OracleFreeV(nn.Module):
    def __init__(self, h, dim=512, layers=8, mid=1536):
        super().__init__()
        self.h = h
        F_bins = h.n_fft // 2 + 1
        self.PSP_input_conv = nn.Conv1d(h.num_mels, h.PSP_channel,
                                        h.PSP_input_conv_kernel_size, 1,
                                        padding=_gp(h.PSP_input_conv_kernel_size))
        self.PSP_output_R_conv = nn.Conv1d(dim, F_bins,
                                           h.PSP_output_R_conv_kernel_size, 1,
                                           padding=_gp(h.PSP_output_R_conv_kernel_size))
        self.PSP_output_I_conv = nn.Conv1d(dim, F_bins,
                                           h.PSP_output_I_conv_kernel_size, 1,
                                           padding=_gp(h.PSP_output_I_conv_kernel_size))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList(_OracleConvNeXt(dim, mid) for _ in range(layers))
        self.convnext2 = nn.ModuleList([_OracleConvNeXt(h.ASP_channel, mid)])
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, mel, inv_amp):
        logamp = inv_amp.log()
        for blk in self.convnext2:
            logamp = blk(logamp)  # (B, 513, T): dwconv over T
        p = self.PSP_input_conv(mel)
        p = self.norm(p.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext:
            p = blk(p)
        p = self.final_layer_norm(p.transpose(1, 2)).transpose(1, 2)
        return _tf_synth(self.h, logamp,
                         self.PSP_output_R_conv(p), self.PSP_output_I_conv(p))


def _assert_tf_outputs_match(ours, theirs, atol=3e-4):
    for name, a, b in zip(("logamp", "phase", "rea", "imag", "wav"), ours, theirs):
        a, b = np.asarray(a), b.numpy()
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if name == "phase":
            d = np.angle(np.exp(1j * (a.astype(np.float64) - b)))
            np.testing.assert_allclose(d, 0.0, atol=5e-3, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=atol, err_msg=name)


def test_apnet_import_output_parity():
    from nvse_tpu.utils.torch_import import import_apnet

    h = AttrDict(dict(
        model_name="APNet", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        ASP_channel=32, ASP_resblock_kernel_sizes=[3, 5],
        ASP_resblock_dilation_sizes=[[1, 3], [1, 3]],
        ASP_input_conv_kernel_size=7, ASP_output_conv_kernel_size=7,
        PSP_channel=32, PSP_resblock_kernel_sizes=[3, 5],
        PSP_resblock_dilation_sizes=[[1, 3], [1, 3]],
        PSP_input_conv_kernel_size=7, PSP_output_R_conv_kernel_size=7,
        PSP_output_I_conv_kernel_size=7,
    ))
    torch.manual_seed(3)
    oracle = OracleAPNet(h).eval()
    with torch.no_grad():  # spread weights so outputs aren't ~0
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(3)
    mel_np = rng.standard_normal((2, 80, 9)).astype(np.float32) - 4.0
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_apnet(sd, variables["params"], h)
    ours = gen.apply({"params": params}, mel)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(mel_np))
    _assert_tf_outputs_match(ours, theirs)


def test_apnet2_import_output_parity():
    from nvse_tpu.utils.torch_import import import_apnet2

    h = AttrDict(dict(
        model_name="APNet2", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        ASP_channel=512, ASP_input_conv_kernel_size=7,
        ASP_output_conv_kernel_size=7, PSP_channel=512,
        PSP_input_conv_kernel_size=7, PSP_output_R_conv_kernel_size=7,
        PSP_output_I_conv_kernel_size=7,
    ))
    torch.manual_seed(4)
    oracle = OracleAPNet2(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(4)
    mel_np = rng.standard_normal((1, 80, 5)).astype(np.float32) - 4.0
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_apnet2(sd, variables["params"], h)
    ours = gen.apply({"params": params}, mel)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(mel_np))
    _assert_tf_outputs_match(ours, theirs)


def test_freev_import_output_parity():
    from nvse_tpu.utils.torch_import import import_freev

    h = AttrDict(dict(
        model_name="FreeV", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        ASP_channel=513, PSP_channel=512, PSP_input_conv_kernel_size=7,
        PSP_output_R_conv_kernel_size=7, PSP_output_I_conv_kernel_size=7,
    ))
    torch.manual_seed(5)
    oracle = OracleFreeV(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(5)
    mel_np = rng.standard_normal((1, 80, 5)).astype(np.float32) - 4.0
    log_spec = rng.standard_normal((1, 513, 5)).astype(np.float32) * 0.5 - 2.0
    inv_amp = np.exp(log_spec)
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel, jnp.asarray(inv_amp))
    params = import_freev(sd, variables["params"], h)
    ours = gen.apply({"params": params}, mel, jnp.asarray(inv_amp))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(mel_np), torch.from_numpy(inv_amp))
    _assert_tf_outputs_match(ours, theirs)


# ---------------------------------------------------------------------------
# torch oracle: HD-Demucs (Models/hddemucas.py:22-370)
# ---------------------------------------------------------------------------

def _sinc_kernel(zeros=56):
    win = torch.hann_window(4 * zeros + 1, periodic=False)[1::2]
    t = torch.linspace(-zeros + 0.5, zeros - 0.5, 2 * zeros) * np.pi
    return (torch.where(t == 0, torch.tensor(1.0), torch.sin(t) / t) * win).view(1, 1, -1)


def _t_upsample2(x, zeros=56):
    *other, time = x.shape
    out = torch.nn.functional.conv1d(
        x.reshape(-1, 1, time), _sinc_kernel(zeros), padding=zeros)[..., 1:].view(*other, time)
    return torch.stack([x, out], dim=-1).view(*other, -1)


def _t_downsample2(x, zeros=56):
    if x.shape[-1] % 2 != 0:
        x = torch.nn.functional.pad(x, (0, 1))
    xeven, xodd = x[..., ::2], x[..., 1::2]
    *other, time = xodd.shape
    out = xeven + torch.nn.functional.conv1d(
        xodd.reshape(-1, 1, time), _sinc_kernel(zeros), padding=zeros)[..., :-1].view(*other, time)
    return out.view(*other, -1) * 0.5


class OracleHDDemucas(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.h = h
        self.encoder = nn.ModuleList()
        self.decoder_mask = nn.ModuleList()
        self.decoder_map = nn.ModuleList()
        chin, chout, hidden = h.chin, h.chout, h.hidden
        dil = [1, 3, 5, 7, 9]
        self.chans = []
        for index in range(h.depth):
            self.chans.append((chin, chout, hidden))
            self.encoder.append(nn.Sequential(
                nn.Conv1d(chin, hidden, h.kernel_size, h.stride), nn.ReLU(),
                nn.Conv1d(hidden, 2 * hidden, 1), nn.GLU(1)))
            mask = [nn.Conv1d(hidden, 2 * hidden, 1), nn.GLU(1),
                    nn.ConvTranspose1d(hidden, chout, h.kernel_size, h.stride)]
            if index > 0:
                mask.append(nn.Sigmoid())
            self.decoder_mask.insert(0, nn.Sequential(*mask))
            mp = [nn.Conv1d(hidden, 2 * hidden, 1), nn.GLU(1),
                  nn.ConvTranspose1d(hidden, chout, h.kernel_size, h.stride,
                                     dilation=dil[index], padding=7 * index)]
            if index > 0:
                mp.append(nn.ReLU())
            self.decoder_map.insert(0, nn.Sequential(*mp))
            chout = hidden
            chin = hidden
            hidden = min(int(h.growth * hidden), h.max_hidden)

        class _BL(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.lstm = nn.LSTM(bidirectional=True, num_layers=2,
                                    hidden_size=dim, input_size=dim)
                self.linear = nn.Linear(2 * dim, dim)

        self.lstm = _BL(chin)
        self.fb_conv1 = nn.Sequential(nn.Conv1d(2, 2, 3, 1, padding=1), nn.LeakyReLU())
        self.fb_conv2 = nn.Sequential(nn.Conv1d(2, 2, 3, 1, padding=1), nn.LeakyReLU())
        self.fb_conv3 = nn.Sequential(nn.Conv1d(2, 2, 3, 1, padding=1), nn.Sigmoid())
        self.weight = nn.Parameter(torch.tensor(0.5))

    def _valid_length(self, length):
        import math as m
        h = self.h
        length = m.ceil(length * h.resample)
        for _ in range(h.depth):
            length = max(m.ceil((length - h.kernel_size) / h.stride) + 1, 1)
        for _ in range(h.depth):
            length = (length - 1) * h.stride + h.kernel_size
        return int(m.ceil(length / h.resample))

    def forward(self, inv_amp):
        h = self.h
        wav0 = torch.istft(torch.complex(inv_amp, torch.zeros_like(inv_amp)),
                           n_fft=h.n_fft, hop_length=h.hop_size,
                           win_length=h.win_size,
                           window=torch.hann_window(h.win_size))
        mix = wav0.unsqueeze(1)
        length = mix.shape[-1]
        x = torch.nn.functional.pad(mix, (0, self._valid_length(length) - length))
        for _ in range(h.resample // 2):
            x = _t_upsample2(x)
        x_us = x
        skips_mask = []
        for enc in self.encoder:
            x = enc(x)
            skips_mask.append(x)
        x = x.permute(2, 0, 1)
        x, _ = self.lstm.lstm(x)
        x = self.lstm.linear(x).permute(1, 2, 0)

        skips_map = []
        x_mask = x
        for dec in self.decoder_mask:
            x_mask = dec(x_mask + skips_mask.pop(-1))
            skips_map.append(x_mask)
        x_map = x
        for dec in self.decoder_map:
            x_map = dec(x_map) + skips_map.pop(0)

        d_s = x_mask * x_us
        d_r = x_map
        x_fb = self.fb_conv3(self.fb_conv2(self.fb_conv1(torch.cat((d_s, d_r), 1))))
        out = (d_s * (1 - self.weight) * x_fb[:, :1] +
               d_r * self.weight * x_fb[:, 1:])
        for _ in range(h.resample // 2):
            out = _t_downsample2(out)
        return out[..., :length].squeeze(1)


def test_hddemucas_import_output_parity():
    from nvse_tpu.utils.torch_import import import_hddemucas

    h = AttrDict(dict(model_name="HDDemucas", sampling_rate=22050, n_fft=1024,
                      hop_size=256, win_size=1024, num_mels=80, fmin=0, fmax=8000,
                      chin=1, chout=1, hidden=8, depth=2, kernel_size=8, stride=4,
                      causal=False, resample=4, growth=2, max_hidden=10000,
                      normalize=False, glu=True, rescale=0.1, floor=1e-3,
                      init_phase="zero"))
    torch.manual_seed(6)
    oracle = OracleHDDemucas(h).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    gen, _ = build_generator(h)
    rng = np.random.default_rng(6)
    log_spec = rng.standard_normal((2, 513, 5)).astype(np.float32) * 0.5 - 2.0
    inv_amp = np.exp(log_spec)
    mel = jnp.zeros((2, 80, 5))
    variables = gen.init(jax.random.PRNGKey(0), mel, jnp.asarray(inv_amp))
    params = import_hddemucas(sd, variables["params"], h)
    ours = np.asarray(gen.apply({"params": params}, mel, jnp.asarray(inv_amp)))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(inv_amp)).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-4)


# ---------------------------------------------------------------------------
# torch oracle: reference iSTFTNet topology (Models/istftnet.py:271-328)
# ---------------------------------------------------------------------------

class OracleISTFTNet(nn.Module):
    """MRF trunk + reflection pad + (n_fft+2)-ch post conv + exp/sin
    heads + torch.istft (hann, hop 4) — the reference forward verbatim
    re-derived (istftnet.py:271-318)."""

    def __init__(self, h):
        super().__init__()
        from torch.nn.utils import weight_norm
        from test_torch_import import TorchResBlock

        self.num_kernels = len(h.resblock_kernel_sizes)
        self.conv_pre = weight_norm(
            nn.Conv1d(80, h.upsample_initial_channel, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                h.upsample_initial_channel // (2 ** i),
                h.upsample_initial_channel // (2 ** (i + 1)),
                k, u, padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, k, d))
        self.post_n_fft = h.gen_istft_n_fft
        self.hop = h.gen_istft_hop_size
        self.conv_post = weight_norm(
            nn.Conv1d(ch, self.post_n_fft + 2, 7, 1, padding=3))
        self.window = torch.hann_window(self.post_n_fft)

    def forward(self, x):
        import torch.nn.functional as F
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i](F.leaky_relu(x, 0.1))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)                       # default slope 0.01
        x = F.pad(x, (1, 0), mode="reflect")      # ReflectionPad1d((1, 0))
        x = self.conv_post(x)
        spec = torch.exp(x[:, : self.post_n_fft // 2 + 1, :])
        phase = torch.sin(x[:, self.post_n_fft // 2 + 1:, :])
        wav = torch.istft(spec * torch.exp(phase * 1j), self.post_n_fft,
                          self.hop, self.post_n_fft, window=self.window)
        return wav


def test_istftnet_import_output_parity():
    from nvse_tpu.utils.torch_import import import_mrf_generator

    h = AttrDict(dict(
        model_name="iSTFTNet", resblock="1",
        upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 3], [1, 3]],
        gen_istft_n_fft=16, gen_istft_hop_size=4,
        num_mels=80, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, fmin=0, fmax=8000, segment_size=2048,
    ))
    torch.manual_seed(0)
    tmodel = OracleISTFTNet(h).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    gen, _ = build_generator(h)
    mel_np = np.random.default_rng(0).standard_normal((2, 80, 17)).astype(np.float32) - 4
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_mrf_generator(sd, variables["params"], h)

    ours = np.asarray(gen.apply({"params": params}, mel))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(mel_np)).numpy()
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-4)


# ---------------------------------------------------------------------------
# torch oracle: Vocos (no reference impl — published architecture with
# APNet2-style ConvNeXt/GRN blocks, matching models/vocos.py)
# ---------------------------------------------------------------------------

class _OracleVocosBlock(nn.Module):
    def __init__(self, dim, mid):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, mid)
        self.grn = _OracleGRN(mid)
        self.pwconv2 = nn.Linear(mid, dim)

    def forward(self, x):  # (B, C, T)
        r = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.norm(x)
        x = torch.nn.functional.gelu(self.pwconv1(x))
        x = self.pwconv2(self.grn(x))
        return r + x.transpose(1, 2)


class OracleVocos(nn.Module):
    def __init__(self, h):
        super().__init__()
        dim = h.vocos_dim
        self.embed = nn.Conv1d(h.num_mels, dim, 7, padding=3)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.convnext = nn.ModuleList(
            [_OracleVocosBlock(dim, h.vocos_intermediate_dim)
             for _ in range(h.vocos_num_layers)])
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, h.n_fft + 2)
        self.h = h
        self.window = torch.hann_window(h.win_size)

    def forward(self, mel):  # (B, M, T)
        h = self.h
        x = self.embed(mel)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for blk in self.convnext:
            x = blk(x)
        x = self.final_layer_norm(x.transpose(1, 2))
        head = self.head(x).transpose(1, 2)                # (B, n_fft+2, T)
        F_bins = h.n_fft // 2 + 1
        logamp = head[:, :F_bins]
        phase = head[:, F_bins:]
        amp = torch.exp(torch.clamp(logamp, max=12.0))
        rea = amp * torch.cos(phase)
        imag = amp * torch.sin(phase)
        wav = torch.istft(torch.complex(rea, imag), h.n_fft, h.hop_size,
                          h.win_size, window=self.window)
        return torch.log(torch.clamp(amp, min=1e-5)), phase, rea, imag, wav


def test_vocos_import_output_parity():
    from nvse_tpu.utils.torch_import import import_vocos

    h = AttrDict(dict(
        model_name="Vocos", num_mels=80, sampling_rate=22050, n_fft=1024,
        hop_size=256, win_size=1024, fmin=0, fmax=8000, segment_size=2048,
        vocos_dim=32, vocos_num_layers=2, vocos_intermediate_dim=96,
    ))
    torch.manual_seed(0)
    tmodel = OracleVocos(h).eval()
    for blk in tmodel.convnext:  # GRN params init to zero — randomise so
        blk.grn.gamma.data.normal_(0.0, 0.5)  # the mapping is value-tested
        blk.grn.beta.data.normal_(0.0, 0.5)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    gen, _ = build_generator(h)
    mel_np = np.random.default_rng(1).standard_normal((2, 80, 13)).astype(np.float32) - 4
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_vocos(sd, variables["params"], h)

    ours = gen.apply({"params": params}, mel)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(mel_np))
    _assert_tf_outputs_match(ours, theirs)
