"""Checkpoint-import parity: torch MRF generator -> flax, outputs match.

Builds an independent torch implementation of the standard HiFiGAN
generator topology (conv_pre + ConvTranspose upsamplers + MRF resblocks
+ conv_post, all weight-normed — the public architecture the reference
also implements), exports its state dict, imports it with
import_mrf_generator, and checks the two models produce the same
waveform. This validates every layout conversion end-to-end.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from nvse_tpu.models import build_generator
from nvse_tpu.utils import AttrDict
from nvse_tpu.utils.torch_import import import_mrf_generator

H = AttrDict(dict(
    model_name="HiFiGAN", resblock="1",
    upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 3], [1, 3]],
    num_mels=80, sampling_rate=22050, n_fft=1024, hop_size=256,
    win_size=1024, fmin=0, fmax=8000, segment_size=2048,
))


def _pad(k, d=1):
    return (k * d - d) // 2


class TorchResBlock(nn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d, padding=_pad(k, d)))
             for d in dils])
        self.convs2 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=1, padding=_pad(k)))
             for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
            x = xt + x
        return x


class TorchMRFGen(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.num_kernels = len(h.resblock_kernel_sizes)
        self.conv_pre = weight_norm(nn.Conv1d(80, h.upsample_initial_channel, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                h.upsample_initial_channel // (2**i),
                h.upsample_initial_channel // (2 ** (i + 1)),
                k, u, padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, k, d))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i](F.leaky_relu(x, 0.1))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = torch.tanh(self.conv_post(F.leaky_relu(x)))
        return x.squeeze(1)


def test_import_mrf_generator_output_parity():
    torch.manual_seed(0)
    tmodel = TorchMRFGen(H).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    gen, _ = build_generator(H)
    mel_np = np.random.default_rng(0).standard_normal((2, 80, 17)).astype(np.float32) - 4
    mel = jnp.asarray(mel_np)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    params = import_mrf_generator(sd, variables["params"], H)

    ours = np.asarray(gen.apply({"params": params}, mel))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(mel_np)).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_import_bsrnn_structural():
    """Synthetic state dict with band-tagged values lands in the right
    group rows, and the imported model runs."""
    from nvse_tpu.models.bsrnn import _band_groups, band_plan
    from nvse_tpu.utils.torch_import import import_bsrnn

    h = AttrDict(dict(
        model_name="BSRNN", feature_dim=8, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000, segment_size=2048,
    ))
    gen, _ = build_generator(h)
    mel = jnp.zeros((1, 80, 9))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    widths = band_plan(22050, 1024)
    C = 8
    sd = {}
    for i, w in enumerate(widths):
        sd[f"encoder.{i}.0.weight"] = np.full(w, 1.0 + i, np.float32)
        sd[f"encoder.{i}.0.bias"] = np.zeros(w, np.float32)
        sd[f"encoder.{i}.1.weight"] = np.full((C, w), 10.0 + i, np.float32)
        sd[f"encoder.{i}.1.bias"] = np.zeros(C, np.float32)
        for tname, mult in (("decoder_mag", 1), ("decoder_phase", 2)):
            sd[f"{tname}.{i}.0.weight"] = np.ones(C, np.float32)
            sd[f"{tname}.{i}.0.bias"] = np.zeros(C, np.float32)
            sd[f"{tname}.{i}.1.weight"] = np.full((4 * C, C), 0.01, np.float32)
            sd[f"{tname}.{i}.1.bias"] = np.zeros(4 * C, np.float32)
            sd[f"{tname}.{i}.3.weight"] = np.full((mult * w, 4 * C), 0.01, np.float32)
            sd[f"{tname}.{i}.3.bias"] = np.zeros(mult * w, np.float32)
    rng = np.random.default_rng(0)
    for p in ("time_rnn", "band_rnn"):
        pre = f"separator.0.{p}"
        sd[f"{pre}.norm.weight"] = np.ones(C, np.float32)
        sd[f"{pre}.norm.bias"] = np.zeros(C, np.float32)
        for d in ("", "_reverse"):
            sd[f"{pre}.rnn.weight_ih_l0{d}"] = rng.standard_normal((4 * C, C)).astype(np.float32) * 0.1
            sd[f"{pre}.rnn.weight_hh_l0{d}"] = rng.standard_normal((4 * C, C)).astype(np.float32) * 0.1
            sd[f"{pre}.rnn.bias_ih_l0{d}"] = np.zeros(4 * C, np.float32)
            sd[f"{pre}.rnn.bias_hh_l0{d}"] = np.zeros(4 * C, np.float32)
        sd[f"{pre}.proj.weight"] = rng.standard_normal((C, 2 * C)).astype(np.float32) * 0.1
        sd[f"{pre}.proj.bias"] = np.zeros(C, np.float32)
    sd["separator.0.out_norm.weight"] = np.ones(C, np.float32)
    sd["separator.0.out_norm.bias"] = np.zeros(C, np.float32)

    params = import_bsrnn(sd, variables["params"], h)
    enc = params["BSRNNCore_0"]["_GroupedBandEncoder_0"]
    # band-tagged values placed at the right group rows
    band = 0
    for gi, (w, n, _off) in enumerate(_band_groups(tuple(widths))):
        for r in range(n):
            assert enc[f"ln_scale_{gi}"][r, 0, 0] == 1.0 + band + r
            assert enc[f"w_{gi}"][r, 0, 0] == 10.0 + band + r
        band += n
    outs = gen.apply({"params": params}, jnp.zeros((1, 80, 9)) - 4.0)
    assert np.isfinite(np.asarray(outs[0])).all()


class TorchGRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(1, 1, dim))
        self.beta = nn.Parameter(torch.zeros(1, 1, dim))

    def forward(self, x):
        gx = torch.norm(x, p=2, dim=1, keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class TorchConvNeXtBlock(nn.Module):
    """Independent torch ConvNeXt-v2 block (public architecture) used as
    the parity oracle for the APNet2/FreeV importer."""

    def __init__(self, dim, mid):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, mid)
        self.grn = TorchGRN(mid)
        self.pwconv2 = nn.Linear(mid, dim)

    def forward(self, x):
        r = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.pwconv2(self.grn(F.gelu(self.pwconv1(self.norm(x)))))
        return r + x.transpose(1, 2)


def test_convnext_block_import_parity():
    torch.manual_seed(1)
    dim, mid = 16, 48
    tb = TorchConvNeXtBlock(dim, mid).eval()
    with torch.no_grad():
        for p in tb.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    sd = {f"blk.{k}": v.detach().numpy() for k, v in tb.state_dict().items()}

    from nvse_tpu.models.apnet import ConvNeXtBlock
    from nvse_tpu.utils.torch_import import _put_convnext_block

    blk = ConvNeXtBlock(dim, mid)
    x_np = np.random.default_rng(0).standard_normal((2, 20, dim)).astype(np.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = jax.tree.map(lambda a: np.array(a), variables["params"])
    _put_convnext_block(params, sd, "blk")
    ours = np.asarray(blk.apply({"params": params}, jnp.asarray(x_np)))
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x_np).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_import_apnet2_structural_names():
    """The flax tree has exactly the names import_apnet2 writes to."""
    h = AttrDict(dict(
        model_name="APNet2", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        ASP_channel=512, ASP_input_conv_kernel_size=7,
        ASP_output_conv_kernel_size=7, PSP_channel=512,
        PSP_input_conv_kernel_size=7, PSP_output_R_conv_kernel_size=7,
        PSP_output_I_conv_kernel_size=7,
    ))
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 9)))
    keys = set(variables["params"].keys())
    expect = ({f"Conv1d_{i}" for i in range(5)}
              | {f"ConvNeXtBlock_{i}" for i in range(16)}
              | {f"LayerNorm_{i}" for i in range(4)})
    assert keys == expect, keys ^ expect
    blk = variables["params"]["ConvNeXtBlock_0"]
    assert set(blk.keys()) == {"Conv1d_0", "LayerNorm_0", "Linear_0", "GRN_0", "Linear_1"}


def test_import_freev_structural_names():
    h = AttrDict(dict(
        model_name="FreeV", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        ASP_channel=513, PSP_channel=512, PSP_input_conv_kernel_size=7,
        PSP_output_R_conv_kernel_size=7, PSP_output_I_conv_kernel_size=7,
    ))
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 9)) - 4.0)
    keys = set(variables["params"].keys())
    expect = ({f"Conv1d_{i}" for i in range(3)}
              | {f"ConvNeXtBlock_{i}" for i in range(9)}
              | {f"LayerNorm_{i}" for i in range(2)})
    assert keys == expect, keys ^ expect


def test_import_apnet_structural_names():
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
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 9)))
    keys = set(variables["params"].keys())
    expect = ({f"Conv1d_{i}" for i in range(5)}
              | {f"ResBlock1_{i}" for i in range(4)})
    assert keys == expect, keys ^ expect
    # synthetic state dict with the reference torch names fills every leaf
    from nvse_tpu.utils.torch_import import import_apnet
    rng = np.random.default_rng(0)
    sd = {}

    def wn_conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight_v"] = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        sd[f"{prefix}.weight_g"] = np.ones((cout, 1, 1), np.float32)
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    wn_conv("ASP_input_conv", 32, 80, 7)
    wn_conv("PSP_input_conv", 32, 80, 7)
    for branch in ("ASP_ResNet", "PSP_ResNet"):
        for kk, ks in enumerate((3, 5)):
            for j in range(2):
                wn_conv(f"{branch}.{kk}.convs1.{j}", 32, 32, ks)
                wn_conv(f"{branch}.{kk}.convs2.{j}", 32, 32, ks)
    wn_conv("ASP_output_conv", 513, 32, 7)
    wn_conv("PSP_output_R_conv", 513, 32, 7)
    wn_conv("PSP_output_I_conv", 513, 32, 7)
    params = import_apnet(sd, variables["params"], h)
    outs = gen.apply({"params": params}, jnp.zeros((1, 80, 9)) - 4.0)
    assert np.isfinite(np.asarray(outs[-1])).all()


def test_import_convtasnet_structural():
    h = AttrDict(dict(
        model_name="ConvTasNet", num_mels=80, n_fft=1024, hop_size=256,
        win_size=1024, sampling_rate=22050, fmin=0, fmax=8000,
        N=16, L=16, B=8, H=16, P=3, X=2, R=1, norm="gln", num_spks=1,
        activate="relu", causal=False, skip_con=True, init_phase="zero",
    ))
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 9)))
    from nvse_tpu.utils.torch_import import import_convtasnet
    rng = np.random.default_rng(1)
    sd = {}

    def conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    conv("encoder", 16, 1, 16)
    sd["LayerN_S.weight"] = np.ones((16, 1), np.float32)
    sd["LayerN_S.bias"] = np.zeros((16, 1), np.float32)
    conv("BottleN_S", 8, 16, 1)
    for i in range(2):
        pre = f"separation.{i}"
        conv(f"{pre}.conv1x1", 16, 8, 1)
        sd[f"{pre}.PReLU_1.weight"] = np.full(1, 0.25, np.float32)
        sd[f"{pre}.norm_1.weight"] = np.ones((16, 1), np.float32)
        sd[f"{pre}.norm_1.bias"] = np.zeros((16, 1), np.float32)
        conv(f"{pre}.dwconv", 16, 1, 3)  # groups=16 -> in/groups = 1
        sd[f"{pre}.PReLU_2.weight"] = np.full(1, 0.25, np.float32)
        sd[f"{pre}.norm_2.weight"] = np.ones((16, 1), np.float32)
        sd[f"{pre}.norm_2.bias"] = np.zeros((16, 1), np.float32)
        conv(f"{pre}.Sc_conv", 8, 16, 1)
        conv(f"{pre}.skip_conv", 8, 16, 1)
    conv("gen_masks", 16, 8, 1)
    sd["decoder.weight"] = rng.standard_normal((16, 1, 16)).astype(np.float32) * 0.1
    sd["decoder.bias"] = np.zeros(1, np.float32)
    params = import_convtasnet(sd, variables["params"], h)
    wav = gen.apply({"params": params}, jnp.zeros((1, 80, 9)) - 4.0)
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_import_gcrn_structural():
    from nvse_tpu.utils.torch_import import import_gcrn

    h = AttrDict(dict(model_name="GCRN", sampling_rate=22050, n_fft=1024,
                      hop_size=256, win_size=1024, num_mels=80, fmin=0, fmax=8000))
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 5)))
    rng = np.random.default_rng(0)
    sd = {}
    enc = [(1, 16, 5), (16, 32, 3), (32, 64, 3), (64, 128, 3), (128, 128, 3), (128, 128, 3)]
    freqs = [255, 127, 63, 31, 15, 7]
    for i, (ci, co, k) in enumerate(enc):
        for c in ("conv1", "conv2"):
            sd[f"conv{i+1}.{c}.weight"] = rng.standard_normal((co, ci, 1, k)).astype(np.float32) * 0.05
            sd[f"conv{i+1}.{c}.bias"] = np.zeros(co, np.float32)
        sd[f"bn{i+1}.weight"] = np.ones(freqs[i], np.float32)
        sd[f"bn{i+1}.bias"] = np.zeros(freqs[i], np.float32)
    for l in ("lstm_list1", "lstm_list2"):
        for g in range(2):
            sd[f"glstm.{l}.{g}.weight_ih_l0"] = rng.standard_normal((4*448, 448)).astype(np.float32)*0.02
            sd[f"glstm.{l}.{g}.weight_hh_l0"] = rng.standard_normal((4*448, 448)).astype(np.float32)*0.02
            sd[f"glstm.{l}.{g}.bias_ih_l0"] = np.zeros(4*448, np.float32)
            sd[f"glstm.{l}.{g}.bias_hh_l0"] = np.zeros(4*448, np.float32)
    for ln in ("ln1", "ln2"):
        sd[f"glstm.{ln}.weight"] = np.ones(896, np.float32)
        sd[f"glstm.{ln}.bias"] = np.zeros(896, np.float32)
    dec = [(256, 128, 3), (256, 128, 3), (256, 64, 3), (128, 32, 3), (64, 16, 3)]
    dfreqs = [15, 31, 63, 127, 255]
    for branch in (1, 2):
        for step in range(6):
            k = 6 - step
            if step < 5:
                ci, co, ks = dec[step]
                fr = dfreqs[step]
            else:
                ci, co, ks = 32, (1 if branch == 1 else 2), 5
                fr = 513
            for c in ("conv1", "conv2"):
                sd[f"conv{k}_t_{branch}.{c}.weight"] = rng.standard_normal((ci, co, 1, ks)).astype(np.float32)*0.05
                sd[f"conv{k}_t_{branch}.{c}.bias"] = np.zeros(co, np.float32)
            sd[f"bn{k}_t_{branch}.weight"] = np.ones(fr, np.float32)
            sd[f"bn{k}_t_{branch}.bias"] = np.zeros(fr, np.float32)
    for fc in ("fc1", "fc2"):
        sd[f"{fc}.weight"] = rng.standard_normal((513, 513)).astype(np.float32) * 0.02
        sd[f"{fc}.bias"] = np.zeros(513, np.float32)

    params = import_gcrn(sd, variables["params"], h)
    outs = gen.apply({"params": params}, jnp.zeros((1, 80, 5)) - 4.0)
    assert np.isfinite(np.asarray(outs[-1])).all()


@pytest.mark.slow  # quick-tier trim: >10 s on a loaded host
def test_import_hddemucas_structural():
    from nvse_tpu.utils.torch_import import import_hddemucas

    h = AttrDict(dict(model_name="HDDemucas", sampling_rate=22050, n_fft=1024,
                      hop_size=256, win_size=1024, num_mels=80, fmin=0, fmax=8000,
                      chin=1, chout=1, hidden=8, depth=2, kernel_size=8, stride=4,
                      causal=False, resample=4, growth=2, max_hidden=10000,
                      normalize=False, glu=True, rescale=0.1, floor=1e-3,
                      init_phase="zero"))
    gen, _ = build_generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 5)))
    rng = np.random.default_rng(1)
    sd = {}
    chans = [(1, 1, 8), (8, 8, 16)]  # (chin, chout, hidden) per depth

    def conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.05
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def tconv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.05
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    for i, (ci, co, hi) in enumerate(chans):
        conv(f"encoder.{i}.0", hi, ci, 8)
        conv(f"encoder.{i}.2", 2 * hi, hi, 1)
    bott = chans[-1][2]
    for layer, dim_in in ((0, bott), (1, 2 * bott)):
        for d in ("", "_reverse"):
            sd[f"lstm.lstm.weight_ih_l{layer}{d}"] = rng.standard_normal((4*bott, dim_in)).astype(np.float32)*0.05
            sd[f"lstm.lstm.weight_hh_l{layer}{d}"] = rng.standard_normal((4*bott, bott)).astype(np.float32)*0.05
            sd[f"lstm.lstm.bias_ih_l{layer}{d}"] = np.zeros(4*bott, np.float32)
            sd[f"lstm.lstm.bias_hh_l{layer}{d}"] = np.zeros(4*bott, np.float32)
    sd["lstm.linear.weight"] = rng.standard_normal((bott, 2*bott)).astype(np.float32)*0.05
    sd["lstm.linear.bias"] = np.zeros(bott, np.float32)
    # decoder lists (torch order coarse->fine == our step order)
    for s, idx in enumerate(reversed(range(2))):   # step s uses construction idx
        ci, co, hi = chans[idx]
        conv(f"decoder_mask.{s}.0", 2 * hi, hi, 1)
        tconv(f"decoder_mask.{s}.2", hi, co, 8)
        conv(f"decoder_map.{s}.0", 2 * hi, hi, 1)
        tconv(f"decoder_map.{s}.2", hi, co, 8)
    for j in range(3):
        conv(f"fb_conv{j+1}.0", 2, 2, 3)
    sd["weight"] = np.asarray(0.5, np.float32)

    params = import_hddemucas(sd, variables["params"], h)
    wav = gen.apply({"params": params}, jnp.zeros((1, 80, 5)) - 4.0)
    assert np.isfinite(np.asarray(wav)).all()
