"""Import reference PyTorch checkpoints into nvse_tpu parameter trees.

The reference ships pretrained `g_*` torch state dicts
({"generator": state_dict}, utils.py:59-62). This tool maps those onto
our Flax parameter pytrees so numerical parity can be validated without
retraining (SURVEY.md §7 step 7).

Layout conventions (see models/layers.py):
  torch Conv1d  (out, in/g, k)      -> ours (k, in/g, out)   [transpose 2,1,0]
  torch ConvT1d (in, out, k)        -> ours (k, in, out)     [transpose 2,0,1]
  torch Conv2d  (out, in/g, kh, kw) -> ours (kh, kw, in/g, out)
  torch ConvT2d (in, out, kh, kw)   -> ours (kh, kw, in, out)
  torch Linear  (out, in)           -> ours (in, out)
  weight_norm:  weight_v/weight_g   -> v / g (same transposes; g keeps
                its per-channel axis)
  LSTM:         weight_ih_l0 (4H,in)-> w_ih_fwd (in, 4H), etc.

Because module naming differs, import is *structural*: we flatten both
trees in deterministic order per module family and match by shape
signature. Model-specific name maps can override.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_conv1d(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 1, 0)


def convert_convtranspose1d(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 0, 1)


def convert_conv2d(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


def convert_convtranspose2d(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 0, 1)


def convert_linear(w: np.ndarray) -> np.ndarray:
    return w.transpose(1, 0)


def convert_tensor(name: str, w: np.ndarray, target_shape: tuple) -> np.ndarray | None:
    """Try the known layout conversions to hit target_shape."""
    candidates = [w]
    if w.ndim == 3:
        candidates += [w.transpose(2, 1, 0), w.transpose(2, 0, 1)]
    elif w.ndim == 4:
        candidates += [w.transpose(2, 3, 1, 0), w.transpose(2, 3, 0, 1)]
    elif w.ndim == 2:
        candidates += [w.transpose(1, 0)]
    for c in candidates:
        if c.shape == tuple(target_shape):
            return np.ascontiguousarray(c)
    # weight-norm g: torch (C,1,1)/(1,C,1) vs ours (1,1,C) etc.
    if w.size == int(np.prod(target_shape)):
        return np.ascontiguousarray(w.reshape(target_shape))
    return None


def load_torch_generator(ckpt_path: str) -> dict[str, np.ndarray]:
    """Load the reference g_* checkpoint -> flat {torch_name: array}."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = state.get("generator", state)
    return {k: _to_numpy(v) for k, v in sd.items()}


def import_mrf_generator(torch_params: dict[str, np.ndarray], flax_params: Any,
                         h) -> Any:
    """Name-mapped import for the MRF family (HiFiGAN / iSTFTNet).

    Reference torch module names (Models/hifigan.py:83-133 /
    istftnet.py:271-328): conv_pre, ups.{i}, resblocks.{k}.convs1/2.{j},
    conv_post — all weight-normed. Returns a new flax param tree.
    """
    import jax

    out = jax.tree.map(lambda x: x, flax_params)  # shallow copy

    def put(path: list[str], torch_prefix: str, kind: str):
        node = out
        for p in path[:-1]:
            node = node[p]
        leafd = node[path[-1]]
        if kind == "wn_conv1d":
            leafd["v"] = convert_conv1d(torch_params[f"{torch_prefix}.weight_v"])
            leafd["g"] = torch_params[f"{torch_prefix}.weight_g"].reshape(leafd["g"].shape)
            leafd["bias"] = torch_params[f"{torch_prefix}.bias"]
        elif kind == "wn_convt1d":
            leafd["v"] = convert_convtranspose1d(torch_params[f"{torch_prefix}.weight_v"])
            leafd["g"] = torch_params[f"{torch_prefix}.weight_g"].reshape(leafd["g"].shape)
            leafd["bias"] = torch_params[f"{torch_prefix}.bias"]
        else:
            raise ValueError(kind)

    trunk = "MRFUpsampler_0"
    put([trunk, "Conv1d_0"], "conv_pre", "wn_conv1d")
    n_up = len(h.upsample_rates)
    n_k = len(h.resblock_kernel_sizes)
    n_convs_per_block = 2 * len(h.resblock_dilation_sizes[0]) if h.resblock == "1" \
        else len(h.resblock_dilation_sizes[0])
    for i in range(n_up):
        put([trunk, f"ConvTranspose1d_{i}"], f"ups.{i}", "wn_convt1d")
    for k in range(n_up * n_k):
        block = f"ResBlock{h.resblock}_{k}"
        if h.resblock == "1":
            n_d = len(h.resblock_dilation_sizes[k % n_k])
            for j in range(n_d):
                # our ResBlock1 call order: c1 (dilated), c2 (plain) per stage
                put([trunk, block, f"Conv1d_{2 * j}"],
                    f"resblocks.{k}.convs1.{j}", "wn_conv1d")
                put([trunk, block, f"Conv1d_{2 * j + 1}"],
                    f"resblocks.{k}.convs2.{j}", "wn_conv1d")
        else:
            for j in range(len(h.resblock_dilation_sizes[k % n_k])):
                put([trunk, block, f"Conv1d_{j}"],
                    f"resblocks.{k}.convs.{j}", "wn_conv1d")
    put(["Conv1d_0"], "conv_post", "wn_conv1d")
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def _put_wn_conv1d(node, torch_params, prefix, transpose=False):
    conv = convert_convtranspose1d if transpose else convert_conv1d
    node["v"] = conv(torch_params[f"{prefix}.weight_v"])
    node["g"] = torch_params[f"{prefix}.weight_g"].reshape(node["g"].shape)
    node["bias"] = torch_params[f"{prefix}.bias"]


def import_apnet(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for APNet (reference Models/apnet.py:90-157).

    Flax call order: branch ASP — Conv1d_0 (in), ResBlock1_0..2
    (ASPResBlocks, each convs1/convs2 interleaved as Conv1d_{2j}/{2j+1}),
    Conv1d_1 (out); branch PSP — Conv1d_2 (in), ResBlock1_3..5,
    Conv1d_3/4 (R/I). All weight-normed.
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)
    nk = len(h.ASP_resblock_kernel_sizes)

    _put_wn_conv1d(out["Conv1d_0"], torch_params, "ASP_input_conv")
    for k in range(nk):
        blk = out[f"ResBlock1_{k}"]
        n_d = len(h.ASP_resblock_dilation_sizes[k])
        for j in range(n_d):
            _put_wn_conv1d(blk[f"Conv1d_{2 * j}"], torch_params, f"ASP_ResNet.{k}.convs1.{j}")
            _put_wn_conv1d(blk[f"Conv1d_{2 * j + 1}"], torch_params, f"ASP_ResNet.{k}.convs2.{j}")
    _put_wn_conv1d(out["Conv1d_1"], torch_params, "ASP_output_conv")

    _put_wn_conv1d(out["Conv1d_2"], torch_params, "PSP_input_conv")
    for k in range(nk):
        blk = out[f"ResBlock1_{nk + k}"]
        n_d = len(h.PSP_resblock_dilation_sizes[k])
        for j in range(n_d):
            _put_wn_conv1d(blk[f"Conv1d_{2 * j}"], torch_params, f"PSP_ResNet.{k}.convs1.{j}")
            _put_wn_conv1d(blk[f"Conv1d_{2 * j + 1}"], torch_params, f"PSP_ResNet.{k}.convs2.{j}")
    _put_wn_conv1d(out["Conv1d_3"], torch_params, "PSP_output_R_conv")
    _put_wn_conv1d(out["Conv1d_4"], torch_params, "PSP_output_I_conv")
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_convtasnet(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for ConvTasNet (reference Models/convtasnet.py:170-328).

    Flax call order: Conv1d_0 (encoder), GlobalLayerNorm_0, Conv1d_1
    (bottleneck), Conv1DBlock_0..R*X-1 (each: Conv1d_0 1x1, PReLU_0,
    GlobalLayerNorm_0, Conv1d_1 dwconv, Conv1d_2 res [, Conv1d_3 skip]
    — the torch checkpoint's PReLU_2/norm_2 are constructed-but-unused
    in the reference forward and are skipped), Conv1d_2 (mask head),
    ConvTranspose1d_0 (decoder).
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)

    def plain(node, prefix):
        node["kernel"] = convert_conv1d(torch_params[f"{prefix}.weight"])
        node["bias"] = torch_params[f"{prefix}.bias"]

    def gln(node, prefix):
        node["weight"] = torch_params[f"{prefix}.weight"].reshape(node["weight"].shape)
        node["bias"] = torch_params[f"{prefix}.bias"].reshape(node["bias"].shape)

    plain(out["Conv1d_0"], "encoder")
    gln(out["GlobalLayerNorm_0"], "LayerN_S")
    plain(out["Conv1d_1"], "BottleN_S")
    for i in range(h.R * h.X):
        blk = out[f"Conv1DBlock_{i}"]
        pre = f"separation.{i}"
        plain(blk["Conv1d_0"], f"{pre}.conv1x1")
        blk["PReLU_0"]["alpha"] = torch_params[f"{pre}.PReLU_1.weight"].reshape(())
        gln(blk["GlobalLayerNorm_0"], f"{pre}.norm_1")
        plain(blk["Conv1d_1"], f"{pre}.dwconv")
        plain(blk["Conv1d_2"], f"{pre}.Sc_conv")
        if h.skip_con:
            plain(blk["Conv1d_3"], f"{pre}.skip_conv")
    plain(out["Conv1d_2"], "gen_masks")
    out["ConvTranspose1d_0"]["kernel"] = convert_convtranspose1d(torch_params["decoder.weight"])
    out["ConvTranspose1d_0"]["bias"] = torch_params["decoder.bias"]
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def _put_convnext_block(out_block, torch_params, prefix):
    """Map one torch ConvNeXtBlock (apnet2.py:27-66) onto ours."""
    out_block["Conv1d_0"]["kernel"] = convert_conv1d(torch_params[f"{prefix}.dwconv.weight"])
    out_block["Conv1d_0"]["bias"] = torch_params[f"{prefix}.dwconv.bias"]
    out_block["LayerNorm_0"]["scale"] = torch_params[f"{prefix}.norm.weight"]
    out_block["LayerNorm_0"]["bias"] = torch_params[f"{prefix}.norm.bias"]
    out_block["Linear_0"]["kernel"] = convert_linear(torch_params[f"{prefix}.pwconv1.weight"])
    out_block["Linear_0"]["bias"] = torch_params[f"{prefix}.pwconv1.bias"]
    g = torch_params[f"{prefix}.grn.gamma"]
    b = torch_params[f"{prefix}.grn.beta"]
    out_block["GRN_0"]["gamma"] = g.reshape(out_block["GRN_0"]["gamma"].shape)
    out_block["GRN_0"]["beta"] = b.reshape(out_block["GRN_0"]["beta"].shape)
    out_block["Linear_1"]["kernel"] = convert_linear(torch_params[f"{prefix}.pwconv2.weight"])
    out_block["Linear_1"]["bias"] = torch_params[f"{prefix}.pwconv2.bias"]


def _put_plain_conv1d(node, torch_params, prefix):
    node["kernel"] = convert_conv1d(torch_params[f"{prefix}.weight"])
    node["bias"] = torch_params[f"{prefix}.bias"]


def _put_ln(node, torch_params, prefix):
    node["scale"] = torch_params[f"{prefix}.weight"]
    node["bias"] = torch_params[f"{prefix}.bias"]


def import_apnet2(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for APNet2 (reference Models/apnet2.py:69-188).

    Call-order flax names: Conv1d_0 (ASP in), LayerNorm_0,
    ConvNeXtBlock_0..7, LayerNorm_1, Conv1d_1 (ASP out), Conv1d_2
    (PSP in), LayerNorm_2, ConvNeXtBlock_8..15, LayerNorm_3,
    Conv1d_3/4 (R/I heads).
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)
    n = 8
    _put_plain_conv1d(out["Conv1d_0"], torch_params, "ASP_input_conv")
    _put_ln(out["LayerNorm_0"], torch_params, "norm2")
    for i in range(n):
        _put_convnext_block(out[f"ConvNeXtBlock_{i}"], torch_params, f"convnext2.{i}")
    _put_ln(out["LayerNorm_1"], torch_params, "final_layer_norm2")
    _put_plain_conv1d(out["Conv1d_1"], torch_params, "ASP_output_conv")
    _put_plain_conv1d(out["Conv1d_2"], torch_params, "PSP_input_conv")
    _put_ln(out["LayerNorm_2"], torch_params, "norm")
    for i in range(n):
        _put_convnext_block(out[f"ConvNeXtBlock_{n + i}"], torch_params, f"convnext.{i}")
    _put_ln(out["LayerNorm_3"], torch_params, "final_layer_norm")
    _put_plain_conv1d(out["Conv1d_3"], torch_params, "PSP_output_R_conv")
    _put_plain_conv1d(out["Conv1d_4"], torch_params, "PSP_output_I_conv")
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_freev(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for FreeV (reference Models/freeV.py:69-187).

    Flax call order: ConvNeXtBlock_0 (ASP, dim 513), Conv1d_0 (PSP in),
    LayerNorm_0, ConvNeXtBlock_1..8 (PSP), LayerNorm_1, Conv1d_1/2 (R/I).
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)
    _put_convnext_block(out["ConvNeXtBlock_0"], torch_params, "convnext2.0")
    _put_plain_conv1d(out["Conv1d_0"], torch_params, "PSP_input_conv")
    _put_ln(out["LayerNorm_0"], torch_params, "norm")
    for i in range(8):
        _put_convnext_block(out[f"ConvNeXtBlock_{1 + i}"], torch_params, f"convnext.{i}")
    _put_ln(out["LayerNorm_1"], torch_params, "final_layer_norm")
    _put_plain_conv1d(out["Conv1d_1"], torch_params, "PSP_output_R_conv")
    _put_plain_conv1d(out["Conv1d_2"], torch_params, "PSP_output_I_conv")
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_vocos(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for Vocos (models/vocos.py; no reference impl —
    SURVEY.md §6 footnote — so torch names follow the same ConvNeXt
    conventions as APNet2: embed, norm, convnext.{i}.dwconv/norm/
    pwconv1/grn/pwconv2, final_layer_norm, head).

    Flax call order: Conv1d_0 (embed), LayerNorm_0, ConvNeXtBlock_0..N,
    LayerNorm_1, Linear_0 (ISTFT head).
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)
    _put_plain_conv1d(out["Conv1d_0"], torch_params, "embed")
    _put_ln(out["LayerNorm_0"], torch_params, "norm")
    n = int(h.get("vocos_num_layers", 8))
    for i in range(n):
        _put_convnext_block(out[f"ConvNeXtBlock_{i}"], torch_params, f"convnext.{i}")
    _put_ln(out["LayerNorm_1"], torch_params, "final_layer_norm")
    out["Linear_0"]["kernel"] = convert_linear(torch_params["head.weight"])
    out["Linear_0"]["bias"] = torch_params["head.bias"]
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_gcrn(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for GCRN (reference Models/gcrn.py:86-220).

    Flax names: GluConv2d_0..5 (conv1/conv2 -> Conv2d_0/1), per-branch
    GluConvTranspose2d (branch 1 = decoder indices 0..5, branch 2 =
    6..11; torch names conv{6..1}_t_{1,2}), freq LayerNorms named
    bn1..bn6 / bn{k}_t_{1,2}, GLSTM_0 (lstm_list1/2 -> LSTM_0..3 +
    LayerNorm_0/1), Linear_0/1 (fc1/fc2).
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)

    def conv2d(node, prefix):
        node["kernel"] = convert_conv2d(torch_params[f"{prefix}.weight"])
        node["bias"] = torch_params[f"{prefix}.bias"]

    def convt2d(node, prefix):
        node["kernel"] = convert_convtranspose2d(torch_params[f"{prefix}.weight"])
        node["bias"] = torch_params[f"{prefix}.bias"]

    def ln_freq(node, prefix):
        node["scale"] = torch_params[f"{prefix}.weight"].reshape(node["scale"].shape)
        node["bias"] = torch_params[f"{prefix}.bias"].reshape(node["bias"].shape)

    def lstm(node, prefix):
        node["w_ih_fwd"] = convert_linear(torch_params[f"{prefix}.weight_ih_l0"])
        node["w_hh_fwd"] = convert_linear(torch_params[f"{prefix}.weight_hh_l0"])
        node["b_ih_fwd"] = torch_params[f"{prefix}.bias_ih_l0"]
        node["b_hh_fwd"] = torch_params[f"{prefix}.bias_hh_l0"]

    for i in range(6):
        conv2d(out[f"GluConv2d_{i}"]["Conv2d_0"], f"conv{i + 1}.conv1")
        conv2d(out[f"GluConv2d_{i}"]["Conv2d_1"], f"conv{i + 1}.conv2")
        ln_freq(out[f"bn{i + 1}"], f"bn{i + 1}")
    gl = out["GLSTM_0"]
    for g in range(2):
        lstm(gl[f"LSTM_{g}"], f"glstm.lstm_list1.{g}")
        lstm(gl[f"LSTM_{2 + g}"], f"glstm.lstm_list2.{g}")
    gl["LayerNorm_0"]["scale"] = torch_params["glstm.ln1.weight"]
    gl["LayerNorm_0"]["bias"] = torch_params["glstm.ln1.bias"]
    gl["LayerNorm_1"]["scale"] = torch_params["glstm.ln2.weight"]
    gl["LayerNorm_1"]["bias"] = torch_params["glstm.ln2.bias"]
    for branch in (1, 2):
        for step in range(6):
            k = 6 - step  # torch conv{k}_t / bn{k}_t, k = 6..1 (coarse->fine)
            idx = (branch - 1) * 6 + step
            blk = out[f"GluConvTranspose2d_{idx}"]
            convt2d(blk["ConvTranspose2d_0"], f"conv{k}_t_{branch}.conv1")
            convt2d(blk["ConvTranspose2d_1"], f"conv{k}_t_{branch}.conv2")
            ln_freq(out[f"bn{k}_t_{branch}"], f"bn{k}_t_{branch}")
    out["Linear_0"]["kernel"] = convert_linear(torch_params["fc1.weight"])
    out["Linear_0"]["bias"] = torch_params["fc1.bias"]
    out["Linear_1"]["kernel"] = convert_linear(torch_params["fc2.weight"])
    out["Linear_1"]["bias"] = torch_params["fc2.bias"]
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_hddemucas(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for HD-Demucs (reference Models/hddemucas.py:127-370).

    Flax call order: encoder Conv1d_{2i}/{2i+1} (strided + 1x1 GLU) for
    i in 0..depth-1; BLSTM_0 (LSTM_0/1 + Linear_0); mask decoder
    Conv1d_{2d+...}/ConvTranspose1d_0..4; map decoder likewise; fusion
    Conv1d x3; scalar 'weight'.
    """
    import jax

    out = jax.tree.map(lambda x: np.array(x), flax_params)
    depth = h.depth

    def plain1d(node, prefix):
        node["kernel"] = convert_conv1d(torch_params[f"{prefix}.weight"])
        node["bias"] = torch_params[f"{prefix}.bias"]

    def trans1d(node, prefix):
        node["kernel"] = convert_convtranspose1d(torch_params[f"{prefix}.weight"])
        node["bias"] = torch_params[f"{prefix}.bias"]

    # encoder: torch encoder.{i}.0 (strided) and .2 (1x1)
    for i in range(depth):
        plain1d(out[f"Conv1d_{2 * i}"], f"encoder.{i}.0")
        plain1d(out[f"Conv1d_{2 * i + 1}"], f"encoder.{i}.2")

    bl = out["BLSTM_0"]
    for layer, node in ((0, bl["LSTM_0"]), (1, bl["LSTM_1"])):
        node["w_ih_fwd"] = convert_linear(torch_params[f"lstm.lstm.weight_ih_l{layer}"])
        node["w_hh_fwd"] = convert_linear(torch_params[f"lstm.lstm.weight_hh_l{layer}"])
        node["b_ih_fwd"] = torch_params[f"lstm.lstm.bias_ih_l{layer}"]
        node["b_hh_fwd"] = torch_params[f"lstm.lstm.bias_hh_l{layer}"]
        node["w_ih_bwd"] = convert_linear(torch_params[f"lstm.lstm.weight_ih_l{layer}_reverse"])
        node["w_hh_bwd"] = convert_linear(torch_params[f"lstm.lstm.weight_hh_l{layer}_reverse"])
        node["b_ih_bwd"] = torch_params[f"lstm.lstm.bias_ih_l{layer}_reverse"]
        node["b_hh_bwd"] = torch_params[f"lstm.lstm.bias_hh_l{layer}_reverse"]
    bl["Linear_0"]["kernel"] = convert_linear(torch_params["lstm.linear.weight"])
    bl["Linear_0"]["bias"] = torch_params["lstm.linear.bias"]

    # decoders: our call order is coarse->fine step s = depth-1-idx;
    # torch decoder lists are [idx depth-1 ... idx 0] so list position ==
    # our step. Mask decoder 1x1 convs are Conv1d_{2*depth + s},
    # transposed ConvTranspose1d_{s}; map decoder continues after.
    for s in range(depth):
        plain1d(out[f"Conv1d_{2 * depth + s}"], f"decoder_mask.{s}.0")
        trans1d(out[f"ConvTranspose1d_{s}"], f"decoder_mask.{s}.2")
    for s in range(depth):
        plain1d(out[f"Conv1d_{3 * depth + s}"], f"decoder_map.{s}.0")
        trans1d(out[f"ConvTranspose1d_{depth + s}"], f"decoder_map.{s}.2")

    for j in range(3):
        plain1d(out[f"Conv1d_{4 * depth + j}"], f"fb_conv{j + 1}.0")
    out["weight"] = torch_params["weight"].reshape(out["weight"].shape)
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_bsrnn(torch_params: dict[str, np.ndarray], flax_params: Any, h) -> Any:
    """Name-mapped import for BSRNN / BSRNN_24k.

    Reference torch names (Models/bsrnn.py:112-141): per-band
    ``encoder.{i}.0/1`` (LayerNorm + Linear), ``separator.{k}`` BSNets
    (time_rnn/band_rnn ResRNNs + out_norm), per-band
    ``decoder_mag.{i}.*`` / ``decoder_phase.{i}.*``. Our encoder/decoder
    parameters are STACKED per width group, so per-band torch tensors
    are gathered into the group arrays row by row.
    """
    import jax

    from ..models.bsrnn import _band_groups, band_plan

    widths = band_plan(h.sampling_rate, h.n_fft)
    groups = _band_groups(widths)
    out = jax.tree.map(lambda x: np.array(x), flax_params)
    core = out["BSRNNCore_0"]

    # --- encoder groups
    enc = core["_GroupedBandEncoder_0"]
    band = 0
    for gi, (w, n, _off) in enumerate(groups):
        for r in range(n):
            i = band + r
            enc[f"ln_scale_{gi}"][r, 0] = torch_params[f"encoder.{i}.0.weight"]
            enc[f"ln_bias_{gi}"][r, 0] = torch_params[f"encoder.{i}.0.bias"]
            enc[f"w_{gi}"][r] = torch_params[f"encoder.{i}.1.weight"].T
            enc[f"b_{gi}"][r, 0] = torch_params[f"encoder.{i}.1.bias"]
        band += n

    # --- decoders (mag = _GroupedBandDecoder_0, phase = _1)
    for dec_key, tname in (("_GroupedBandDecoder_0", "decoder_mag"),
                           ("_GroupedBandDecoder_1", "decoder_phase")):
        dec = core[dec_key]
        band = 0
        for gi, (w, n, _off) in enumerate(groups):
            for r in range(n):
                i = band + r
                dec[f"ln_scale_{gi}"][r, 0] = torch_params[f"{tname}.{i}.0.weight"]
                dec[f"ln_bias_{gi}"][r, 0] = torch_params[f"{tname}.{i}.0.bias"]
                dec[f"w1_{gi}"][r] = torch_params[f"{tname}.{i}.1.weight"].T
                dec[f"b1_{gi}"][r, 0] = torch_params[f"{tname}.{i}.1.bias"]
                dec[f"w2_{gi}"][r] = torch_params[f"{tname}.{i}.3.weight"].T
                dec[f"b2_{gi}"][r, 0] = torch_params[f"{tname}.{i}.3.bias"]
            band += n

    # --- separator BSNets
    def put_resrnn(node, prefix, bidirectional):
        node["LayerNorm_0"]["scale"] = torch_params[f"{prefix}.norm.weight"]
        node["LayerNorm_0"]["bias"] = torch_params[f"{prefix}.norm.bias"]
        lstm = node["LSTM_0"]
        lstm["w_ih_fwd"] = torch_params[f"{prefix}.rnn.weight_ih_l0"].T
        lstm["w_hh_fwd"] = torch_params[f"{prefix}.rnn.weight_hh_l0"].T
        lstm["b_ih_fwd"] = torch_params[f"{prefix}.rnn.bias_ih_l0"]
        lstm["b_hh_fwd"] = torch_params[f"{prefix}.rnn.bias_hh_l0"]
        if bidirectional:
            lstm["w_ih_bwd"] = torch_params[f"{prefix}.rnn.weight_ih_l0_reverse"].T
            lstm["w_hh_bwd"] = torch_params[f"{prefix}.rnn.weight_hh_l0_reverse"].T
            lstm["b_ih_bwd"] = torch_params[f"{prefix}.rnn.bias_ih_l0_reverse"]
            lstm["b_hh_bwd"] = torch_params[f"{prefix}.rnn.bias_hh_l0_reverse"]
        node["Linear_0"]["kernel"] = torch_params[f"{prefix}.proj.weight"].T
        node["Linear_0"]["bias"] = torch_params[f"{prefix}.proj.bias"]

    for k in range(h.num_repeat):
        bs = core[f"BSNet_{k}"]
        put_resrnn(bs["ResRNN_0"], f"separator.{k}.time_rnn", not h.causal)
        put_resrnn(bs["ResRNN_1"], f"separator.{k}.band_rnn", True)
        bs["LayerNorm_0"]["scale"] = torch_params[f"separator.{k}.out_norm.weight"]
        bs["LayerNorm_0"]["bias"] = torch_params[f"separator.{k}.out_norm.bias"]

    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def import_by_order(torch_params: dict[str, np.ndarray], flax_params: Any):
    """Map torch tensors onto a flax param tree by traversal order + shape.

    Both the reference modules and ours declare parameters in forward
    order, so ordered matching with layout conversion covers the conv
    trunk models (HiFiGAN/iSTFTNet/APNet family). Raises with a detailed
    report on any unmatched leaf.
    """
    import jax

    leaves, treedef = jax.tree.flatten(flax_params)
    torch_items = list(torch_params.items())
    used = [False] * len(torch_items)
    out_leaves = []
    report = []
    for li, leaf in enumerate(leaves):
        found = None
        for ti, (name, arr) in enumerate(torch_items):
            if used[ti]:
                continue
            conv = convert_tensor(name, arr, leaf.shape)
            if conv is not None:
                found = (ti, name, conv)
                break
        if found is None:
            report.append(f"no torch tensor for flax leaf #{li} shape {leaf.shape}")
            out_leaves.append(leaf)
        else:
            used[found[0]] = True
            out_leaves.append(found[2].astype(np.float32))
    unused = [torch_items[i][0] for i in range(len(torch_items)) if not used[i]]
    if report or unused:
        raise ValueError(
            "structural import incomplete:\n" + "\n".join(report)
            + ("\nunused torch tensors: " + ", ".join(unused) if unused else "")
        )
    return jax.tree.unflatten(treedef, out_leaves)
