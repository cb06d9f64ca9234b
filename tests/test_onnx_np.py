"""Numpy ONNX executor: op parity vs torch + DNSMOS model regression.

The executor (nvse_tpu/metrics/onnx_np.py) exists so DNSMOS — whose
weights the reference vendors as ONNX graphs at
Metrics/DNSMOS/DNSMOS/*.onnx — can score without onnxruntime. Op
numerics are checked against torch oracles; the end-to-end graphs are
pinned by golden outputs recorded from this executor on fixed inputs
(guards against parser/op regressions) plus behavioural sanity (clean
speech must outscore the same speech drowned in noise).
"""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nvse_tpu.metrics.onnx_np import NumpyOnnxSession, _conv, _maxpool

RNG = np.random.default_rng(11)

REF_DNSMOS = "/root/reference/Metrics/DNSMOS/DNSMOS"
needs_models = pytest.mark.skipif(
    not os.path.isdir(REF_DNSMOS), reason="DNSMOS onnx assets not present")


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


@pytest.mark.parametrize("case", [
    # (N,C,H,W), (M,C/g,kh,kw), strides, pads(t,l,b,r), dil, groups
    ((1, 8, 20, 17), (16, 8, 3, 3), [1, 1], [1, 1, 1, 1], [1, 1], 1),   # shifted-GEMM path
    ((2, 8, 20, 17), (16, 8, 3, 3), [1, 1], [1, 1, 1, 1], [1, 1], 1),   # batched im2col
    ((1, 8, 21, 19), (12, 8, 3, 5), [2, 3], [1, 2, 1, 2], [1, 1], 1),   # strided
    ((1, 8, 20, 20), (8, 2, 3, 3), [1, 1], [0, 0, 0, 0], [1, 1], 4),    # grouped
    ((1, 4, 20, 20), (6, 4, 3, 3), [1, 1], [2, 2, 2, 2], [2, 2], 1),    # dilated
])
def test_conv2d_matches_torch(case):
    xs, ws, st, pads, di, g = case
    x = RNG.standard_normal(xs).astype(np.float32)
    w = RNG.standard_normal(ws).astype(np.float32)
    b = RNG.standard_normal(ws[0]).astype(np.float32)
    attrs = {"kernel_shape": list(ws[2:]), "strides": st, "pads": pads,
             "dilations": di, "group": g}
    got = _conv(x, w, b, attrs)
    want = F.conv2d(_t(x), _t(w), _t(b), stride=st,
                    padding=(pads[0], pads[1]), dilation=di, groups=g).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv1d_matches_torch():
    x = RNG.standard_normal((1, 1, 400)).astype(np.float32)
    w = RNG.standard_normal((32, 1, 161)).astype(np.float32)
    attrs = {"kernel_shape": [161], "strides": [160], "pads": [0, 0]}
    got = _conv(x, w, None, attrs)
    want = F.conv1d(_t(x), _t(w), stride=160).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ks,st,pads", [
    ([2, 2], [2, 2], [0, 0, 0, 0]),
    ([3, 3], [2, 2], [1, 1, 1, 1]),
])
def test_maxpool2d_matches_torch(ks, st, pads):
    x = RNG.standard_normal((2, 6, 21, 17)).astype(np.float32)
    got = _maxpool(x, {"kernel_shape": ks, "strides": st, "pads": pads})
    want = F.max_pool2d(_t(x), ks, st, padding=(pads[0], pads[1])).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@needs_models
def test_dnsmos_primary_golden():
    """sig_bak_ovr.onnx on a fixed pseudo-speech input: regression pin.

    Golden recorded from this executor (no onnxruntime in-env to
    cross-check); the op layer is independently torch-verified above,
    so this guards the graph wiring + initializer parsing.
    """
    sess = NumpyOnnxSession(os.path.join(REF_DNSMOS, "sig_bak_ovr.onnx"))
    rng = np.random.default_rng(0)
    t = np.arange(144160, dtype=np.float32) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.01 * rng.standard_normal(144160)).astype(np.float32)
    out = sess.run(None, {"input_1": x[None, :]})[0][0]
    assert out.shape == (3,)
    np.testing.assert_allclose(
        out, [1.7976595, 2.2481306, 1.5416827], rtol=2e-4)


@needs_models
def test_dnsmos_p808_golden():
    sess = NumpyOnnxSession(os.path.join(REF_DNSMOS, "model_v8.onnx"))
    rng = np.random.default_rng(1)
    feat = (0.5 + 0.1 * rng.standard_normal((1, 899, 120))).astype(np.float32)
    out = sess.run(None, {"input_1": feat})[0]
    np.testing.assert_allclose(out, [[2.2355342]], rtol=2e-4)


@needs_models
def test_dnsmos_clean_beats_noisy():
    """Behavioural check: adding loud white noise must drop all three
    raw scores (the executor preserves the model's learned ordering)."""
    sess = NumpyOnnxSession(os.path.join(REF_DNSMOS, "sig_bak_ovr.onnx"))
    rng = np.random.default_rng(2)
    t = np.arange(144160, dtype=np.float32) / 16000.0
    clean = (0.3 * np.sin(2 * np.pi * 180 * t)
             * (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 2.5 * t)))).astype(np.float32)
    noisy = clean + 0.2 * rng.standard_normal(144160).astype(np.float32)
    s_clean = sess.run(None, {"input_1": clean[None, :]})[0][0]
    s_noisy = sess.run(None, {"input_1": noisy[None, :]})[0][0]
    assert s_clean[1] > s_noisy[1]  # BAK (background) must drop hard
    assert s_clean[2] > s_noisy[2]  # OVRL
