"""CREPE-JAX vs an independent torch oracle of torchcrepe's model.

The oracle re-states torchcrepe/model.py in torch (pad -> Conv2d ->
ReLU -> eval-BatchNorm -> MaxPool(2,1) x6, Linear(2048, 360), sigmoid)
with RANDOM weights, exports its state dict, and the JAX import must
reproduce its outputs — the same structural-parity strategy as the
UTMOS importer tests (the public full.pth itself is not in this env).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nvse_tpu.metrics.crepe_jax import (CENTS_OFFSET, CENTS_PER_BIN,
                                        PITCH_BINS, crepe_forward,
                                        predict_f0_periodicity,
                                        torch_to_jax_params)


class _OracleCrepe(torch.nn.Module):
    def __init__(self, model="full"):
        super().__init__()
        import functools

        if model == "full":
            in_channels = [1, 1024, 128, 128, 128, 256]
            out_channels = [1024, 128, 128, 128, 256, 512]
            self.in_features = 2048
        else:  # tiny
            in_channels = [1, 128, 16, 16, 16, 32]
            out_channels = [128, 16, 16, 16, 32, 64]
            self.in_features = 256
        kernel_sizes = [(512, 1)] + 5 * [(64, 1)]
        strides = [(4, 1)] + 5 * [(1, 1)]
        bn = functools.partial(torch.nn.BatchNorm2d, eps=0.0010000000474974513)
        for i in range(6):
            setattr(self, f"conv{i+1}",
                    torch.nn.Conv2d(in_channels[i], out_channels[i],
                                    kernel_sizes[i], strides[i]))
            setattr(self, f"conv{i+1}_BN", bn(out_channels[i]))
        self.classifier = torch.nn.Linear(self.in_features, PITCH_BINS)

    def _layer(self, x, i, padding):
        x = torch.nn.functional.pad(x, padding)
        x = getattr(self, f"conv{i}")(x)
        x = torch.nn.functional.relu(x)
        x = getattr(self, f"conv{i}_BN")(x)
        return torch.nn.functional.max_pool2d(x, (2, 1), (2, 1))

    def forward(self, frames):
        x = frames[:, None, :, None]
        x = self._layer(x, 1, (0, 0, 254, 254))
        for i in range(2, 7):
            x = self._layer(x, i, (0, 0, 31, 32))
        x = x.permute(0, 2, 1, 3).reshape(-1, self.in_features)
        return torch.sigmoid(self.classifier(x))


def _random_oracle(model="full", seed=0):
    torch.manual_seed(seed)
    net = _OracleCrepe(model).eval()
    # non-trivial running stats so eval-BN is actually exercised
    with torch.no_grad():
        for i in range(1, 7):
            bn = getattr(net, f"conv{i}_BN")
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
    return net


@pytest.mark.parametrize("capacity", ["full", "tiny"])
def test_crepe_forward_matches_torch_oracle(capacity):
    net = _random_oracle(capacity)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = torch_to_jax_params(sd, capacity)
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((3, 1024)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(frames)).numpy()
    got = np.asarray(crepe_forward(params, frames, capacity))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_predict_shapes_and_padding():
    net = _random_oracle("tiny")
    params = torch_to_jax_params(
        {k: v.numpy() for k, v in net.state_dict().items()}, "tiny")
    sr = 22050
    audio = np.random.default_rng(2).standard_normal(sr).astype(np.float32)
    f0, pd = predict_f0_periodicity(audio, sr, params, "tiny",
                                    batch_frames=128)
    # 1 s of audio at 10 ms hops -> ~100 frames (+1 from centering pad)
    assert abs(len(f0) - 101) <= 1 and len(f0) == len(pd)
    assert np.all(pd >= 0) and np.all(pd <= 1)
    assert np.all(f0 > 0)


def test_decoder_weighted_argmax_recovers_bin():
    """A posterior concentrated at one bin decodes to that bin's Hz."""
    from nvse_tpu.metrics.crepe_jax import (_bin_to_hz,
                                            _decode_weighted_argmax)

    probs = np.full((2, PITCH_BINS), 1e-6, np.float64)
    probs[0, 120] = 0.9
    probs[1, 200] = 0.8
    f0, pd = _decode_weighted_argmax(probs, 50.0, 550.0)
    want0 = _bin_to_hz(np.array(CENTS_PER_BIN * 120 + CENTS_OFFSET))
    want1 = _bin_to_hz(np.array(CENTS_PER_BIN * 200 + CENTS_OFFSET))
    np.testing.assert_allclose(f0, [want0, want1], rtol=1e-2)
    np.testing.assert_allclose(pd, [0.9, 0.8])


def test_periodicity_metrics_uses_crepe_when_env_set(tmp_path, monkeypatch):
    net = _random_oracle("tiny")
    ckpt = tmp_path / "tiny.pth"
    torch.save(net.state_dict(), str(ckpt))
    monkeypatch.setenv("NVSE_CREPE_CKPT", str(ckpt))
    monkeypatch.setenv("NVSE_CREPE_MODEL", "tiny")
    from nvse_tpu.metrics import dsp

    sr = 22050
    t = np.arange(sr) / sr
    ref = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = dsp.periodicity_metrics(ref, ref.copy(), sr)
    # identical signals through the same network: zero disagreement
    assert out["periodicity_rmse"] < 1e-6
    assert out["vuv_f1"] == pytest.approx(1.0)
