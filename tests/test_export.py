"""AOT serving export tests: serialize -> deserialize -> numeric parity.

The artifact embeds trained params as constants, so a serving host
needs no model code; these tests run the full round trip on CPU and
check the deserialized program against the live flax apply.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvse_tpu.infer.export import export_decoder, load_decoder
from nvse_tpu.models import build_generator, model_input_bins
from nvse_tpu.utils import AttrDict


def _hifigan_h():
    return AttrDict(dict(
        model_name="HiFiGAN", resblock="2",
        upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        sampling_rate=22050, n_fft=1024, hop_size=256, win_size=1024,
        num_mels=80, fmin=0, fmax=8000,
    ))


def _bsrnn_h():
    return AttrDict(dict(
        model_name="BSRNN", feature_dim=16, num_repeat=1, dropout=0.0,
        causal=False, sampling_rate=22050, n_fft=1024, hop_size=256,
        win_size=1024, num_mels=80, fmin=0, fmax=8000,
    ))


def _init_params(h, T=16):
    gen, _ = build_generator(h)
    example = jnp.zeros((1, model_input_bins(h), T), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), example)["params"]
    return gen, params


def _mel(h, batch, T, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, model_input_bins(h), T))
            .astype(np.float32) - 4.0)


def test_static_export_round_trip(tmp_path):
    h = _hifigan_h()
    gen, params = _init_params(h)
    path = str(tmp_path / "hifigan.nvsx")
    meta = export_decoder(h, params, path, batch=2, frames=24)
    assert meta["frames"] == 24 and meta["batch"] == 2
    dec = load_decoder(path)
    mel = _mel(h, 2, 24)
    got = np.asarray(dec(mel))
    want = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))
    assert got.shape == want.shape == (2, 24 * h.hop_size)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_polymorphic_export_decodes_multiple_lengths(tmp_path):
    h = _hifigan_h()
    gen, params = _init_params(h)
    path = str(tmp_path / "hifigan_poly.nvsx")
    meta = export_decoder(h, params, path, batch=1, frames=None)
    assert meta["frames"] is None
    dec = load_decoder(path)
    for T in (16, 40):
        mel = _mel(h, 1, T, seed=T)
        got = np.asarray(dec(mel))
        want = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))
        assert got.shape == (1, T * h.hop_size)
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_bsrnn_static_export_round_trip(tmp_path):
    h = _bsrnn_h()
    gen, params = _init_params(h)
    path = str(tmp_path / "bsrnn.nvsx")
    export_decoder(h, params, path, batch=1, frames=16)
    dec = load_decoder(path)
    mel = _mel(h, 1, 16)
    got = np.asarray(dec(mel))
    want = np.asarray(gen.apply({"params": params}, jnp.asarray(mel))[-1])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_format_version_rejects_future_artifacts(tmp_path):
    import json
    import zipfile

    h = _hifigan_h()
    _, params = _init_params(h)
    path = str(tmp_path / "v.nvsx")
    export_decoder(h, params, path, batch=1, frames=8)
    bad = str(tmp_path / "bad.nvsx")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        meta = json.loads(zin.read("meta.json"))
        meta["format_version"] = 99
        zout.writestr("meta.json", json.dumps(meta))
        zout.writestr("exported.bin", zin.read("exported.bin"))
    with pytest.raises(ValueError, match="format"):
        load_decoder(bad)
