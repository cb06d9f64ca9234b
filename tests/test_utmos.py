"""UTMOS scoring-path tests (no checkpoint available offline, so the
wiring is validated structurally: forward shape/finiteness and a full
state-dict round-trip through the lightning-checkpoint key mapping)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nvse_tpu.metrics.utmos_torch import (  # noqa: E402
    UTMOSModel,
    _PREFIX_MAP,
    load_utmos,
    map_lightning_state_dict,
)


def _tiny_model(monkeypatch_layers=2):
    """Full-architecture model is ~95M params; tests run it as-is but on
    short audio — wav2vec2-base at 0.35 s is ~17 frames, fast on CPU."""
    torch.manual_seed(0)
    return UTMOSModel().eval()


def test_forward_shape_and_range():
    model = _tiny_model()
    wav = torch.randn(2, 5600) * 0.1
    with torch.no_grad():
        out = model(wav)
    assert out.shape == (2,)
    assert torch.isfinite(out).all()
    # output = raw*2+3 with raw near 0 at random init
    assert (out > -7).all() and (out < 13).all()


def test_lightning_key_mapping_roundtrip(tmp_path):
    """Rename a model's state dict to the lightning layout, save as a
    .ckpt, and load through load_utmos — every tensor must survive."""
    model = _tiny_model()
    sd = model.state_dict()

    inverse = {dst: src for src, dst in _PREFIX_MAP}
    lightning_sd = {}
    for k, v in sd.items():
        for dst, src in inverse.items():
            if k.startswith(dst):
                lightning_sd["model." + src + k[len(dst):]] = v
                break
        else:
            raise AssertionError(f"unmapped model key {k}")
    # pretraining-only tensors the real ckpt carries must be skipped
    lightning_sd["model.feature_extractors.0.ssl_model.mask_emb"] = torch.zeros(768)

    mapped = map_lightning_state_dict(lightning_sd)
    assert set(mapped) == set(sd)

    ckpt = tmp_path / "epoch=3-step=7459.ckpt"
    torch.save({"state_dict": lightning_sd}, ckpt)
    loaded = load_utmos(str(ckpt))
    for k, v in loaded.state_dict().items():
        assert torch.equal(v, sd[k]), k


def test_score_dir(tmp_path):
    from nvse_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(tmp_path / f"a{i}.wav"),
                  (0.1 * rng.standard_normal(4000)).astype(np.float32), 16000)
    model = _tiny_model()
    ckpt = tmp_path / "m.ckpt"

    inverse = {dst: src for src, dst in _PREFIX_MAP}
    lightning_sd = {}
    for k, v in model.state_dict().items():
        for dst, src in inverse.items():
            if k.startswith(dst):
                lightning_sd["model." + src + k[len(dst):]] = v
                break
    torch.save({"state_dict": lightning_sd}, ckpt)

    from nvse_tpu.metrics.utmos_torch import score_dir

    mean_, std_ = score_dir(str(tmp_path), str(ckpt))
    assert np.isfinite(mean_) and np.isfinite(std_)
