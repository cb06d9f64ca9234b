"""Drop-in shim for the reference's Metrics/f0/f0.py (Amphion utility
module). The real implementations live in nvse_tpu.metrics.f0_lib,
backed by the in-repo DIO/YIN/Boersma-AC extractors instead of the
pyworld/librosa/parselmouth/torchcrepe C extensions."""
from nvse_tpu.metrics.f0_lib import (  # noqa: F401
    f0_to_coarse,
    get_bin_index,
    get_cents,
    get_f0,
    get_f0_features_using_crepe,
    get_f0_features_using_dio,
    get_f0_features_using_harvest,
    get_f0_features_using_parselmouth,
    get_f0_features_using_pyin,
    get_log_f0,
    get_pitch_derivatives,
    get_pitch_sub_median,
    interpolate,
)
