from .griffin_lim import griffin_lim
from .resample import downsample2, upsample2
from .spectral import (
    amp_pha_spectrum,
    dynamic_range_compression,
    dynamic_range_decompression,
    hann_window,
    inverse_mel,
    inverse_mel_basis,
    StreamingOLA,
    istft,
    istft_frames,
    istft_ri,
    mel_filterbank,
    mel_spectrogram,
    mel_spectrogram_np,
    stft,
    stft_ri,
)
