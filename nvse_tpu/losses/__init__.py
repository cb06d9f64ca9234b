from .gan import (
    feature_loss,
    hinge_discriminator_loss,
    hinge_generator_loss,
    ls_discriminator_loss,
    ls_generator_loss,
    discriminator_loss,
    generator_loss,
)
from .spectral import (
    amplitude_loss,
    anti_wrapping_function,
    mel_loss,
    multi_resolution_mel_loss,
    phase_loss,
    stft_consistency_loss,
)
