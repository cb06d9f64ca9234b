"""Model registry.

The reference selects models with ``eval(h.model_name)(h)``
(train_tf_wi_inv.py:54); here a registry maps the same config names to
Flax module factories. ``build_generator(h)`` returns
``(module, domain)`` where domain is "tf" (returns the 5-tuple
(logamp, pha, rea, imag, wav)) or "time" (returns wav).
"""
from __future__ import annotations

from .apnet import APNet, APNet2, FreeV
from .bsrnn import BSRNN, BSRNN_24k
from .convtasnet import ConvTasNet
from .cqt_discriminator import DiscriminatorCQT, MultiScaleSubbandCQTDiscriminator
from .discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
)
from .gcrn import GCRN
from .hddemucas import HDDemucas
from .hifigan import HiFiGAN
from .istftnet import ISTFTNet
from .vocos import Vocos

# name -> (factory, domain); names match the reference cfgs' model_name
_REGISTRY: dict = {
    "HiFiGAN": (HiFiGAN, "time"),
    "iSTFTNet": (ISTFTNet, "time"),
    "APNet": (APNet, "tf"),
    "APNet2": (APNet2, "tf"),
    "FreeV": (FreeV, "tf"),
    "BSRNN": (BSRNN, "tf"),
    "BSRNN_24k": (BSRNN_24k, "tf"),
    "GCRN": (GCRN, "tf"),
    "ConvTasNet": (ConvTasNet, "time"),
    "HDDemucas": (HDDemucas, "time"),
    "Vocos": (Vocos, "tf"),
}


def register_model(name: str, factory, domain: str) -> None:
    _REGISTRY[name] = (factory, domain)


def model_domain(name: str) -> str:
    return _REGISTRY[name][1]


def model_input_bins(h) -> int:
    """Feature rows the generator consumes: mel bins for mel->wav
    models; full one-sided spectrum bins for the log-spectrum models
    (BSRNN_24k, whose input is a noisy log-amplitude or log
    pseudo-inverse-mel spectrum — reference bsrnn_24k.py:79-100)."""
    return h.n_fft // 2 + 1 if h.model_name == "BSRNN_24k" else h.num_mels


def build_generator(h):
    """Construct the generator named by h.model_name from config h."""
    try:
        factory, domain = _REGISTRY[h.model_name]
    except KeyError:
        raise KeyError(
            f"unknown model {h.model_name!r}; known: {sorted(_REGISTRY)}"
        ) from None
    return factory.from_config(h), domain
