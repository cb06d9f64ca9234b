"""Multi-scale sub-band CQT discriminator.

Re-derived from reference Models/models.py:384-592 (itself an Amphion
port): per scale, the input is 2x sinc-upsampled, CQT-analysed
(complex), amplitude+phase stacked as 2 channels, a per-octave pre-conv
applied over each octave's bins, then a dilated (3,9)-kernel conv stack
with weight norm and a post conv. Defined-but-unused in the reference's
entry points; provided here for completeness and opt-in use via
h.use_cqtd.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import upsample2
from ..ops.cqt import cqt
from .layers import Conv2d, leaky_relu


class DiscriminatorCQT(nn.Module):
    sampling_rate: int
    hop_length: int
    n_octaves: int
    bins_per_octave: int
    filters: int = 32
    max_filters: int = 1024
    filters_scale: int = 1
    dilations: Sequence[int] = (1, 2, 4)
    in_channels: int = 1
    out_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        fmap = []
        ks = (3, 9)

        def pad2d(k, d=(1, 1)):
            return (((k[0] - 1) * d[0]) // 2, ((k[1] - 1) * d[1]) // 2)

        x2 = upsample2(x)  # resample fs -> 2*fs (models.py:482,508)
        n_bins = self.bins_per_octave * self.n_octaves
        re, im = cqt(x2, 2 * self.sampling_rate, self.hop_length,
                     n_bins, self.bins_per_octave)
        # (B, 2ch, T, W) in torch -> ours (B, T, W, 2)
        z = jnp.stack([re, im], axis=-1)          # (B, W, T, 2)
        z = jnp.swapaxes(z, 1, 2)                  # (B, T, W, 2)

        cin = self.in_channels * 2
        lat = []
        for i in range(self.n_octaves):
            sl = z[:, :, i * self.bins_per_octave : (i + 1) * self.bins_per_octave, :]
            lat.append(Conv2d(cin, cin, ks, padding=pad2d(ks))(sl))
        latent = jnp.concatenate(lat, axis=2)

        latent = Conv2d(cin, self.filters, ks, padding=pad2d(ks))(latent)
        latent = leaky_relu(latent, 0.1)
        fmap.append(latent)

        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, d in enumerate(self.dilations):
            out_chs = min(self.filters_scale ** (i + 1) * self.filters, self.max_filters)
            latent = Conv2d(in_chs, out_chs, ks, stride=(1, 2),
                            dilation=(d, 1), padding=pad2d(ks, (d, 1)),
                            use_weight_norm=True)(latent)
            latent = leaky_relu(latent, 0.1)
            fmap.append(latent)
            in_chs = out_chs
        out_chs = min(self.filters_scale ** (len(self.dilations) + 1) * self.filters,
                      self.max_filters)
        latent = Conv2d(in_chs, out_chs, (ks[0], ks[0]),
                        padding=pad2d((ks[0], ks[0])), use_weight_norm=True)(latent)
        latent = leaky_relu(latent, 0.1)
        fmap.append(latent)
        latent = Conv2d(out_chs, self.out_channels, (ks[0], ks[0]),
                        padding=pad2d((ks[0], ks[0])), use_weight_norm=True)(latent)
        return latent.reshape(latent.shape[0], -1), fmap


class MultiScaleSubbandCQTDiscriminator(nn.Module):
    """Three CQT scales (models.py:543-592)."""

    sampling_rate: int = 22050
    hop_lengths: Sequence[int] = (512, 256, 256)
    n_octaves: Sequence[int] = (9, 9, 9)
    bins_per_octaves: Sequence[int] = (24, 36, 48)
    filters: int = 32
    max_filters: int = 1024
    filters_scale: int = 1
    dilations: Sequence[int] = (1, 2, 4)
    in_channels: int = 1
    out_channels: int = 1

    @classmethod
    def from_config(cls, h) -> "MultiScaleSubbandCQTDiscriminator":
        # full reference key set (models.py:389-397); every cqtd_* knob
        # must reach the per-scale discriminators, not just the defaults
        return cls(
            sampling_rate=h.sampling_rate,
            hop_lengths=tuple(h.get("cqtd_hop_lengths", (512, 256, 256))),
            n_octaves=tuple(h.get("cqtd_n_octaves", (9, 9, 9))),
            bins_per_octaves=tuple(h.get("cqtd_bins_per_octaves", (24, 36, 48))),
            filters=h.get("cqtd_filters", 32),
            max_filters=h.get("cqtd_max_filters", 1024),
            filters_scale=h.get("cqtd_filters_scale", 1),
            dilations=tuple(h.get("cqtd_dilations", (1, 2, 4))),
            in_channels=h.get("cqtd_in_channels", 1),
            out_channels=h.get("cqtd_out_channels", 1),
        )

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for hop, no, bpo in zip(self.hop_lengths, self.n_octaves, self.bins_per_octaves):
            d = DiscriminatorCQT(
                sampling_rate=self.sampling_rate, hop_length=hop,
                n_octaves=no, bins_per_octave=bpo, filters=self.filters,
                max_filters=self.max_filters,
                filters_scale=self.filters_scale,
                dilations=self.dilations,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
            )
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
