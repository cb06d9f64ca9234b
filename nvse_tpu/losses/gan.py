"""GAN adversarial + feature-matching losses.

Semantics from reference Models/models.py:607-661. The reference's
trainers import plain `generator_loss`/`discriminator_loss` names that
its shared module no longer defines (an ImportError as shipped —
SURVEY.md §2.4); the intended behaviour is the least-squares variants,
which we export under both names.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def feature_loss(fmap_r: Sequence[Sequence[jnp.ndarray]], fmap_g: Sequence[Sequence[jnp.ndarray]]) -> jnp.ndarray:
    """Sum of mean-abs feature-map distances (Models/models.py:607-613).

    Note: some per-model copies in the reference return 2x this value
    (e.g. hifigan.py:259-265); the shared-module semantics (x1) is what
    the TF/time trainers actually import, so that is what we implement.
    """
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss


def ls_discriminator_loss(real_outputs, generated_outputs):
    """LS-GAN D loss: E[(1-D(y))^2] + E[D(G)^2] (Models/models.py:629-640)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def ls_generator_loss(disc_outputs):
    """LS-GAN G loss: E[(1-D(G))^2] (Models/models.py:653-661)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def hinge_discriminator_loss(real_outputs, generated_outputs):
    """Hinge D loss (Models/models.py:616-627)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        r_loss = jnp.mean(jnp.maximum(1.0 - dr, 0.0))
        g_loss = jnp.mean(jnp.maximum(1.0 + dg, 0.0))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def hinge_generator_loss(disc_outputs):
    """Hinge G loss (Models/models.py:643-651)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.maximum(1.0 - dg, 0.0))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


# The names the reference trainers use (LS semantics — SURVEY.md §2.4 note)
discriminator_loss = ls_discriminator_loss
generator_loss = ls_generator_loss
