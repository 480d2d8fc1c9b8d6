"""GAN losses — LSGAN (MSE) default, vanilla BCE under --no_lsgan.

Reference contract: SURVEY.md C17 (``networks.py::GANLoss`` [L]). The
reference caches target tensors and accepts multiscale list-of-lists,
using the LAST feature of each per-scale list (the logits). Loss over
scales is SUMMED (pix2pixHD accumulates ``loss += self.loss(...)``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _single(pred, target_is_real, use_lsgan):
    target = 1.0 if target_is_real else 0.0
    if use_lsgan:
        from ..ops.pallas import config as pallas_config
        from ..ops.pallas.losses import mse_to_scalar

        if pallas_config.losses_enabled():
            return mse_to_scalar(pred - target)
        return jnp.mean(jnp.square(pred - target))
    # vanilla: BCE with logits
    # -[t*log(sigmoid(x)) + (1-t)*log(1-sigmoid(x))], stable form
    x = pred
    t = target
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def gan_loss(d_out, target_is_real, use_lsgan=True):
    """d_out: multiscale list of per-layer feature lists (last = logits),
    a single list, or a raw logits array. Returns the summed-over-scales
    scalar loss — exactly GANLoss.__call__'s list-of-lists handling."""
    if isinstance(d_out, (list, tuple)) and len(d_out) and isinstance(
        d_out[0], (list, tuple)
    ):
        total = 0.0
        for scale in d_out:
            total = total + _single(scale[-1], target_is_real, use_lsgan)
        return total
    if isinstance(d_out, (list, tuple)):
        return _single(d_out[-1], target_is_real, use_lsgan)
    return _single(d_out, target_is_real, use_lsgan)


def discriminator_loss(d_real, d_fake, use_lsgan=True):
    """L_D = 0.5*(MSE(D(real),1) + MSE(D(fake),0)) — SURVEY §3.2 Losses."""
    loss_real = gan_loss(d_real, True, use_lsgan)
    loss_fake = gan_loss(d_fake, False, use_lsgan)
    return 0.5 * (loss_real + loss_fake), loss_real, loss_fake
