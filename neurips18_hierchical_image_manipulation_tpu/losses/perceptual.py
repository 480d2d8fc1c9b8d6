"""VGG19 perceptual loss.

Reference contract: SURVEY.md C18 — taps at relu1_1/2_1/3_1/4_1/5_1,
weighted L1 with weights [1/32, 1/16, 1/8, 1/4, 1]. The reference feeds
[-1,1] images straight in (no ImageNet normalization) and detaches the
real branch.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(vgg_apply, vgg_params, fake, real):
    """vgg_apply: Vgg19Features.apply; fake/real: (B,H,W,3) in [-1,1]."""
    from ..ops.pallas import config as pallas_config
    from ..ops.pallas.losses import l1_to_scalar

    use_pallas = pallas_config.losses_enabled()

    def mean_abs(diff):
        return l1_to_scalar(diff) if use_pallas else jnp.mean(jnp.abs(diff))

    taps_fake = vgg_apply(vgg_params, fake)
    taps_real = vgg_apply(vgg_params, lax.stop_gradient(real))
    loss = 0.0
    for w, tf_, tr in zip(VGG_WEIGHTS, taps_fake, taps_real):
        loss = loss + w * mean_abs(tf_ - lax.stop_gradient(tr))
    return loss
