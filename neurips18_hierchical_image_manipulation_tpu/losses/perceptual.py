"""VGG19 perceptual loss.

Reference contract: SURVEY.md C18 — taps at relu1_1/2_1/3_1/4_1/5_1,
weighted L1 with weights [1/32, 1/16, 1/8, 1/4, 1]. The reference feeds
[-1,1] images straight in (no ImageNet normalization) and detaches the
real branch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

# Optionally rematerialize the VGG forward in the backward pass instead
# of saving its (huge, full-res) block-1/2 activations. Hypothesis was
# that freeing GBs of live HBM lets XLA stop auto-rematting the rest of
# the step — MEASURED FALSE end-to-end (75.9 vs 81.3 img/s, full GAN step
# 512x256 bs32 bf16, 2026-08-16): XLA's own remat schedule beats the
# hand-forced checkpoint boundary. Off by default; HIMAN_VGG_REMAT=1 to
# re-test on other shapes/HBM budgets.
_VGG_REMAT = os.environ.get("HIMAN_VGG_REMAT", "0") == "1"


def vgg_loss(vgg_apply, vgg_params, fake, real):
    """vgg_apply: Vgg19Features.apply; fake/real: (B,H,W,3) in [-1,1]."""
    from ..ops.pallas import config as pallas_config
    from ..ops.pallas.losses import l1_to_scalar

    use_pallas = pallas_config.losses_enabled()

    def mean_abs(diff):
        return l1_to_scalar(diff) if use_pallas else jnp.mean(jnp.abs(diff))

    apply = jax.checkpoint(vgg_apply) if _VGG_REMAT else vgg_apply
    taps_fake = apply(vgg_params, fake)
    taps_real = apply(vgg_params, lax.stop_gradient(real))
    loss = 0.0
    for w, tf_, tr in zip(VGG_WEIGHTS, taps_fake, taps_real):
        loss = loss + w * mean_abs(tf_ - lax.stop_gradient(tr))
    return loss
