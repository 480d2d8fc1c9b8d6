"""Discriminator feature-matching loss.

Reference contract: SURVEY.md C19 — L1 between per-layer D features of
fake vs real (real detached by the caller), weights
``feat_w = 4/(n_layers_D+1)``, ``D_w = 1/num_D``, scaled by lambda_feat.
The per-layer loop excludes the final logits layer? No — pix2pixHD loops
``for j in range(len(pred_fake[i])-1)``: every layer EXCEPT the last
(logits) contributes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def feature_matching_loss(d_fake, d_real, n_layers_D=3, num_D=2, lambda_feat=10.0):
    """d_fake/d_real: multiscale lists of per-layer feature lists. The real
    branch is stop-gradient'ed here (mirrors ``.detach()``)."""
    from ..ops.pallas import config as pallas_config
    from ..ops.pallas.losses import l1_to_scalar

    use_pallas = pallas_config.losses_enabled()

    def mean_abs(diff):
        return l1_to_scalar(diff) if use_pallas else jnp.mean(jnp.abs(diff))

    feat_w = 4.0 / (n_layers_D + 1)
    d_w = 1.0 / num_D
    loss = 0.0
    for scale_fake, scale_real in zip(d_fake, d_real):
        for f_fake, f_real in zip(scale_fake[:-1], scale_real[:-1]):
            loss = loss + feat_w * d_w * mean_abs(
                f_fake - lax.stop_gradient(f_real)
            ) * lambda_feat
    return loss
