"""Structure-generator (box2mask) reconstruction losses [P §3.2].

Per-pixel cross-entropy between the predicted layout logits and the GT
semantic layout of the crop, plus a BCE term on the object-mask stream
(SURVEY.md C14: "per-pixel CE reconstruction + conditional adversarial").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layout_ce_loss(layout_logits, gt_label_ids, weight_mask=None):
    """layout_logits: (B,H,W,C); gt_label_ids: (B,H,W) int. Mean per-pixel
    CE, optionally weighted by (B,H,W,1) mask (e.g. emphasize in-box)."""
    logp = jax.nn.log_softmax(layout_logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, gt_label_ids.astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
    if weight_mask is not None:
        w = weight_mask[..., 0]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(nll)


def object_mask_loss(mask_logit, gt_mask, boxmask):
    """BCE (with logits) on the object-mask stream, restricted to the box
    interior — outside the box the stream is undefined by construction."""
    x = mask_logit[..., 0]
    t = gt_mask[..., 0]
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    w = boxmask[..., 0]
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)
