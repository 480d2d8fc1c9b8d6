"""box2mask model wiring — the structure-generator stage (SURVEY.md C14).

Two-stream encoder-decoder inpaints the semantic layout inside a user box
[P §3.2]: object stream -> sigmoid object mask for class c, context stream
-> softmax layout; merged = context overwritten by class c inside the mask.
Losses: per-pixel CE reconstruction factored per stream (context CE
weighted by 1 - object mask — the gradient the paper's merged-map CE
delivers — + BCE on the object stream inside the box) + conditional
adversarial from a layout discriminator over (layout, class, box mask).

Batches are fixed-size context-window crops (jit-static) produced by
``data/bbox.py``:
  masked_layout (B,S,S) int ids with the box interior set to the ignore id,
  gt_layout (B,S,S) int ids, boxmask (B,S,S,1) in-window object box,
  cls (B,) int class id, gt_objmask (B,S,S,1) binary GT object mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..losses import (
    discriminator_loss,
    gan_loss,
    layout_ce_loss,
    object_mask_loss,
)
from ..ops import onehot_edges
from . import networks


def _sg_tree(tree):
    return jax.tree.map(lax.stop_gradient, tree)


@dataclass
class BoxToMaskModel:
    opt: Any
    netG: Any = None
    netD: Any = None

    def __post_init__(self):
        if self.netG is None:
            self.netG = networks.TwoStreamStructureGenerator(
                label_nc=self.opt.label_nc,
                ngf=self.opt.ngf,
                n_downsampling=self.opt.n_downsample_global,
                n_blocks=self.opt.n_blocks_global,
                norm=self.opt.norm,
            )
        if self.netD is None and self.opt.isTrain:
            # get_interm_feat stays False: box2mask trains on CE + obj-BCE
            # + adversarial ONLY (no feature-matching term — the
            # reference's structure-generator objective; --no_ganFeat_loss
            # governs the mask2image model). Returning interm features
            # here would imply FM supervision losses() never computes.
            self.netD = networks.LayoutDiscriminator(
                ndf=self.opt.ndf,
                n_layers=self.opt.n_layers_D,
                get_interm_feat=False,
                norm=self.opt.norm,
            )

    def encode_input(self, batch: Dict[str, jnp.ndarray]):
        boxmask = batch["boxmask"]
        dt = boxmask.dtype  # follows the bf16 policy cast
        masked_oh = onehot_edges.one_hot_label(
            batch["masked_layout"], self.opt.label_nc, dtype=dt
        )
        # inside the box the layout is unknown: zero the one-hot there
        masked_oh = masked_oh * (1.0 - boxmask)
        cls_oh = jax.nn.one_hot(batch["cls"], self.opt.label_nc, dtype=dt)
        return masked_oh, boxmask, cls_oh

    def init_params(self, rng, batch):
        masked_oh, boxmask, cls_oh = self.encode_input(batch)
        kg, kd = jax.random.split(rng)
        params = {"G": self.netG.init(kg, masked_oh, boxmask, cls_oh)}
        if self.netD is not None:
            gt_oh = onehot_edges.one_hot_label(batch["gt_layout"], self.opt.label_nc)
            params["D"] = self.netD.init(kd, gt_oh, boxmask, cls_oh)
        return params

    def losses(self, params, batch, vgg_params=None):
        opt = self.opt
        masked_oh, boxmask, cls_oh = self.encode_input(batch)
        layout_logits, mask_logit, merged = self.netG.apply(
            params["G"], masked_oh, boxmask, cls_oh
        )

        gt_ids = batch["gt_layout"]
        # Reconstruction, factored per stream [P §3.2]: the paper's CE on
        # the MERGED map gives the context stream gradient weighted by
        # (1 - object mask) — i.e. NO context supervision at object
        # pixels. Reproduce that by weighting the context CE with
        # (1 - gt_objmask): in-box non-object pixels teach it to inpaint
        # the surroundings, object pixels leave it free to extrapolate
        # context — which is exactly what remove-mode inference reads
        # (eval/two_step.py fills from ctx_probs under the null class).
        # Supervising the context stream to the full GT instead trains it
        # to DRAW the object, and removal degenerates to repainting it
        # (measured: remove context-restore acc 0.09 -> see
        # reports/two_step_r05/summary.json for the gated value).
        ctx_w = 1.0 - batch["gt_objmask"]
        loss_recon = opt.lambda_recon * layout_ce_loss(
            layout_logits, gt_ids, weight_mask=ctx_w
        )
        loss_obj = opt.lambda_recon * object_mask_loss(
            mask_logit, batch["gt_objmask"], boxmask
        )
        # Negative-class penalty (--lambda_ctx_neg): at OBJECT pixels the
        # context stream has no positive target (the true background is
        # occluded) but one thing is certain — it is not the occluding
        # object itself. Penalize the context softmax mass it puts on the
        # sample's own class there: -log(1 - p_cls). Kills the failure
        # mode where removal repaints the removed object (measured round
        # 5: remove restore acc 0.69 with the penalty off — the residual
        # error was exactly ctx painting class 26 in-box). cls = -1 (bg
        # samples) one-hots to zeros -> p_own = 0 -> no penalty.
        lam_neg = getattr(opt, "lambda_ctx_neg", 0.0)
        if lam_neg:
            ctx_p = jax.nn.softmax(layout_logits.astype(jnp.float32), axis=-1)
            p_own = (ctx_p * cls_oh[:, None, None, :].astype(jnp.float32)).sum(
                -1, keepdims=True
            )
            obj = batch["gt_objmask"].astype(jnp.float32)
            neg = -jnp.log1p(-jnp.minimum(p_own, 1.0 - 1e-4)) * obj
            loss_ctx_neg = lam_neg * neg.sum() / jnp.maximum(obj.sum(), 1.0)
        else:
            loss_ctx_neg = 0.0

        use_lsgan = not opt.no_lsgan
        d_sg = _sg_tree(params["D"])
        d_fake_for_g = self.netD.apply(d_sg, merged, boxmask, cls_oh)
        loss_g_gan = gan_loss(d_fake_for_g, True, use_lsgan)

        gt_oh = onehot_edges.one_hot_label(gt_ids, opt.label_nc, dtype=merged.dtype)
        merged_sg = lax.stop_gradient(merged)
        # ONE batched D apply over [gt; merged.detach()] — neither needs
        # input grads, IN is per-sample, the (cls ⊕ boxmask) conditioning
        # partial conv computes once and tiles (networks.Conv)
        d_rf = self.netD.apply(
            params["D"], jnp.concatenate([gt_oh, merged_sg], axis=0), boxmask, cls_oh
        )
        nb = gt_oh.shape[0]
        d_real = [f[:nb] for f in d_rf]
        d_fake = [f[nb:] for f in d_rf]
        loss_d, loss_d_real, loss_d_fake = discriminator_loss(d_real, d_fake, use_lsgan)

        total = loss_recon + loss_obj + loss_ctx_neg + loss_g_gan + loss_d
        metrics = {
            "G_GAN": loss_g_gan,
            "G_recon": loss_recon,
            "G_obj": loss_obj,
            "D_real": loss_d_real,
            "D_fake": loss_d_fake,
        }
        if lam_neg:
            metrics["G_ctxneg"] = loss_ctx_neg
        return total, (metrics, merged)

    def inference(self, params, batch, return_ctx=False):
        """Returns (merged layout probs, object mask probs[, ctx probs]).

        ``return_ctx=True`` also returns the context stream's softmax —
        needed by remove-mode fills: merged = ctx*(1-m) is all-zeros
        wherever the object mask saturates to exactly 1.0 (null class
        vector contributes nothing), so argmax(merged) there ties to
        class 0 ('unlabeled') instead of the context prediction."""
        masked_oh, boxmask, cls_oh = self.encode_input(batch)
        layout_logits, mask_logit, merged = self.netG.apply(
            params["G"], masked_oh, boxmask, cls_oh
        )
        obj = jax.nn.sigmoid(mask_logit) * boxmask
        if return_ctx:
            return merged, obj, jax.nn.softmax(layout_logits, axis=-1)
        return merged, obj
