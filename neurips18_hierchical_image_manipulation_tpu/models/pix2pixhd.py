"""mask2image model wiring — the pix2pixHD-style stage (SURVEY.md C13).

Wires generator, multiscale PatchGAN D, VGG19, and the LSGAN + FM + VGG
losses into pure functions over a ``{'G':…,'D':…}`` param pytree. The
fork's modification vs stock pix2pixHD [P §3.3]: the generator is
additionally conditioned on the *masked RGB image* (box interior zeroed)
so it inpaints the box region coherently; enabled by
``opt.use_masked_image`` and a ``boxes`` field in the batch.

The reference's ``forward`` returns
``[loss_G_GAN, loss_G_GAN_Feat, loss_G_VGG, loss_D_real, loss_D_fake], fake``
(SURVEY.md C13) — ``losses()`` below returns the same quantities as a dict.

Gradient flow replaces ``.detach()``/backward ordering with stop_gradient:
  * L_G sees D through stop_gradient'ed D params (G gets grads THROUGH the
    D computation, D params get none — matching loss_G.backward() +
    optimizer_G.step() with D grads zeroed afterwards);
  * L_D sees a stop_gradient'ed fake.
Both gradients are taken at the same (θG, θD) — exactly the reference's
compute-both-then-step-both semantics (SURVEY.md §8 "GAN two-optimizer
step under jit").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..losses import (
    discriminator_loss,
    feature_matching_loss,
    gan_loss,
    vgg_loss,
)
from ..ops import boxcomposite, nnops, onehot_edges
from . import networks


def _sg_tree(tree):
    return jax.tree.map(lax.stop_gradient, tree)


@dataclass
class Pix2PixHDModel:
    """Functional model bundle for the mask2image stage."""

    opt: Any
    netG: Any = None
    netD: Any = None
    vgg: Any = None

    netE: Any = None

    def __post_init__(self):
        if self.netG is None:
            self.netG = networks.define_G(self.opt)
        if self.netD is None and self.opt.isTrain:
            self.netD = networks.define_D(self.opt)
        if self.vgg is None and self.opt.isTrain and not self.opt.no_vgg_loss:
            self.vgg = networks.Vgg19Features()
        if self.netE is None and self.use_features():
            # pix2pixHD instance-feature encoder (C15 Encoder): per-instance
            # pooled features appended to the G conditioning
            self.netE = networks.Encoder(
                feat_num=self.opt.feat_num,
                nef=self.opt.nef,
                n_downsampling=self.opt.n_downsample_E,
                norm=self.opt.norm,
                label_nc=self.opt.label_nc,
            )

    def use_features(self):
        return getattr(self.opt, "instance_feat", False) or getattr(
            self.opt, "label_feat", False
        )

    # ---- input encoding (SURVEY §3.2 encode_input hot path, on-device) ----

    def generator_input_nc(self):
        nc = self.opt.label_nc
        if not self.opt.no_instance:
            nc += 1
        if getattr(self.opt, "use_masked_image", False):
            nc += 3
        if self.use_features():
            nc += self.opt.feat_num
        return nc

    def _instance_features(self, params, batch):
        """Encoder features: per-instance pooled maps from the REAL image
        at train time (pix2pixHD behavior); at test callers supply
        ``batch['feat']`` (e.g. cluster-sampled) or we encode the input
        image when use_encoded_image is set."""
        if "feat" in batch:
            return batch["feat"]
        seg = batch["inst"] if getattr(self.opt, "instance_feat", False) else batch["label"]
        return self.netE.apply(params["E"], batch["image"], seg)

    def encode_input(self, batch: Dict[str, jnp.ndarray], params=None):
        """batch: label (B,H,W) int ids; inst (B,H,W) int; image (B,H,W,3)
        in [-1,1] float — or raw uint8 under --uint8_transfer, normalized
        here on-device ((x/127.5)-1, fused into the step; 3.3x less
        host->device traffic). boxes (B,4) optional.
        Returns (g_input, d_cond, real)."""
        batch = dict(batch)
        img = batch.get("image")
        if img is not None and img.dtype == jnp.uint8:
            # normalize in the dtype the step actually computes in: any
            # float batch leaf (the bf16 policy casts those first), else
            # the params' float dtype, else f32 (fresh init). 'boxes' is
            # NOT a valid dtype witness: the bf16 cast deliberately
            # excludes it (train/steps._COORD_KEYS keeps pixel coords
            # fp32), so under --uint8_transfer it can be the ONLY float
            # leaf and would fp32-poison the conv stack against bf16
            # params (crashed bench_loop's fused u8 legs, 2026-08-19)
            from ..train.steps import _COORD_KEYS

            dt = None
            for k, v in batch.items():
                if (
                    k not in _COORD_KEYS
                    and hasattr(v, "dtype")
                    and jnp.issubdtype(v.dtype, jnp.floating)
                ):
                    dt = v.dtype
                    break
            if dt is None and params is not None:
                for leaf in jax.tree.leaves(params):
                    if hasattr(leaf, "dtype") and jnp.issubdtype(
                        leaf.dtype, jnp.floating
                    ):
                        dt = leaf.dtype
                        break
            dt = dt or jnp.float32
            batch["image"] = img.astype(dt) / jnp.asarray(127.5, dt) - 1.0
        # follow the image dtype so the bf16 policy reaches the one-hot
        # conditioning tensors built on-device here
        dt = batch["image"].dtype if "image" in batch else jnp.float32
        inst = None if self.opt.no_instance else batch["inst"]
        g_extra = []
        if getattr(self.opt, "use_masked_image", False):
            boxes = batch["boxes"]
            masked = boxcomposite.mask_box(batch["image"], boxes, fill=0.0)
            g_extra.append(masked)
        if self.use_features() and params is not None and "E" in params:
            # d_losses passes a {G, D}-only tree purely as a dtype witness
            # for the uint8 normalize — no encoder features there (its
            # cond-parity assertion guards this)
            g_extra.append(self._instance_features(params, batch).astype(dt))
        if g_extra:
            rgb = g_extra[0] if len(g_extra) == 1 else jnp.concatenate(g_extra, -1)
            h, w = batch["label"].shape[1:3]
            if (
                nnops.stem_pack_enabled()
                and isinstance(self.netG, networks.GlobalGenerator)
                and self.netG.norm == "instance"
                and self.netG.n_downsampling >= 1
                and h % 2 == 0
                and w % 2 == 0
            ):
                # packed stem region: build the generator input pre-padded
                # (reflect 3 == the stem's ReflectionPad) and s2d-by-2
                # packed in ONE fused write; GlobalGenerator runs conv_in/
                # IN/relu/down0 fully packed (58->full-tile MXU economics
                # for the 39->64 7x7 stem). D's cond is built separately
                # (it needs the unpacked pyramid anyway).
                from ..ops.pallas import config as pallas_config

                from ..ops.pallas import encode as pallas_encode

                if (
                    pallas_config.encode_enabled()
                    and inst is not None
                    and not self.use_features()
                    and len(g_extra) == 1
                    and h % 32 == 0  # cond kernel row-tile; odd heights
                    # would force a whole-image VMEM block — jnp path then
                    # VMEM gate (encode.rows_fit): 1024p-class widths OOM
                    # scoped vmem in compile
                    and pallas_encode.rows_fit(w, self.opt.label_nc, dt)
                ):
                    # Pallas fused build: pads + edges + one-hot + mask_box
                    # + s2d2 in one VMEM pass per tile (ops/pallas/encode).
                    # Mode 2 keeps cond on XLA's fused build so the
                    # one-hot -> avgpool producer fusion of the D cond
                    # pyramid survives (see pallas/config.py).
                    g_packed = pallas_encode.encode_packed(
                        batch["label"], batch["inst"], batch["image"],
                        batch["boxes"], self.opt.label_nc, dt,
                    )
                    if pallas_config.encode_cond_enabled():
                        cond = pallas_encode.encode_cond(
                            batch["label"], batch["inst"], self.opt.label_nc, dt
                        )
                        if (
                            pallas_config.encode_pool_enabled()
                            and getattr(self.opt, "num_D", 0) == 2
                            and h % 32 == 0
                            and h >= 64
                        ):
                            # mode 3: hand D a precomputed cond pyramid so
                            # the materialized cond never pays a pool
                            # re-read (networks.MultiscaleDiscriminator
                            # tuple form)
                            cond = (
                                cond,
                                pallas_encode.encode_cond_pooled(
                                    batch["label"], batch["inst"],
                                    self.opt.label_nc, dt,
                                ),
                            )
                    else:
                        cond = onehot_edges.encode_input(
                            batch["label"], inst, self.opt.label_nc, dtype=dt
                        )
                    return (
                        (nnops.PackedStemInput(g_packed), None),
                        cond,
                        batch.get("image"),
                    )
                ids_p = jnp.pad(
                    batch["label"].astype(jnp.int32),
                    ((0, 0), (3, 3), (3, 3)),
                    mode="reflect",
                )
                edge_p = None
                if inst is not None:
                    edge = onehot_edges.instance_edges(inst, jnp.bool_)
                    edge_p = jnp.pad(
                        edge, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect"
                    )
                rgb_p = jnp.pad(
                    rgb, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect"
                )
                g_packed = onehot_edges.encode_input_rgb_packed(
                    ids_p, edge_p, rgb_p, self.opt.label_nc, dtype=dt
                )
                cond = onehot_edges.encode_input(
                    batch["label"], inst, self.opt.label_nc, dtype=dt
                )
                return (nnops.PackedStemInput(g_packed), None), cond, batch.get("image")
            # ONE fused build of the full (one-hot ⊕ edge ⊕ rgb extras)
            # generator input — no full-res concats (each cost 5-8 ms/step
            # at 512x256 bs32), one stem conv (splitting the stem into
            # partial convs measured 33.6 vs 26.8 ms: the 3ch partial pays
            # a full MXU pass). D's cond is a contiguous channel slice.
            from ..ops.pallas import config as pallas_config

            from ..ops.pallas import encode as pallas_encode

            if (
                pallas_config.encode_enabled()
                and inst is not None
                and not self.use_features()
                and len(g_extra) == 1
                and h % 32 == 0
                # VMEM gate: the row tile scales with W x (nc+4); 1024p
                # shapes OOM scoped vmem in compile, and f32 dies at the
                # byte limit (encode.full_rows_fit)
                and pallas_encode.full_rows_fit(w, self.opt.label_nc, dt)
            ):
                g_full = pallas_encode.encode_full(
                    batch["label"], batch["inst"], batch["image"],
                    batch["boxes"], self.opt.label_nc, dt,
                )
                cond = g_full[..., : g_full.shape[-1] - rgb.shape[-1]]
                return (g_full, None), cond, batch.get("image")
            g_full = onehot_edges.encode_input_rgb(
                batch["label"], inst, rgb, self.opt.label_nc, dtype=dt
            )
            cond = g_full[..., : g_full.shape[-1] - rgb.shape[-1]]
            return (g_full, None), cond, batch.get("image")
        cond = onehot_edges.encode_input(
            batch["label"], inst, self.opt.label_nc, dtype=dt
        )
        return (cond, None), cond, batch.get("image")

    # ---- init ----

    def init_params(self, rng, batch):
        kg, kd, kv, ke = jax.random.split(rng, 4)
        params = {}
        if self.netE is not None:
            seg = batch["inst"] if getattr(self.opt, "instance_feat", False) else batch["label"]
            img = batch["image"]
            if img.dtype == jnp.uint8:
                # mirror encode_input's on-device normalize: init must see
                # the same float range the apply path does (raw uint8 would
                # crash lax conv under --uint8_transfer)
                img = img.astype(jnp.float32) / 127.5 - 1.0
            params["E"] = self.netE.init(ke, img, seg)
        g_input, cond, real = self.encode_input(
            batch, params=params if self.netE is not None else None
        )
        params["G"] = self.netG.init(kg, *g_input)
        if self.netD is not None:
            params["D"] = self.netD.init(kd, cond, real)
        if self.vgg is not None:
            params["VGG"] = self.vgg.init(kv, real)
        return params

    # ---- losses (the single fused G+D objective) ----

    def wants_rng(self) -> bool:
        """True when the train step must supply a per-step PRNG key
        (--use_dropout: stochastic G forward at train time)."""
        return bool(getattr(self.netG, "dropout", False))

    def losses(self, params, batch, vgg_params=None, rng=None, g_only=False):
        """Full fused G+D objective. ``g_only=True`` (the pool_size>0 split
        g-step) skips the D-side loss entirely — d_losses() computes it
        against the pool-replayed fake, so building D(real)/D(fake) here
        would be wasted work. When FM is on, D(real) is still needed (as a
        detached target), same as the reference."""
        opt = self.opt
        g_input, cond, real = self.encode_input(batch, params=params)
        if self.wants_rng():
            if rng is None:
                raise ValueError(
                    "--use_dropout needs a per-step rng; the train step "
                    "must pass losses(..., rng=key)"
                )
            fake = self.netG.apply(
                params["G"], *g_input, train=True, rngs={"dropout": rng}
            )
        else:
            fake = self.netG.apply(params["G"], *g_input)

        use_lsgan = not opt.no_lsgan
        d_sg = _sg_tree(params["D"])

        # G side: D through frozen-D params
        d_fake_for_g = self.netD.apply(d_sg, cond, fake)
        loss_g_gan = gan_loss(d_fake_for_g, True, use_lsgan)

        # D(real) and D(fake.detach()) need no input gradients, so they run
        # as ONE batched apply over [real; fake.detach()] with live D params
        # — double the matmul batch for every D layer (better MXU fill,
        # half the fusion count) at zero extra FLOPs: the cond partial conv
        # computes once and tiles (see networks.Conv), and InstanceNorm is
        # per-sample so batching is exact. d_real is shared with the
        # feature-matching loss (which stop_gradients it) — matching the
        # reference's D(real)-for-D + detached-FM reuse.
        d_real = d_fake = None
        if not g_only:
            fake_sg = lax.stop_gradient(fake)
            rf = jnp.concatenate([real, fake_sg], axis=0)
            d_rf = self.netD.apply(params["D"], cond, rf)
            nb = real.shape[0]
            d_real = [[f[:nb] for f in scale] for scale in d_rf]
            d_fake = [[f[nb:] for f in scale] for scale in d_rf]
        elif not opt.no_ganFeat_loss:
            d_real = self.netD.apply(d_sg, cond, real)

        loss_g_feat = 0.0
        if not opt.no_ganFeat_loss:
            loss_g_feat = feature_matching_loss(
                d_fake_for_g,
                d_real,
                n_layers_D=opt.n_layers_D,
                num_D=opt.num_D,
                lambda_feat=opt.lambda_feat,
            )

        loss_g_vgg = 0.0
        if self.vgg is not None and vgg_params is not None:
            loss_g_vgg = opt.lambda_feat * vgg_loss(
                self.vgg.apply, vgg_params, fake, real
            )

        metrics = {
            "G_GAN": loss_g_gan,
            "G_GAN_Feat": loss_g_feat,
            "G_VGG": loss_g_vgg,
        }
        if g_only:
            total = loss_g_gan + loss_g_feat + loss_g_vgg
            return total, (metrics, fake)

        # D side: losses from the batched apply above
        loss_d, loss_d_real, loss_d_fake = discriminator_loss(d_real, d_fake, use_lsgan)

        total = loss_g_gan + loss_g_feat + loss_g_vgg + loss_d
        metrics["D_real"] = loss_d_real
        metrics["D_fake"] = loss_d_fake
        return total, (metrics, fake)

    def d_losses(self, params, batch, fake):
        """D-only objective against a (possibly pool-replayed) fake —
        the second half of the pool_size>0 split step (SURVEY C20).

        encode_input sees params only as a DTYPE witness for the uint8
        normalize (encoder features enter only g_input, never ``cond``,
        so D's conditioning is identical to the G step's — guarded by the
        assertion below, VERDICT r1 weak#8)."""
        opt = self.opt
        _, cond, real = self.encode_input(batch, params=params)
        cond0 = cond[0] if isinstance(cond, (tuple, list)) else cond
        assert cond0.shape[-1] == self.opt.label_nc + (
            0 if self.opt.no_instance else 1
        ), "D conditioning must not include encoder features"
        use_lsgan = not opt.no_lsgan
        # batched pair apply, same as losses(): neither branch needs input
        # gradients, IN is per-sample, cond partial conv tiles
        rf = jnp.concatenate([real, fake], axis=0)
        d_rf = self.netD.apply(params["D"], cond, rf)
        nb = real.shape[0]
        d_real = [[f[:nb] for f in scale] for scale in d_rf]
        d_fake = [[f[nb:] for f in scale] for scale in d_rf]
        loss_d, loss_d_real, loss_d_fake = discriminator_loss(d_real, d_fake, use_lsgan)
        return loss_d, {"D_real": loss_d_real, "D_fake": loss_d_fake}

    # ---- inference (SURVEY §4.3) ----

    def inference(self, params, batch):
        g_input, _, _ = self.encode_input(
            batch, params=params if self.netE is not None else None
        )
        return self.netG.apply(params["G"], *g_input)
