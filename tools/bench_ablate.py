"""Ablation timing of the full GAN train step on the real TPU.

Times jitted variants of the bench config (512x256 bs32 bf16) in ONE
process (concurrent compiles crash the axon remote-compile helper):

  full        the headline step (G + 2-scale D + LSGAN + FM + VGG, both opts)
  g_only      G fwd + bwd + adam (loss = mean(fake))
  no_vgg      full minus the VGG perceptual term
  no_fm       full minus feature matching
  g_vgg       G + VGG only (no D anywhere)
  d_only      D fwd(real,fake)+bwd at fixed fake (isolates D cost)

Prints one JSON line per variant: {"variant", "ms_per_step", "img_per_s"}.
"""

import json
import os
import time

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.join(_os_.path.dirname(_os_.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import optax

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import synthetic_batch
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
    from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState

    nnops.set_default_precision("default")
    bs = int(os.environ.get("HIMAN_BENCH_BS", "32"))
    iters = int(os.environ.get("HIMAN_BENCH_ITERS", "20"))
    only = os.environ.get("HIMAN_ABLATE_ONLY", "")

    def make(opt_kw):
        opt = MaskToImageTrainOptions(
            name="bench", checkpoints_dir="/tmp/himan_bench", label_nc=35,
            ngf=64, ndf=64, n_downsample_global=4, n_blocks_global=9,
            num_D=2, n_layers_D=3, batchSize=bs, use_masked_image=True,
            dtype="bfloat16", **opt_kw,
        )
        model = create_model(opt)
        rng = np.random.RandomState(0)
        batch = synthetic_batch(rng, batch_size=bs, hw=(256, 512), label_nc=35)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
        vgg_params = params.pop("VGG", None)
        tx = optax.adam(2e-4, b1=0.5)
        state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
        return model, state, batch, vgg_params

    def bench(name, fn, state, batch):
        state, metrics = fn(state, batch)
        _ = float(jax.tree.leaves(metrics)[0])  # sync (axon: scalar fetch)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = fn(state, batch)
        _ = float(jax.tree.leaves(metrics)[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(dt * 1e3, 2),
            "img_per_s": round(bs / dt, 2),
        }), flush=True)

    import functools

    # ---- full / no_vgg / no_fm ----
    for name, kw in (
        ("full", {}),
        ("no_vgg", {"no_vgg_loss": True}),
        ("no_fm", {"no_ganFeat_loss": True}),
    ):
        if only and name not in only.split(","):
            continue
        model, state, batch, vgg_params = make(kw)
        step = train_steps.make_train_step(
            model, vgg_params=vgg_params, compute_dtype=jnp.bfloat16
        )
        bench(name, lambda s, b: step(s, b)[:2], state, batch)

    # ---- g_only: G fwd+bwd+adam ----
    if not only or "g_only" in only.split(","):
        model, state, batch, vgg_params = make({"no_vgg_loss": True})

        def g_loss(pg, b):
            p = {"G": jax.tree.map(lambda x: x.astype(jnp.bfloat16), pg)}
            bb = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                  for k, v in b.items()}
            g_input, _, _ = model.encode_input(bb)
            fake = model.netG.apply(p["G"], *g_input)
            return jnp.mean(jnp.abs(fake)).astype(jnp.float32)

        tx = optax.adam(2e-4, b1=0.5)
        og = tx.init(state.params["G"])

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(pg, og, b):
            loss, grads = jax.value_and_grad(g_loss)(pg, b)
            upd, og2 = tx.update(grads, og, pg)
            return optax.apply_updates(pg, upd), og2, {"loss": loss}

        class _S:  # tiny shim so bench() signature fits
            pass

        pg = state.params["G"]

        def fn(s, b):
            nonlocal pg, og
            pg, og, m = g_step(pg, og, b)
            return s, m

        bench("g_only", fn, None, batch)

    # ---- g_vgg: G + VGG only ----
    if not only or "g_vgg" in only.split(","):
        model, state, batch, vgg_params = make({})
        from neurips18_hierchical_image_manipulation_tpu.losses.perceptual import (
            vgg_loss,
        )

        def gv_loss(pg, b):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pg)
            vp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vgg_params)
            bb = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                  for k, v in b.items()}
            g_input, _, real = model.encode_input(bb)
            fake = model.netG.apply(p, g_input)
            return (10.0 * vgg_loss(model.vgg.apply, vp, fake, real)).astype(jnp.float32)

        tx = optax.adam(2e-4, b1=0.5)
        og = tx.init(state.params["G"])

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def gv_step(pg, og, b):
            loss, grads = jax.value_and_grad(gv_loss)(pg, b)
            upd, og2 = tx.update(grads, og, pg)
            return optax.apply_updates(pg, upd), og2, {"loss": loss}

        pg = state.params["G"]

        def fn(s, b):
            nonlocal pg, og
            pg, og, m = gv_step(pg, og, b)
            return s, m

        bench("g_vgg", fn, None, batch)

    # ---- d_only: D(real)+D(fake const) fwd+bwd+adam ----
    if not only or "d_only" in only.split(","):
        model, state, batch, vgg_params = make({"no_vgg_loss": True})
        from neurips18_hierchical_image_manipulation_tpu.losses.gan import (
            discriminator_loss,
        )

        fake_const = jnp.zeros_like(batch["image"], jnp.bfloat16)

        def d_loss(pd, b):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pd)
            bb = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                  for k, v in b.items()}
            _, cond, real = model.encode_input(bb)
            d_real = model.netD.apply(p, jnp.concatenate([cond, real], axis=-1))
            d_fake = model.netD.apply(p, jnp.concatenate([cond, fake_const], axis=-1))
            loss, _, _ = discriminator_loss(d_real, d_fake, True)
            return loss.astype(jnp.float32)

        tx = optax.adam(2e-4, b1=0.5)
        od = tx.init(state.params["D"])

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(pd, od, b):
            loss, grads = jax.value_and_grad(d_loss)(pd, b)
            upd, od2 = tx.update(grads, od, pd)
            return optax.apply_updates(pd, upd), od2, {"loss": loss}

        pd = state.params["D"]

        def fn(s, b):
            nonlocal pd, od
            pd, od, m = d_step(pd, od, b)
            return s, m

        bench("d_only", fn, None, batch)


if __name__ == "__main__":
    main()
