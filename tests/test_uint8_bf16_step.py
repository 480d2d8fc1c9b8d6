"""--uint8_transfer + fp32 boxes + bf16 compute must coexist.

Regression for the 2026-08-19 bench_loop crash: under --uint8_transfer the
only FLOAT leaf in the batch can be 'boxes' — deliberately kept fp32 by
train/steps._COORD_KEYS — and encode_input's normalize-dtype inference
used it as the witness, normalizing the image to fp32 against bf16 params
(lax conv dtype error). The witness now skips coordinate keys and falls
back to the params' dtype."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from neurips18_hierchical_image_manipulation_tpu.configs.options import (
    MaskToImageTrainOptions,
)
from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
    synthetic_batch,
)
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState


def _u8_batch(rng, bs, hw, label_nc):
    b = synthetic_batch(rng, bs, hw=hw, label_nc=label_nc)
    img = np.clip((b["image"] + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    return {
        "label": jnp.asarray(b["label"]),
        "inst": jnp.asarray(b["inst"]),
        "image": jnp.asarray(img),
        "boxes": jnp.asarray(b["boxes"]),  # fp32 by design (_COORD_KEYS)
    }


def test_uint8_image_fp32_boxes_bf16_step():
    opt = MaskToImageTrainOptions(
        name="u8s", checkpoints_dir="/tmp/u8s", label_nc=8, ngf=8, ndf=8,
        n_downsample_global=2, n_blocks_global=1, num_D=1, n_layers_D=2,
        batchSize=2, use_masked_image=True, no_vgg_loss=True,
        dtype="bfloat16",
    )
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = _u8_batch(rng, 2, (32, 64), 8)
    assert batch["image"].dtype == jnp.uint8
    assert batch["boxes"].dtype == jnp.float32

    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(
        model, compute_dtype=jnp.bfloat16, donate=False
    )
    state, metrics, fake = step(state, batch)
    assert np.isfinite(float(metrics["D_real"]))
    # the normalize followed the compute dtype, not the boxes dtype
    assert fake.dtype == jnp.bfloat16


def test_uint8_pooled_d_step_bf16():
    """d_losses gets a {G, D}-only tree — must still normalize uint8 in
    the compute dtype and must NOT try to read encoder features."""
    opt = MaskToImageTrainOptions(
        name="u8p", checkpoints_dir="/tmp/u8p", label_nc=8, ngf=8, ndf=8,
        n_downsample_global=2, n_blocks_global=1, num_D=1, n_layers_D=2,
        batchSize=2, use_masked_image=True, no_vgg_loss=True,
        dtype="bfloat16", pool_size=8,
    )
    model = create_model(opt)
    rng = np.random.RandomState(1)
    batch = _u8_batch(rng, 2, (32, 64), 8)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    g_step, d_step = train_steps.make_pooled_train_steps(
        model, compute_dtype=jnp.bfloat16
    )
    state, m_g, fake = g_step(state, batch)
    state, m_d = d_step(state, batch, fake)
    assert np.isfinite(float(m_d["D_real"]))
