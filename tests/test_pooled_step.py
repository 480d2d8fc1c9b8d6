"""pool_size>0 split-step path: passthrough pool must match the fused
step's loss values at the same params (SURVEY C20 semantics)."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.data.synthetic import synthetic_batch
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState
from test_train_step import tiny_m2i_opt


def test_pooled_matches_fused_first_step(rng):
    opt = tiny_m2i_opt()
    model = create_model(opt)
    batch = synthetic_batch(rng, 2, hw=(32, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = optax.sgd(0.1)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))

    fused = train_steps.make_train_step(model, donate=False)
    s_fused, m_fused, fake_fused = fused(state, batch)

    g_step, d_step = train_steps.make_pooled_train_steps(model)
    s1, m_g, fake = g_step(state, batch)
    # passthrough pool: feed the fresh fake
    s2, m_d = d_step(s1, batch, fake)

    np.testing.assert_allclose(float(m_g["G_GAN"]), float(m_fused["G_GAN"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_d["D_real"]), float(m_fused["D_real"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_d["D_fake"]), float(m_fused["D_fake"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(fake_fused), atol=1e-6)
    # G update equal (same grads, same sgd)
    for a, b in zip(
        jax.tree.leaves(s_fused.params["G"]), jax.tree.leaves(s2.params["G"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pooled_path_with_adam_and_encoder(rng):
    """Regression (ADVICE r1): the pooled g_step must grad/update over the
    same g-side tree that opt_state_g was initialized with — Adam raised a
    pytree mismatch and instance_feat KeyError'd before the fix."""
    opt = tiny_m2i_opt(instance_feat=True, feat_num=3, nef=4, n_downsample_E=2)
    model = create_model(opt)
    batch = synthetic_batch(rng, 2, hw=(32, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    assert "E" in params
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))

    g_step, d_step = train_steps.make_pooled_train_steps(model)
    s1, m_g, fake = g_step(state, batch)
    s2, m_d = d_step(s1, batch, fake)
    for k, v in {**m_g, **m_d}.items():
        assert np.isfinite(float(v)), k
    # every g-side subtree (G AND E) actually updated; D untouched by g_step
    for key in ("G", "E"):
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params[key]), jax.tree.leaves(s1.params[key])
            )
        )
        assert changed, f"{key} params did not update in pooled g_step"
    for a, b in zip(
        jax.tree.leaves(state.params["D"]), jax.tree.leaves(s1.params["D"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
