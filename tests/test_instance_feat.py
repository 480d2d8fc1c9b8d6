"""instance_feat path: Encoder conditioning trains jointly with G."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.data.synthetic import synthetic_batch
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState
from test_train_step import tiny_m2i_opt


def test_instance_feat_trains(rng):
    opt = tiny_m2i_opt(instance_feat=True, feat_num=3, nef=4, n_downsample_E=2)
    model = create_model(opt)
    batch = synthetic_batch(rng, 2, hw=(32, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    assert "E" in params
    tx = optax.sgd(0.05)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(model, donate=False)
    s1, metrics, fake = step(state, batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    # encoder params updated (trains with optimizer_G); compare total
    # movement — IN makes conv-bias grads ~0, so single leaves can be flat
    delta = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree.leaves(state.params["E"]), jax.tree.leaves(s1.params["E"])
        )
    )
    assert delta > 1e-4


def test_feat_override_at_inference(rng):
    opt = tiny_m2i_opt(instance_feat=True, feat_num=3, nef=4, n_downsample_E=2)
    model = create_model(opt)
    batch = synthetic_batch(rng, 1, hw=(32, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    out1 = model.inference(params, batch)
    # cluster-style feature override via batch['feat']
    batch2 = dict(batch)
    batch2["feat"] = jnp.ones((1, 32, 64, 3)) * 0.3
    out2 = model.inference(params, batch2)
    assert out1.shape == out2.shape
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
