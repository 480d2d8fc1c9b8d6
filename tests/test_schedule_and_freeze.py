"""LR schedule semantics + niter_fix_global trunk freezing + CLI bool
negation flags."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.configs.options import (
    MaskToImageTrainOptions,
    parse_cli,
)
from neurips18_hierchical_image_manipulation_tpu.train.schedule import (
    linear_decay_schedule,
)
from neurips18_hierchical_image_manipulation_tpu.train.state import make_optimizers


def test_linear_decay_schedule_reference_semantics():
    # niter=2, niter_decay=2, 10 steps/epoch: epochs 1..3 (0-indexed 0..2)
    # at lr0, then -lr0/2 per epoch
    s = linear_decay_schedule(2e-4, niter=2, niter_decay=2, steps_per_epoch=10)
    np.testing.assert_allclose(float(s(0)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(19)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(29)), 2e-4, rtol=1e-6)  # epoch 3 at lr0
    np.testing.assert_allclose(float(s(30)), 1e-4, rtol=1e-6)  # epoch 4
    np.testing.assert_allclose(float(s(40)), 0.0, atol=1e-12)


def test_niter_fix_global_freezes_trunk():
    opt = MaskToImageTrainOptions(
        name="t", checkpoints_dir="/tmp/himan_sched", netG="local",
        niter_fix_global=1, lr=0.1, niter=2, niter_decay=0,
    )
    tx_g, _ = make_optimizers(opt, steps_per_epoch=2)
    params = {
        "params": {
            "global": {"w": jnp.ones(3)},
            "local1_conv_in": {"w": jnp.ones(3)},
        }
    }
    state = tx_g.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # steps 0,1 (epoch 1): global frozen, local moves
    upd, state = tx_g.update(grads, state, params)
    assert np.all(np.asarray(upd["params"]["global"]["w"]) == 0)
    assert np.any(np.asarray(upd["params"]["local1_conv_in"]["w"]) != 0)
    upd, state = tx_g.update(grads, state, params)
    assert np.all(np.asarray(upd["params"]["global"]["w"]) == 0)
    # step 2 (epoch 2): global unfrozen
    upd, state = tx_g.update(grads, state, params)
    assert np.any(np.asarray(upd["params"]["global"]["w"]) != 0)


def test_cli_bool_negation(tmp_path):
    opt = parse_cli(
        MaskToImageTrainOptions,
        ["--name", "x", "--checkpoints_dir", str(tmp_path),
         "--no-use_masked_image", "--no-use_bbox_dataset", "--no_flip"],
    )
    assert opt.use_masked_image is False
    assert opt.use_bbox_dataset is False
    assert opt.no_flip is True


def test_remat_generator_matches(rng):
    """remat=True must not change outputs or grads (only memory)."""
    import jax
    import jax.numpy as jnp
    from neurips18_hierchical_image_manipulation_tpu.models import networks

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4).astype(np.float32))
    g0 = networks.GlobalGenerator(output_nc=2, ngf=4, n_downsampling=1, n_blocks=2)
    g1 = networks.GlobalGenerator(output_nc=2, ngf=4, n_downsampling=1, n_blocks=2, remat=True)
    params = g0.init(jax.random.PRNGKey(0), x)
    y0 = g0.apply(params, x)
    y1 = g1.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    d0 = jax.grad(lambda p: jnp.sum(g0.apply(p, x) ** 2))(params)
    d1 = jax.grad(lambda p: jnp.sum(g1.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(d1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_maybe_initialize_noop():
    from neurips18_hierchical_image_manipulation_tpu.parallel.distributed import (
        maybe_initialize,
    )

    assert maybe_initialize() is False  # no coordinator env -> no-op
