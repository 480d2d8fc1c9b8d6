"""Integration tests (SURVEY §5.3/5.4): 1-step training on synthetic data —
losses finite and decreasing, grads finite; DP step on the 8-device CPU
mesh matches the single-device step on the concatenated batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from neurips18_hierchical_image_manipulation_tpu.configs.options import (
    BoxToMaskTrainOptions,
    MaskToImageTrainOptions,
)
from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
    synthetic_batch,
    synthetic_box2mask_batch,
)
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState
from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps


def tiny_m2i_opt(**kw):
    base = dict(
        name="t",
        checkpoints_dir="/tmp/himan_test_ckpt",
        label_nc=8,
        ngf=8,
        ndf=8,
        n_downsample_global=2,
        n_blocks_global=2,
        num_D=2,
        n_layers_D=2,
        no_vgg_loss=True,
        batchSize=2,
    )
    base.update(kw)
    return MaskToImageTrainOptions(**base)


def make_m2i(rng, opt=None, hw=(32, 64), bs=2, tx=None):
    opt = opt or tiny_m2i_opt()
    model = create_model(opt)
    batch = synthetic_batch(rng, bs, hw=hw, label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = tx or optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    return model, state, batch


def test_mask2image_train_step_runs_and_improves(rng):
    model, state, batch = make_m2i(rng)
    step = train_steps.make_train_step(model, donate=False)
    state1, metrics, fake = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert fake.shape == batch["image"].shape
    # losses change and stay finite over a few steps; G loss decreases
    g0 = float(metrics["G_GAN"] + metrics["G_GAN_Feat"])
    s = state1
    for _ in range(5):
        s, metrics, _ = step(s, batch)
    g5 = float(metrics["G_GAN"] + metrics["G_GAN_Feat"])
    assert np.isfinite(g5)
    assert g5 < g0 * 1.5  # moving, not exploding
    # params actually updated. Probe a KERNEL leaf: biases of conv+IN
    # layers are dead (IN cancels them exactly — networks.Conv.dead_bias)
    # and stay at init by design.
    k0 = state.params["G"]["params"]["conv_in"]["kernel"]
    k1 = s.params["G"]["params"]["conv_in"]["kernel"]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))


def test_mask2image_train_step_norm_batch(rng):
    """--norm batch end-to-end: init + one train step with BatchNorm G/D
    (affine params live under the named NormAct submodules, conv biases
    are real, packed-stem fast path auto-disabled)."""
    model, state, batch = make_m2i(rng, opt=tiny_m2i_opt(norm="batch"))
    # the norm params exist and carry the reference init (gamma ~ 1)
    g_norm = state.params["G"]["params"]["norm_in"]
    assert g_norm["scale"].shape == (8,)
    assert abs(float(np.mean(np.asarray(g_norm["scale"]))) - 1.0) < 0.05
    step = train_steps.make_train_step(model, donate=False)
    s, metrics, fake = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert fake.shape == batch["image"].shape
    # the batch-norm affine params receive gradient and move
    s2, _, _ = step(s, batch)
    g0 = state.params["G"]["params"]["norm_in"]["scale"]
    g2 = s2.params["G"]["params"]["norm_in"]["scale"]
    assert not np.allclose(np.asarray(g0), np.asarray(g2))
    d0 = state.params["D"]["params"]["scale0"]["norm1"]["scale"]
    d2 = s2.params["D"]["params"]["scale0"]["norm1"]["scale"]
    assert not np.allclose(np.asarray(d0), np.asarray(d2))


def test_box2mask_train_step(rng):
    opt = BoxToMaskTrainOptions(
        name="t",
        checkpoints_dir="/tmp/himan_test_ckpt",
        label_nc=8,
        ngf=8,
        ndf=8,
        n_downsample_global=2,
        n_blocks_global=1,
        n_layers_D=2,
        fineSize=32,
    )
    model = create_model(opt)
    batch = synthetic_box2mask_batch(rng, 2, size=32, label_nc=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(model, donate=False)
    s = state
    first = None
    for i in range(6):
        s, metrics, merged = step(s, batch)
        if first is None:
            first = float(metrics["G_recon"])
    assert np.isfinite(float(metrics["G_recon"]))
    assert float(metrics["G_recon"]) < first  # CE reconstruction improves
    assert merged.shape == (2, 32, 32, 8)


def test_dp_step_matches_single_device(rng):
    """SURVEY §5.4: allreduced-grad DP step == single-device step on the
    concatenated batch (same params, same update)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))

    opt = tiny_m2i_opt(num_D=1, n_layers_D=2, no_ganFeat_loss=True)
    # SGD: post-update params are a linear function of the gradients, so
    # the DP-vs-single comparison tests the allreduced grads directly
    # (Adam's g/|g| normalization at step 1 amplifies float noise into
    # sign flips and is unusable as a grad-equality probe).
    model, state, batch = make_m2i(rng, opt=opt, hw=(32, 32), bs=4, tx=optax.sgd(0.1))

    single = train_steps.make_train_step(model, donate=False)
    s1, m1, _ = single(state, batch)

    dp = train_steps.make_dp_train_step(model, mesh)
    state_r = train_steps.replicate(state, mesh)
    batch_s = train_steps.shard_batch(batch, mesh)
    s2, m2, _ = dp(state_r, batch_s)

    # per-loss metrics: DP averages per-device means — equal to the global
    # mean only when per-device losses are means over equal shards; GAN
    # losses are means, so they match.
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3, atol=2e-4)
    # updated G params identical (grad-mean == concat-batch grad)
    for a, b in zip(jax.tree.leaves(s1.params["G"]), jax.tree.leaves(s2.params["G"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_use_dropout_path(rng):
    """--use_dropout (VERDICT r1 weak#7): stochastic G at train (per-step
    rng threaded through the step), deterministic at inference, loud error
    when the rng is missing."""
    opt = tiny_m2i_opt(use_dropout=True)
    model, state, batch = make_m2i(rng, opt=opt)
    assert model.wants_rng()

    # same params, different rngs -> different fakes (dropout active)
    _, (_, fake_a) = model.losses(state.params, batch, rng=jax.random.PRNGKey(0))
    _, (_, fake_b) = model.losses(state.params, batch, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(fake_a), np.asarray(fake_b))
    # same rng -> identical (pure function of the key)
    _, (_, fake_a2) = model.losses(state.params, batch, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(fake_a), np.asarray(fake_a2))

    # missing rng fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="use_dropout"):
        model.losses(state.params, batch)

    # the jitted step advances state.rng and trains
    step = train_steps.make_train_step(model, donate=False)
    s1, metrics, _ = step(state, batch)
    assert not np.array_equal(np.asarray(s1.rng), np.asarray(state.rng))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # inference ignores dropout (deterministic, no rng required)
    out1 = model.inference(s1.params, batch)
    out2 = model.inference(s1.params, batch)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # box2mask's twostream G rejects the flag loudly
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        BoxToMaskTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.models import networks

    with _pytest.raises(ValueError, match="twostream"):
        networks.define_G(
            BoxToMaskTrainOptions(
                name="t", checkpoints_dir="/tmp/himan_test_ckpt", use_dropout=True
            )
        )


def test_mask2image_uint8_transfer_batch(rng):
    """--uint8_transfer contract: uint8 image / uint8 label / uint16 inst
    batches train identically to pre-normalized float batches (the
    (x/127.5)-1 normalize moves on-device into the step)."""
    model, state, batch = make_m2i(rng)
    step = train_steps.make_train_step(model, donate=False)
    _, m_f32, fake_f32 = step(state, batch)

    b8 = dict(batch)
    img01 = (np.asarray(batch["image"], np.float32) + 1.0) * 127.5
    b8["image"] = jnp.asarray(np.round(img01).clip(0, 255).astype(np.uint8))
    b8["label"] = jnp.asarray(np.asarray(batch["label"]).astype(np.uint8))
    b8["inst"] = jnp.asarray(np.asarray(batch["inst"]).astype(np.uint16))
    _, m_u8, fake_u8 = step(state, b8)
    for k in m_f32:
        a, b = float(m_f32[k]), float(m_u8[k])
        assert np.isfinite(b), k
        # uint8 quantization of the image perturbs losses slightly
        assert abs(a - b) < 0.15 * (abs(a) + 1.0), (k, a, b)
    assert fake_u8.shape == fake_f32.shape


def test_dp_step_matches_single_device_full_loss(rng):
    """DP grad equality with EVERY production loss branch live (LSGAN + FM
    + VGG): the sharded step must not mis-replicate the VGG taps
    (VERDICT r2 next#4 / BASELINE.json config #5)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))

    opt = tiny_m2i_opt(no_ganFeat_loss=False, no_vgg_loss=False, batchSize=4)
    model = create_model(opt)
    batch = synthetic_batch(rng, 4, hw=(32, 32), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    vgg_params = params.pop("VGG")
    state = GANTrainState.create(
        params, optax.sgd(0.1), optax.sgd(0.1), jax.random.PRNGKey(1)
    )

    single = train_steps.make_train_step(model, vgg_params=vgg_params, donate=False)
    s1, m1, _ = single(state, batch)
    assert float(m1["G_VGG"]) != 0.0

    dp = train_steps.make_dp_train_step(model, mesh, vgg_params=vgg_params)
    state_r = train_steps.replicate(state, mesh)
    batch_s = train_steps.shard_batch(batch, mesh)
    s2, m2, _ = dp(state_r, batch_s)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3, atol=2e-4)
    for net in ("G", "D"):
        for a, b in zip(
            jax.tree.leaves(s1.params[net]), jax.tree.leaves(s2.params[net])
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
            )


def test_cast_batch_preserves_box_coordinates():
    """bf16's ulp is 2 in [256,512): casting the f32 boxes tensor would
    shift box edges by pixels and desync the masked-RGB conditioning
    from the GT box — coordinates are excluded from the compute cast."""
    from neurips18_hierchical_image_manipulation_tpu.train.steps import _cast_batch

    batch = {
        "image": jnp.ones((1, 4, 4, 3), jnp.float32),
        "boxes": jnp.asarray([[301.0, 417.0, 33.0, 57.0]], jnp.float32),
    }
    out = _cast_batch(batch, jnp.bfloat16)
    assert out["image"].dtype == jnp.bfloat16
    assert out["boxes"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out["boxes"]), np.asarray(batch["boxes"]))


def test_hybrid_dcn_mesh_dp_matches_single_device(rng):
    """Multi-slice DP (SURVEY §6.8): the 2-D ('dcn', 'data') hybrid mesh
    from make_hybrid_data_mesh with the batch sharded over BOTH axes and
    pmean over both must equal the single-device step on the concat
    batch (hierarchical DCN+ICI allreduce correctness)."""
    from neurips18_hierchical_image_manipulation_tpu.parallel.mesh import (
        make_hybrid_data_mesh,
    )

    mesh = make_hybrid_data_mesh(n_slices=2, n_devices=8)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)

    opt = tiny_m2i_opt(num_D=1, n_layers_D=2, no_ganFeat_loss=True)
    model, state, batch = make_m2i(rng, opt=opt, hw=(32, 32), bs=8, tx=optax.sgd(0.1))

    single = train_steps.make_train_step(model, donate=False)
    s1, m1, _ = single(state, batch)

    dp = train_steps.make_dp_train_step(model, mesh, axis=("dcn", "data"))
    state_r = train_steps.replicate(state, mesh)
    batch_s = train_steps.shard_batch(batch, mesh, axis=("dcn", "data"))
    s2, m2, _ = dp(state_r, batch_s)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params["G"]), jax.tree.leaves(s2.params["G"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_box2mask_ctx_neg_penalty(rng):
    """--lambda_ctx_neg: the context stream is penalized for putting
    softmax mass on the sample's OWN class at object pixels; cls == -1
    (background samples) contributes exactly zero; training with the
    penalty drives that mass down."""
    kw = dict(
        name="t", checkpoints_dir="/tmp/himan_test_ckpt", label_nc=8,
        ngf=8, ndf=8, n_downsample_global=2, n_blocks_global=1,
        n_layers_D=2, fineSize=32,
    )
    batch = synthetic_box2mask_batch(rng, 2, size=32, label_nc=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    m_off = create_model(BoxToMaskTrainOptions(**kw))
    m_on = create_model(BoxToMaskTrainOptions(lambda_ctx_neg=5.0, **kw))
    params = m_off.init_params(jax.random.PRNGKey(0), batch)

    t_off, (met_off, _) = m_off.losses(params, batch)
    t_on, (met_on, _) = m_on.losses(params, batch)
    assert "G_ctxneg" not in met_off
    neg = float(met_on["G_ctxneg"])
    assert neg > 0
    np.testing.assert_allclose(float(t_on) - float(t_off), neg, rtol=1e-4)

    # null-class batch -> zero penalty (one-hot of -1 is all-zeros)
    nb = dict(batch)
    nb["cls"] = jnp.full_like(batch["cls"], -1)
    nb["gt_objmask"] = jnp.zeros_like(batch["gt_objmask"])
    _, (met_null, _) = m_on.losses(params, nb)
    assert float(met_null["G_ctxneg"]) == 0.0

    # a few steps with the penalty reduce own-class ctx mass at object px
    tx = optax.adam(2e-3, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(m_on, donate=False)
    first = None
    for _ in range(8):
        state, metrics, _ = step(state, batch)
        if first is None:
            first = float(metrics["G_ctxneg"])
    assert float(metrics["G_ctxneg"]) < first
