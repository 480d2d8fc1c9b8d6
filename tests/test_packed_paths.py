"""Parity tests for the s2d-packed perf lowerings (round 2 perf work).

Every packed path must match its literal lowering to fp noise — same
params, same math, different schedule:

  * conv2d_phasepack        — 7x7 tiny-co head conv via stride-4 phase
                              embedding (nnops.conv2d_phasepack)
  * packed VGG block 1      — conv1_1/conv1_2/pool1 in s2d-by-2 coords
  * packed generator stem   — encode_input_rgb_packed + PackedStemInput
                              (conv_in/IN/relu/down0 packed)
  * dead bias under IN      — InstanceNorm cancels conv bias exactly

All run at Precision.DEFAULT (the perf tier) on CPU, where DEFAULT is
fp32-accurate, so tolerances are tight.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def default_precision():
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    nnops.set_default_precision("default")
    yield
    nnops.set_default_precision("highest")


def test_phasepack_head_conv_matches_plain(default_precision):
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 22, 38, 64), jnp.float32)  # padded, out 16x32
    w = jnp.asarray(rng.randn(7, 7, 64, 3) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(3), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    ref = nnops.conv2d(x, w, b, precision=hp)
    got = nnops.conv2d_phasepack(x, w, b, precision=hp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)

    def loss(impl):
        def f(x, w, b):
            return jnp.sum(jnp.sin(impl(x, w, b)))

        return jax.grad(f, argnums=(0, 1, 2))

    gr = loss(lambda x, w, b: nnops.conv2d(x, w, b, precision=hp))(x, w, b)
    gp = loss(lambda x, w, b: nnops.conv2d_phasepack(x, w, b, precision=hp))(x, w, b)
    for a, c in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)


def test_vgg_block1_packed_matches_literal(default_precision):
    from neurips18_hierchical_image_manipulation_tpu.models.networks import (
        Vgg19Features,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32, 3), jnp.float32)
    vgg = Vgg19Features()
    params = vgg.init(jax.random.PRNGKey(0), x)
    os.environ["HIMAN_VGG_PACK"] = "1"
    taps_p = vgg.apply(params, x)
    os.environ["HIMAN_VGG_PACK"] = "0"
    try:
        taps_l = vgg.apply(params, x)
    finally:
        os.environ["HIMAN_VGG_PACK"] = "1"
    # tap1 is grid-B packed (covers one pixel beyond the image, border
    # zeroed, scaled by numelB/numelA so mean-|a-b| is exact) — unpack,
    # slice the true region, undo the scale
    t1p = taps_p[0]
    n, hb2, wb2, _ = t1p.shape
    scale = (hb2 * wb2) / float((hb2 - 1) * (wb2 - 1))
    t1 = (
        t1p.reshape(n, hb2, wb2, 2, 2, 64)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hb2 * 2, wb2 * 2, 64)
    )
    t1 = t1[:, 1 : 1 + 2 * (hb2 - 1), 1 : 1 + 2 * (wb2 - 1)] / scale
    np.testing.assert_allclose(np.asarray(t1), np.asarray(taps_l[0]), atol=1e-5)
    for tp, tl in zip(taps_p[1:], taps_l[1:]):
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tl), atol=1e-5)
    # border diffs are zero on both sides and the scale corrects the mean:
    # mean|s*a - s*b| over grid-B == mean|a-b| over the true region
    fake_diff_packed = float(jnp.abs(t1p - t1p * 0.5).mean())
    fake_diff_lit = float(jnp.abs(taps_l[0] - taps_l[0] * 0.5).mean())
    np.testing.assert_allclose(fake_diff_packed, fake_diff_lit, rtol=1e-4)


def test_packed_stem_matches_literal(default_precision):
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    opt = MaskToImageTrainOptions(
        name="t", checkpoints_dir="/tmp/t_pack", label_nc=8, ngf=16, ndf=16,
        n_downsample_global=2, n_blocks_global=1, num_D=1, n_layers_D=2,
        batchSize=2, use_masked_image=True, no_vgg_loss=True,
        # create_model resolves precision from the config (round 4) and
        # would reset the fixture's perf tier to HIGHEST for an fp32 opt
        conv_precision="default",
    )
    model = create_model(opt)
    rng = np.random.RandomState(2)
    batch = synthetic_batch(rng, batch_size=2, hw=(32, 64), label_nc=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)

    os.environ["HIMAN_STEM_PACK"] = "1"
    g_input, cond_p, _ = model.encode_input(batch)
    assert isinstance(g_input[0], nnops.PackedStemInput)
    fake_p = model.netG.apply(params["G"], *g_input)
    os.environ["HIMAN_STEM_PACK"] = "0"
    try:
        g_input2, cond_l, _ = model.encode_input(batch)
        fake_l = model.netG.apply(params["G"], *g_input2)
    finally:
        os.environ["HIMAN_STEM_PACK"] = "1"
    np.testing.assert_allclose(np.asarray(fake_p), np.asarray(fake_l), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cond_p), np.asarray(cond_l))


def test_dead_bias_exactly_cancelled_by_instance_norm(default_precision):
    """conv(x)+b then IN(affine=False) is independent of b — the basis for
    Conv.dead_bias (networks.py). Verify the identity itself."""
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    b = jnp.asarray(rng.randn(16) * 10.0, jnp.float32)
    y0 = nnops.instance_norm(x)
    y1 = nnops.instance_norm(x + b)
    # exact in exact arithmetic; |b| = 10x|x| costs a few mantissa bits
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-3)


def test_local_enhancer_packed_stems_match_literal(default_precision):
    """LocalEnhancer packed stems (round 4: the full-res local conv_in and
    the trunk stem run s2d-by-2 packed — networks.LocalEnhancer) match the
    literal lowering, forward AND gradient, with the identical param
    tree."""
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model

    opt = MaskToImageTrainOptions(
        name="t", checkpoints_dir="/tmp/t_lpack", label_nc=8, netG="local",
        ngf=8, ndf=8, n_downsample_global=2, n_blocks_global=1,
        n_blocks_local=1, num_D=1, n_layers_D=2, batchSize=2,
        use_masked_image=True, no_vgg_loss=True,
        conv_precision="default",  # see test_packed_stem_matches_literal
    )
    model = create_model(opt)
    rng = np.random.RandomState(4)
    batch = synthetic_batch(rng, batch_size=2, hw=(32, 64), label_nc=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)
    g_input, _, _ = model.encode_input(batch)

    def loss(pg):
        return jnp.sum(jnp.sin(model.netG.apply(pg, *g_input)))

    os.environ["HIMAN_STEM_PACK"] = "1"
    fake_p = model.netG.apply(params["G"], *g_input)
    grads_p = jax.grad(loss)(params["G"])
    os.environ["HIMAN_STEM_PACK"] = "0"
    try:
        fake_l = model.netG.apply(params["G"], *g_input)
        grads_l = jax.grad(loss)(params["G"])
    finally:
        os.environ["HIMAN_STEM_PACK"] = "1"
    np.testing.assert_allclose(np.asarray(fake_p), np.asarray(fake_l), atol=1e-4)
    flat_p = jax.tree_util.tree_leaves_with_path(grads_p)
    flat_l = dict(jax.tree_util.tree_leaves_with_path(grads_l))
    assert len(flat_p) == len(flat_l)
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_l[path]), atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_convt_packed_out_matches_adjoint(default_precision):
    """conv_transpose2d_packed_out: d2s2(packed) == the literal adjoint
    convT (k3 s2 p1 op1), forward and gradient."""
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 10, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    ref = nnops.conv_transpose2d(x, w, b, precision=hp)
    got = nnops.d2s2(nnops.conv_transpose2d_packed_out(x, w, b, precision=hp))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)

    def loss(impl):
        return jax.grad(
            lambda x, w, b: jnp.sum(jnp.sin(impl(x, w, b))), argnums=(0, 1, 2)
        )

    gr = loss(lambda x, w, b: nnops.conv_transpose2d(x, w, b, precision=hp))(x, w, b)
    gp = loss(
        lambda x, w, b: nnops.d2s2(
            nnops.conv_transpose2d_packed_out(x, w, b, precision=hp)
        )
    )(x, w, b)
    for a, c in zip(gr, gp):
        # bias grad reduces over the full output in a different order:
        # rtol-level fp noise on O(1e2) sums
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=5e-5, rtol=1e-6
        )

    # s2d2/d2s2 are exact inverses (phase-major)
    z = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    np.testing.assert_array_equal(np.asarray(nnops.d2s2(nnops.s2d2(z))), np.asarray(z))
