"""Golden tests for the Pallas kernel tier (interpreter mode on CPU CI;
the same kernels compile natively on TPU — SURVEY §5.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.ops import nnops
from neurips18_hierchical_image_manipulation_tpu.ops.pallas import instance_norm as pin


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pin.INTERPRET
    pin.INTERPRET = True
    yield
    pin.INTERPRET = old


def ref_in(x, relu=False, residual=None):
    y = nnops.instance_norm(x)
    if residual is not None:
        y = y + residual
    if relu:
        y = jnp.maximum(y, 0)
    return y


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("shape", [(2, 8, 16, 128), (1, 8, 8, 64)])
def test_fused_in_forward(rng, relu, shape):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 0.5)
    got = pin.fused_instance_norm(x, relu=relu)
    want = ref_in(x, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_in_residual(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    r = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    got = pin.fused_instance_norm(x, relu=True, residual=r)
    want = ref_in(x, relu=True, residual=r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_fused_in_grad(rng, relu):
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))

    def f_pallas(x):
        return jnp.sum(pin.fused_instance_norm(x, relu=relu) * g)

    def f_ref(x):
        return jnp.sum(ref_in(x, relu=relu) * g)

    dx_pallas = jax.grad(f_pallas)(x)
    dx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(
        np.asarray(dx_pallas), np.asarray(dx_ref), atol=3e-5, rtol=1e-4
    )


def test_fused_in_bf16_io(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32)).astype(jnp.bfloat16)
    got = pin.fused_instance_norm(x, relu=True)
    assert got.dtype == jnp.bfloat16
    want = ref_in(x, relu=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_multi_chunk_accumulation(rng):
    """Force several HW chunks so the cross-grid-step accumulators are
    actually exercised (hw 4096 x c 128 fp32 > 4MB budget -> >1 chunk)."""
    x = jnp.asarray(rng.randn(1, 64, 128, 128).astype(np.float32))
    got = pin.fused_instance_norm(x)
    want = ref_in(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


# ---- fused loss reduction kernels ----

from neurips18_hierchical_image_manipulation_tpu.ops.pallas import losses as ploss


@pytest.fixture(autouse=True)
def interpret_losses():
    old = ploss.INTERPRET
    ploss.INTERPRET = True
    yield
    ploss.INTERPRET = old


@pytest.mark.parametrize("shape", [(8, 32, 64, 1), (3, 7, 5), (1000,)])
def test_mse_to_scalar(rng, shape):
    d = jnp.asarray(rng.randn(*shape).astype(np.float32))
    got = ploss.mse_to_scalar(d)
    np.testing.assert_allclose(float(got), float(jnp.mean(d * d)), rtol=1e-6)


@pytest.mark.parametrize("shape", [(4, 16, 16, 32), (999,)])
def test_l1_to_scalar(rng, shape):
    d = jnp.asarray(rng.randn(*shape).astype(np.float32))
    got = ploss.l1_to_scalar(d)
    np.testing.assert_allclose(float(got), float(jnp.mean(jnp.abs(d))), rtol=1e-6)


def test_loss_kernel_grads(rng):
    d = jnp.asarray(rng.randn(4, 8, 128).astype(np.float32))
    g_mse = jax.grad(lambda x: ploss.mse_to_scalar(x))(d)
    np.testing.assert_allclose(np.asarray(g_mse), 2 * np.asarray(d) / d.size, rtol=1e-6)
    g_l1 = jax.grad(lambda x: ploss.l1_to_scalar(x))(d)
    np.testing.assert_allclose(np.asarray(g_l1), np.sign(np.asarray(d)) / d.size, rtol=1e-6)


# ---- fully-fused conv3x3 + IN (+relu/+residual) kernel ----

from neurips18_hierchical_image_manipulation_tpu.ops.pallas import conv_in as pconv


@pytest.fixture(autouse=True)
def interpret_conv():
    old = pconv.INTERPRET
    pconv.INTERPRET = True
    yield
    pconv.INTERPRET = old


@pytest.mark.parametrize("relu,with_res", [(True, False), (False, True), (False, False)])
def test_fused_conv_in(rng, relu, with_res):
    n, h, w, cin, cout = 2, 8, 16, 128, 128
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5)
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    res = jnp.asarray(rng.randn(n, h, w, cout).astype(np.float32)) if with_res else None
    got = pconv.conv3x3_in_act(x, w3, b, relu=relu, residual=res)
    want = pconv._reference(x, w3, b, res, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)


def test_fused_conv_in_grad(rng):
    n, h, w, c = 1, 8, 8, 128
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 0.5)
    w3 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(c).astype(np.float32))
    g = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))

    def f_pallas(x, w3, b):
        return jnp.sum(pconv.conv3x3_in_act(x, w3, b, relu=True) * g)

    def f_ref(x, w3, b):
        return jnp.sum(pconv._reference(x, w3, b, None, True) * g)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w3, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w3, b)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4)


def test_fused_conv_in_fallback_on_bad_shape(rng):
    # cout not 128-multiple -> lax fallback, still correct
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    w3 = jnp.asarray(rng.randn(3, 3, 8, 24).astype(np.float32) * 0.1)
    b = jnp.zeros(24)
    got = pconv.conv3x3_in_act(x, w3, b, relu=True)
    want = pconv._reference(x, w3, b, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_reflect_pad_fused_bwd_matches_jnp_vjp(rng):
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import (
        reflect_pad as rp,
    )

    rp.INTERPRET = True
    try:
        for (n, h, w, c, p) in [(2, 16, 8, 128, 1), (1, 12, 20, 8, 3), (3, 9, 11, 16, 2)]:
            x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
            g = jnp.asarray(rng.randn(n, h + 2 * p, w + 2 * p, c).astype(np.float32))
            fwd_ref = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
            fwd_got = rp.reflect_pad_fused_bwd(x, p)
            np.testing.assert_array_equal(np.asarray(fwd_ref), np.asarray(fwd_got))
            ref = jax.vjp(
                lambda x: jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"), x
            )[1](g)[0]
            got = jax.vjp(lambda x: rp.reflect_pad_fused_bwd(x, p), x)[1](g)[0]
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-6)
    finally:
        rp.INTERPRET = False


def test_reflect_pad_bwd_eligibility():
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import (
        reflect_pad as rp,
    )

    # resblock pad-1 sites fit; the full-res 7x7 head pad falls back
    assert rp.reflect_pad_bwd_eligible((32, 32, 16, 1024), 1, np.dtype(np.dtype("bfloat16")))
    assert not rp.reflect_pad_bwd_eligible((32, 256, 512, 64), 3, np.dtype(np.dtype("bfloat16")))
    # degenerate: mirrors overlapping (tiny spatial) -> lax
    assert not rp.reflect_pad_bwd_eligible((1, 3, 3, 8), 3, np.dtype(np.float32))


@pytest.mark.parametrize(
    "shape,nc,dt",
    [
        ((1, 20, 24), 7, jnp.float32),   # odd packed rows -> masked tail block
        ((2, 64, 32), 11, jnp.bfloat16), # h % 32 == 0 -> tiled cond path
    ],
)
def test_encode_stem_pack_kernel(rng, shape, nc, dt):
    """Pallas fused encode (one-hot+edge cond, packed stem input incl.
    reflect pad / s2d2 / mask_box) matches the jnp composition exactly."""
    from neurips18_hierchical_image_manipulation_tpu.ops import (
        boxcomposite,
        onehot_edges,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

    b, h, w = shape
    label = jnp.asarray(rng.randint(0, nc, size=shape), jnp.int32)
    inst = jnp.asarray(rng.randint(0, 5, size=shape), jnp.int32)
    image = jnp.asarray(rng.rand(b, h, w, 3) * 2 - 1, jnp.float32)
    boxes = jnp.asarray(
        np.stack(
            [
                rng.randint(0, h // 2, size=b),
                rng.randint(0, w // 2, size=b),
                rng.randint(4, h // 2, size=b),
                rng.randint(4, w // 2, size=b),
            ],
            -1,
        ).astype(np.float32)
    )

    masked = boxcomposite.mask_box(image, boxes, fill=0.0).astype(dt)
    ids_p = jnp.pad(label, ((0, 0), (3, 3), (3, 3)), mode="reflect")
    edge = onehot_edges.instance_edges(inst, jnp.bool_)
    edge_p = jnp.pad(edge, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    rgb_p = jnp.pad(masked, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    g_ref = onehot_edges.encode_input_rgb_packed(ids_p, edge_p, rgb_p, nc, dtype=dt)
    c_ref = onehot_edges.encode_input(label, inst, nc, dtype=dt)

    encode.INTERPRET = True
    try:
        g, c = encode.encode_stem_pack(label, inst, image.astype(dt), boxes, nc, dt)
    finally:
        encode.INTERPRET = False
    assert g.shape == g_ref.shape and g.dtype == g_ref.dtype
    np.testing.assert_array_equal(
        np.asarray(g, np.float32), np.asarray(g_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(c, np.float32), np.asarray(c_ref, np.float32)
    )


def test_encode_kernel_model_path_matches_jnp(rng):
    """Pix2PixHDModel.encode_input's Pallas-encode gate (stem-pack branch)
    produces the same (g_input, cond) as the jnp build — checked through
    the full losses() at fp32."""
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

    opt = MaskToImageTrainOptions(
        name="t",
        checkpoints_dir="/tmp/himan_test_ckpt",
        label_nc=8,
        ngf=8,
        ndf=8,
        n_downsample_global=2,
        n_blocks_global=1,
        num_D=1,
        n_layers_D=2,
        no_vgg_loss=True,
        batchSize=2,
        use_masked_image=True,
    )
    model = create_model(opt)
    batch = synthetic_batch(rng, 2, hw=(32, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    nnops.set_default_precision("default")  # stem-pack needs the perf tier
    try:
        assert nnops.stem_pack_enabled()
        params = model.init_params(jax.random.PRNGKey(0), batch)
        total_ref, (m_ref, fake_ref) = model.losses(params, batch)
        from neurips18_hierchical_image_manipulation_tpu.ops.pallas import (
            config as pcfg,
        )

        # Pin mode 1 (Pallas cond in the model path): with the env-driven
        # default now 2, relying on `_ENCODE_KERNEL or 1` would silently
        # test a different arm and be HIMAN_ENCODE_KERNEL-sensitive.
        prev_mode = pcfg._ENCODE_KERNEL
        pcfg.set_encode_kernel(1)
        encode.INTERPRET = True  # turns encode_enabled() on for the branch
        try:
            total_pl, (m_pl, fake_pl) = model.losses(params, batch)
        finally:
            encode.INTERPRET = False
            pcfg.set_encode_kernel(prev_mode)
        np.testing.assert_allclose(
            np.asarray(fake_pl), np.asarray(fake_ref), atol=1e-5, rtol=1e-5
        )
        for k in m_ref:
            np.testing.assert_allclose(
                float(m_pl[k]), float(m_ref[k]), atol=1e-5, rtol=1e-5
            )
    finally:
        nnops.set_default_precision("highest")


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_encode_full_kernel(rng, dt):
    """Unpacked fused build (one-hot ⊕ edge ⊕ mask_box RGB) matches
    encode_input_rgb ∘ mask_box exactly."""
    from neurips18_hierchical_image_manipulation_tpu.ops import (
        boxcomposite,
        onehot_edges,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

    b, h, w, nc = 2, 64, 48, 9
    label = jnp.asarray(rng.randint(0, nc, size=(b, h, w)), jnp.int32)
    inst = jnp.asarray(rng.randint(0, 5, size=(b, h, w)), jnp.int32)
    image = jnp.asarray(rng.rand(b, h, w, 3) * 2 - 1, jnp.float32).astype(dt)
    boxes = jnp.asarray(np.array([[5, 7, 20, 18], [0, 0, 64, 48]], np.float32))

    masked = boxcomposite.mask_box(image, boxes, fill=0.0)
    want = onehot_edges.encode_input_rgb(label, inst, masked, nc, dtype=dt)

    encode.INTERPRET = True
    try:
        got = encode.encode_full(label, inst, image, boxes, nc, dt)
    finally:
        encode.INTERPRET = False
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_encode_cond_pooled_kernel(rng, dt):
    """Pooled-cond kernel == avg_pool_3x3s2(encode_input) bit-for-bit in
    the compute dtype (window sums of 0/1 are exact in bf16 and the count
    division uses identical operands)."""
    from neurips18_hierchical_image_manipulation_tpu.ops import (
        nnops,
        onehot_edges,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

    b, h, w, nc = 2, 64, 52, 9
    label = jnp.asarray(rng.randint(0, nc, size=(b, h, w)), jnp.int32)
    inst = jnp.asarray(rng.randint(0, 6, size=(b, h, w)), jnp.int32)

    cond = onehot_edges.encode_input(label, inst, nc, dtype=dt)
    want = nnops.avg_pool_3x3s2(cond)

    encode.INTERPRET = True
    try:
        got = encode.encode_cond_pooled(label, inst, nc, dt)
    finally:
        encode.INTERPRET = False
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_encode_kernel_mode3_model_path(rng):
    """Mode 3 (Pallas cond + precomputed pooled-cond pyramid through
    MultiscaleD's tuple form) produces the same losses as the jnp path."""
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import (
        config as pcfg,
        encode,
    )

    opt = MaskToImageTrainOptions(
        name="t",
        checkpoints_dir="/tmp/himan_test_ckpt",
        label_nc=8,
        ngf=8,
        ndf=8,
        n_downsample_global=2,
        n_blocks_global=1,
        num_D=2,
        n_layers_D=2,
        no_vgg_loss=True,
        batchSize=2,
        use_masked_image=True,
    )
    model = create_model(opt)
    batch = synthetic_batch(rng, 2, hw=(64, 64), label_nc=opt.label_nc)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    nnops.set_default_precision("default")
    try:
        assert nnops.stem_pack_enabled()
        params = model.init_params(jax.random.PRNGKey(0), batch)
        total_ref, (m_ref, fake_ref) = model.losses(params, batch)
        encode.INTERPRET = True
        prev_mode = pcfg._ENCODE_KERNEL
        pcfg.set_encode_kernel(3)
        try:
            total_pl, (m_pl, fake_pl) = model.losses(params, batch)
            # d_losses path (pool split-step) with tuple cond
            ld, md = model.d_losses(params, batch, jax.lax.stop_gradient(fake_pl))
        finally:
            encode.INTERPRET = False
            pcfg.set_encode_kernel(prev_mode)
        np.testing.assert_allclose(
            np.asarray(fake_pl), np.asarray(fake_ref), atol=1e-5, rtol=1e-5
        )
        for k in m_ref:
            np.testing.assert_allclose(
                float(m_pl[k]), float(m_ref[k]), atol=1e-5, rtol=1e-5
            )
        assert np.isfinite(float(ld))
    finally:
        nnops.set_default_precision("highest")


def test_encode_vmem_gate_rejects_1024p_widths():
    """The encode kernel's scoped-VMEM row budget (encode.rows_fit): the
    flagship 512-wide shape is eligible, the 1024p LocalEnhancer width is
    NOT — at 1024x512 the kernel dies in COMPILE with a scoped-vmem OOM
    (measured 2026-08-19), which silently broke every 1024p train/bench
    run after the mode-2 default flip. The gate must fall back to XLA's
    fused build there."""
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

    import jax.numpy as jnp

    assert encode.rows_fit(512, 35)                  # flagship bf16: proven
    assert not encode.rows_fit(1024, 35)             # 1024p: compile OOM
    assert not encode.rows_fit(512, 100)             # wide label spaces
    assert not encode.rows_fit(512, 35, jnp.float32)  # f32 two-step: 8KB over
    # full-res expansion (encode_full) gate is stricter: f32 dies in
    # compile even AT the byte limit (measured 2026-08-19: W=256 nc=35 f32
    # = exactly 39936 row bytes, scoped alloc 29.17M > 16M) — bf16 only
    assert encode.full_rows_fit(512, 35)
    assert not encode.full_rows_fit(256, 35, jnp.float32)
    assert not encode.full_rows_fit(1024, 35)
    assert encode.rows_fit(256, 35, jnp.float32)     # packed f32@256: proven
