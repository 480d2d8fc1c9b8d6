"""Golden-value tests: ops/nnops primitives vs the CPU-torch oracle.

fp32 "bit-comparable" bar from BASELINE.json:5 — realized as a tight ulp
band vs torch 2.x CPU (SURVEY.md §8 Hard parts): atol 1e-5 absolute /
relative on unit-scale inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu import ops


def nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


@pytest.mark.parametrize("stride,padding,k", [(1, 0, 1), (1, 1, 3), (2, 1, 3), (1, 3, 7), (2, 1, 4), (1, 2, 4)])
def test_conv2d(rng, stride, padding, k):
    x = rng.randn(2, 5, 12, 16).astype(np.float32)  # NCHW for torch
    w = rng.randn(7, 5, k, k).astype(np.float32) * 0.1
    b = rng.randn(7).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding).numpy()
    got = ops.conv2d(
        jnp.asarray(nhwc(x)),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW -> HWIO
        jnp.asarray(b),
        stride=stride,
        padding=padding,
    )
    np.testing.assert_allclose(nchw(got), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("stride,padding,outpad,k", [(2, 1, 1, 3), (2, 0, 0, 2), (1, 1, 0, 3), (2, 1, 0, 4)])
def test_conv_transpose2d(rng, stride, padding, outpad, k):
    x = rng.randn(2, 6, 9, 11).astype(np.float32)
    w = rng.randn(6, 4, k, k).astype(np.float32) * 0.1  # torch: (in, out, kh, kw)
    b = rng.randn(4).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=stride,
                             padding=padding, output_padding=outpad).numpy()
    got = ops.conv_transpose2d(
        jnp.asarray(nhwc(x)),
        jnp.asarray(np.transpose(w, (2, 3, 0, 1))),  # IOHW -> HWIO
        jnp.asarray(b),
        stride=stride,
        padding=padding,
        output_padding=outpad,
    )
    assert nchw(got).shape == ref.shape
    np.testing.assert_allclose(nchw(got), ref, atol=2e-5, rtol=2e-5)


def test_instance_norm(rng):
    x = rng.randn(3, 8, 10, 14).astype(np.float32) * 3 + 1
    ref = F.instance_norm(torch.from_numpy(x), eps=1e-5).numpy()
    got = ops.instance_norm(jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nchw(got), ref, atol=1e-5, rtol=1e-5)


def test_reflect_pad(rng):
    x = rng.randn(2, 3, 8, 9).astype(np.float32)
    ref = F.pad(torch.from_numpy(x), (3, 3, 3, 3), mode="reflect").numpy()
    got = ops.reflect_pad(jnp.asarray(nhwc(x)), 3)
    np.testing.assert_allclose(nchw(got), ref, atol=0, rtol=0)


def test_avg_pool_3x3s2(rng):
    x = rng.randn(2, 4, 17, 23).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                       count_include_pad=False).numpy()
    got = ops.avg_pool_3x3s2(jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nchw(got), ref, atol=1e-6, rtol=1e-6)


def test_avg_pool_3x3s2_slices_impl(rng):
    """The gated strided-slice pool (HIMAN_POOL_IMPL=slices) matches torch
    AND the literal reduce_window form in both forward and gradient — kept
    correct as a tuning surface even while default-off (measured 91.08 vs
    92.34 img/s end-to-end, see nnops._POOL_IMPL)."""
    import jax

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    x = rng.randn(2, 6, 16, 24).astype(np.float32)  # even H/W: slices-eligible
    ref = F.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                       count_include_pad=False).numpy()
    xj = jnp.asarray(nhwc(x))
    got = nnops._avg_pool_3x3s2_slices(xj)
    np.testing.assert_allclose(nchw(got), ref, atol=1e-6, rtol=1e-6)
    g_slices = jax.grad(lambda t: jnp.sum(jnp.sin(nnops._avg_pool_3x3s2_slices(t))))(xj)
    g_literal = jax.grad(
        lambda t: jnp.sum(jnp.sin(nnops._avg_pool_3x3s2_reduce_window(t)))
    )(xj)
    np.testing.assert_allclose(g_slices, g_literal, atol=1e-6, rtol=1e-6)


def test_max_pool_2x2(rng):
    x = rng.randn(2, 4, 16, 20).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = ops.max_pool_2x2(jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nchw(got), ref, atol=0, rtol=0)


def test_leaky_relu(rng):
    x = rng.randn(2, 3, 4, 5).astype(np.float32)
    ref = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    got = ops.leaky_relu(jnp.asarray(nhwc(x)), 0.2)
    np.testing.assert_allclose(nchw(got), ref, atol=0, rtol=0)


def test_upsample_nearest_2x(rng):
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = ops.upsample_nearest_2x(jnp.asarray(nhwc(x)))
    np.testing.assert_allclose(nchw(got), ref, atol=0, rtol=0)


def test_one_hot_and_edges(rng):
    label = rng.randint(0, 35, size=(2, 6, 7))
    oh = ops.one_hot_label(jnp.asarray(label), 35)
    # torch scatter_ oracle
    t = torch.zeros(2, 35, 6, 7)
    t.scatter_(1, torch.from_numpy(label[:, None]).long(), 1.0)
    np.testing.assert_array_equal(nchw(oh), t.numpy())

    inst = rng.randint(0, 4, size=(2, 6, 7))
    edges = np.asarray(ops.instance_edges(jnp.asarray(inst)))[..., 0]
    # oracle: pix2pixHD get_edges
    ti = torch.from_numpy(inst)
    e = torch.zeros_like(ti, dtype=torch.bool)
    e[:, :, 1:] |= ti[:, :, 1:] != ti[:, :, :-1]
    e[:, :, :-1] |= ti[:, :, 1:] != ti[:, :, :-1]
    e[:, 1:, :] |= ti[:, 1:, :] != ti[:, :-1, :]
    e[:, :-1, :] |= ti[:, 1:, :] != ti[:, :-1, :]
    np.testing.assert_array_equal(edges, e.float().numpy())


def test_segment_mean(rng):
    feat = rng.randn(1, 4, 4, 3).astype(np.float32)
    seg = rng.randint(0, 5, size=(1, 4, 4))
    out = np.asarray(ops.segment_mean_2d(jnp.asarray(feat), jnp.asarray(seg), 8))
    for s in np.unique(seg):
        m = seg[0] == s
        want = feat[0][m].mean(axis=0)
        np.testing.assert_allclose(out[0][m], np.broadcast_to(want, out[0][m].shape),
                                   atol=1e-5, rtol=1e-5)


def test_conv_transpose_subpixel_matches_adjoint(rng):
    """Phase-decomposed ConvT(k3,s2,p1,op1) == adjoint form (and the torch
    oracle) at fp32, values and gradients."""
    import jax

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    x = jnp.asarray(rng.randn(2, 9, 13, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)

    ref = nnops.conv_transpose2d(
        x, w, b, stride=2, padding=1, output_padding=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    got = nnops.conv_transpose2d_subpixel(
        x, w, b, precision=jax.lax.Precision.HIGHEST
    )
    assert got.shape == ref.shape == (2, 18, 26, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def loss_a(x, w):
        return jnp.sum(
            nnops.conv_transpose2d(
                x, w, precision=jax.lax.Precision.HIGHEST
            ) ** 2
        )

    def loss_s(x, w):
        return jnp.sum(
            nnops.conv_transpose2d_subpixel(
                x, w, precision=jax.lax.Precision.HIGHEST
            ) ** 2
        )

    ga = jax.grad(loss_a, argnums=(0, 1))(x, w)
    gs = jax.grad(loss_s, argnums=(0, 1))(x, w)
    for a, s in zip(ga, gs):
        np.testing.assert_allclose(np.asarray(s), np.asarray(a), atol=5e-3, rtol=1e-4)


def test_conv_transpose_impl_switch(rng):
    """'auto' picks subpixel on the DEFAULT-precision perf path and the
    adjoint on the HIGHEST-precision parity path; both agree numerically."""
    import jax

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.1)
    try:
        nnops.set_conv_transpose_impl("adjoint")
        a = nnops.conv_transpose2d(x, w, precision=jax.lax.Precision.HIGHEST)
        nnops.set_conv_transpose_impl("subpixel")
        s = nnops.conv_transpose2d(x, w, precision=jax.lax.Precision.HIGHEST)
    finally:
        nnops.set_conv_transpose_impl("auto")
    np.testing.assert_allclose(np.asarray(s), np.asarray(a), atol=2e-5, rtol=1e-5)


def test_convt_phase_bwd_matches_adjoint_grads():
    """HIMAN_CONVT_PHASE_BWD custom VJP (opt-in; measured slower end-to-end
    but kept as a tuning surface) must match the adjoint AD exactly."""
    import jax
    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    nnops.set_default_precision("default")
    try:
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 8, 10, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 12).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(12).astype(np.float32))
        g = jnp.asarray(rng.randn(2, 16, 20, 12).astype(np.float32))

        def f(x, w, b):
            return jnp.sum(nnops.conv_transpose2d(x, w, b) * g)

        old = nnops._CONVT_PHASE_BWD
        nnops._CONVT_PHASE_BWD = False
        gr = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
        nnops._CONVT_PHASE_BWD = True
        gc = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
        nnops._CONVT_PHASE_BWD = old
        for a, c in zip(gr, gc):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-5, rtol=1e-5)
    finally:
        nnops.set_default_precision("highest")


def test_segment_mean_bf16_large_regions():
    """Counts/sums must accumulate in f32: a bf16 running count saturates
    at 256, so any >256-px instance (road/sky are 10k-100k px) got wrong
    means under the bf16 training policy."""
    import jax.numpy as jnp2

    rng = np.random.RandomState(0)
    h, w = 40, 40  # one segment of 1600 px >> 256
    feat = rng.randn(1, h, w, 3).astype(np.float32)
    seg = np.zeros((1, h, w), np.int32)
    ref = np.asarray(
        ops.segment_mean_2d(jnp2.asarray(feat), jnp2.asarray(seg), 4)
    )
    got = np.asarray(
        ops.segment_mean_2d(jnp2.asarray(feat, jnp2.bfloat16), jnp2.asarray(seg), 4)
    ).astype(np.float32)
    # bf16 inputs: means agree with the f32 reference to bf16 resolution
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
