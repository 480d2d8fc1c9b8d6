"""Parity test for conv2d_reflect's FUSED branch (advisor r4 medium).

The fused form (zero-SAME conv + border-strip corrections, nnops.py
conv2d_reflect) engages only at Precision.DEFAULT — the perf tier every
bf16 generator runs — while all other parity suites pin HIGHEST, which
takes the literal reflect_pad+conv fallback. This test runs the fused
branch explicitly and checks fwd+grad against the literal lowering at
p=1/2/3, minimal 3*p shapes, and bias/no-bias. On CPU Precision.DEFAULT
is fp32-accurate, so tolerances are tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def default_precision():
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    nnops.set_default_precision("default")
    prev = nnops.get_conv_reflect_fused()
    nnops.set_conv_reflect_fused(True)  # the branch under test (config-
    # keyed OFF for the flagship after the r5 regression find)
    yield
    nnops.set_conv_reflect_fused(prev)
    nnops.set_default_precision("highest")


@pytest.mark.parametrize("p", [1, 2, 3])
@pytest.mark.parametrize("shape", ["minimal", "rect"])
@pytest.mark.parametrize("bias", [True, False])
def test_conv2d_reflect_fused_matches_literal(default_precision, p, shape, bias):
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    k = 2 * p + 1
    if shape == "minimal":
        h = wd = 3 * p  # smallest extent the fused branch accepts
    else:
        h, wd = 3 * p + 2, 3 * p + 5
    rng = np.random.RandomState(p * 10 + bias)
    x = jnp.asarray(rng.randn(2, h, wd, 5), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 5, 7) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(7), jnp.float32) if bias else None

    # the fused branch must actually engage: DEFAULT precision, h/w >= 3p
    ref = nnops.conv2d(nnops.reflect_pad(x, p), w, b)
    got = nnops.conv2d_reflect(x, w, b)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)

    def mkloss(impl):
        def f(*args):
            return jnp.sum(jnp.cos(impl(*args)))

        return jax.grad(f, argnums=tuple(range(3 if bias else 2)))

    args = (x, w, b) if bias else (x, w)
    gr = mkloss(lambda *a: nnops.conv2d(nnops.reflect_pad(a[0], p), *a[1:]))(*args)
    gf = mkloss(nnops.conv2d_reflect)(*args)
    for a, c in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)


def test_conv2d_reflect_highest_takes_literal_path(default_precision):
    """At HIGHEST the function must route to the literal form (bit-exact
    with reflect_pad+conv by construction)."""
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4) * 0.1, jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    ref = nnops.conv2d(nnops.reflect_pad(x, 1), w, precision=hp)
    got = nnops.conv2d_reflect(x, w, precision=hp)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_conv_module_reflect_precondition_raises():
    """Conv(reflect=...) with violating stride/padding/kernel must raise
    (was a bare assert, stripped under python -O; advisor r4 low)."""
    from neurips18_hierchical_image_manipulation_tpu.models.networks import Conv

    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="reflect"):
        Conv(features=4, kernel=3, stride=2, padding=0, reflect=1).init(
            jax.random.PRNGKey(0), x
        )
    with pytest.raises(ValueError, match="reflect"):
        Conv(features=4, kernel=5, stride=1, padding=0, reflect=1).init(
            jax.random.PRNGKey(0), x
        )
