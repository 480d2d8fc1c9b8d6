"""Byte-diet custom VJP for instance norm (+folded activation)
(ops/nnops.py `_in_act` / `_in_packed_act`, VERDICT r3 next#2).

The custom backward must match jax-native autodiff of the same forward —
value AND gradient — on every routing: plain IN, IN+relu, IN+lrelu,
lane-folded stats (c<128) and full-lane (c>=128), fp32 and bf16, and the
packed stem variant. Native autodiff is obtained by differentiating the
non-custom composition directly (the HIMAN_IN_CUSTOM_VJP=0 arm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.ops import nnops


def _native_in_act(x, act, eps=1e-5):
    """jax-native autodiff reference: same perf-path stats, no custom VJP."""
    mean, rstd = nnops._in_stats(x, eps)
    y = ((x.astype(jnp.float32) - mean) * rstd).astype(x.dtype)
    return nnops._apply_act(y, act)


@pytest.mark.parametrize("act", ["none", "relu", "lrelu"])
@pytest.mark.parametrize(
    "shape", [(2, 8, 16, 64), (2, 8, 16, 128)]  # lane-folded and full-lane
)
def test_in_act_matches_native_fp32(act, shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ct = jnp.asarray(rng.randn(*shape).astype(np.float32))

    y_c, vjp_c = jax.vjp(lambda a: nnops._in_act(a, 1e-5, act), x)
    y_n, vjp_n = jax.vjp(lambda a: _native_in_act(a, act), x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_n), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vjp_c(ct)[0]), np.asarray(vjp_n(ct)[0]), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("act", ["none", "relu"])
def test_in_act_matches_native_bf16(act):
    """bf16 inputs: fp32 internals make custom and native agree to bf16
    rounding of the same fp32 result (grads: the two backwards cast at
    different points, so allow a couple of bf16 ulp — values here are
    O(1), ulp(2..4) = 0.03125)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 64), jnp.bfloat16)
    ct = jnp.asarray(rng.randn(2, 8, 16, 64), jnp.bfloat16)
    y_c, vjp_c = jax.vjp(lambda a: nnops._in_act(a, 1e-5, act), x)
    y_n, vjp_n = jax.vjp(lambda a: _native_in_act(a, act), x)
    np.testing.assert_allclose(
        np.asarray(y_c, np.float32), np.asarray(y_n, np.float32), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(vjp_c(ct)[0], np.float32),
        np.asarray(vjp_n(ct)[0], np.float32),
        atol=0.05,
    )


def test_in_act_grad_matches_torch_form():
    """Independent oracle: finite-difference check of a scalar loss through
    IN+relu (fp32, small tensor, central differences)."""
    rng = np.random.RandomState(2)
    x0 = rng.randn(1, 4, 4, 8).astype(np.float32)
    w = rng.randn(1, 4, 4, 8).astype(np.float32)

    def loss(a):
        return jnp.sum(nnops._in_act(a, 1e-5, "relu") * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x0)))
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 1, 2, 3), (0, 3, 3, 7)]:
        xp = x0.copy(); xp[idx] += eps
        xm = x0.copy(); xm[idx] -= eps
        fd = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, atol=5e-3, rtol=5e-3)


def test_instance_norm_routes_through_custom_vjp(monkeypatch):
    """With the gate ON, the perf tier routes plain instance_norm via the
    custom VJP (value equality with the HIGHEST parity path). The gate
    defaults OFF (measured 0.4% slower end-to-end at bs32 — see the
    nnops gate comment / reports/remat_sweep_r04.jsonl)."""
    monkeypatch.setattr(nnops, "_IN_CUSTOM_VJP", True)
    prev = nnops.get_default_precision()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    try:
        nnops.set_default_precision("default")
        y_perf = nnops.instance_norm(x)
        nnops.set_default_precision("highest")
        y_par = nnops.instance_norm(x)
    finally:
        nnops.set_default_precision(prev)
    np.testing.assert_allclose(np.asarray(y_perf), np.asarray(y_par), atol=1e-5)


@pytest.mark.parametrize("act", ["none", "relu"])
def test_in_packed_act_matches_unpacked(act):
    """Packed custom VJP == unpack -> IN(+act): value and gradient."""
    from neurips18_hierchical_image_manipulation_tpu.ops.nnops import _s2d

    rng = np.random.RandomState(4)
    c = 16
    x = jnp.asarray(rng.randn(2, 8, 16, c).astype(np.float32))
    x2 = _s2d(x)
    ct = jnp.asarray(rng.randn(*x2.shape).astype(np.float32))

    def packed(a2):
        return nnops._in_packed_act(a2, c, 1e-5, act)

    def unpacked(a2):
        n, h2, w2, c4 = a2.shape
        a = a2.reshape(n, h2, w2, 2, 2, c)
        a = a.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c)
        y = _native_in_act(a, act)
        y = y.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, h2, w2, 4 * c)

    y_p, vjp_p = jax.vjp(packed, x2)
    y_u, vjp_u = jax.vjp(unpacked, x2)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vjp_p(ct)[0]), np.asarray(vjp_u(ct)[0]), atol=1e-5, rtol=1e-5
    )


def test_factory_keys_custom_vjp_by_config(monkeypatch, tmp_path):
    """create_model auto-enables the IN custom VJP for the LocalEnhancer
    family (measured +7.1% at 1024p) and disables it for the flagship
    GlobalGenerator (measured -0.4%); an explicit HIMAN_IN_CUSTOM_VJP
    env var wins."""
    import os

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )

    monkeypatch.setattr(nnops, "_IN_CUSTOM_VJP_ENV", None)
    base = dict(
        name="vjpauto", checkpoints_dir=os.path.join(str(tmp_path), "c"),
        label_nc=8, ngf=8, ndf=8, n_downsample_global=2, n_blocks_global=1,
        num_D=1, n_layers_D=2, no_vgg_loss=True,
    )
    create_model(MaskToImageTrainOptions(netG="local", n_blocks_local=1, **base))
    assert nnops._IN_CUSTOM_VJP is True
    create_model(MaskToImageTrainOptions(netG="global", **base))
    assert nnops._IN_CUSTOM_VJP is False
    # explicit env wins over auto
    monkeypatch.setattr(nnops, "_IN_CUSTOM_VJP_ENV", "1")
    create_model(MaskToImageTrainOptions(netG="global", **base))
    assert nnops._IN_CUSTOM_VJP is False  # set_in_custom_vjp no-ops...
    nnops.set_in_custom_vjp(True)
    assert nnops._IN_CUSTOM_VJP is False  # ...always, under explicit env
