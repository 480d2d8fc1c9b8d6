"""W-axis spatial sharding with ppermute halo exchange == unsharded conv
(SURVEY §6.7 escape hatch, golden test on the 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neurips18_hierchical_image_manipulation_tpu.ops import nnops
from neurips18_hierchical_image_manipulation_tpu.parallel.spatial import (
    make_spatial_conv,
)


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 3)])
def test_halo_conv_matches_unsharded(rng, k, pad):
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))

    x = jnp.asarray(rng.randn(2, 8, 32, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 16, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    ref = nnops.conv2d(x, w, b, stride=1, padding=pad)
    fn = make_spatial_conv(mesh, w, b, padding=pad)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
