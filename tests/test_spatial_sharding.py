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


def test_halo_conv_on_2d_mesh_dp_x_spatial(rng):
    """DP x spatial composition on a 2-D (data=2, spatial=4) mesh: batch
    sharded on 'data', W sharded on 'spatial', halos exchanged along the
    spatial axis only — equals the unsharded conv. Demonstrates the §6.7
    escape hatch composing with the production data axis (the >2K-res
    deployment shape)."""
    from jax.sharding import PartitionSpec as P

    from neurips18_hierchical_image_manipulation_tpu.parallel.spatial import (
        halo_exchange_conv2d,
    )

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "spatial"))

    x = jnp.asarray(rng.randn(4, 8, 32, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    ref = nnops.conv2d(x, w, b, stride=1, padding=1)

    def inner(xs, w, b):
        return halo_exchange_conv2d(xs, w, b, padding=1, axis_name="spatial")

    fn = jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P("data", None, "spatial", None), P(), P()),
            out_specs=P("data", None, "spatial", None),
        )
    )
    got = fn(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_spatial_generator_matches_unsharded():
    """The FULL W-sharded GlobalGenerator forward (stem reflect-7, stride-2
    downs, resblocks, transposed-conv ups, psum'd InstanceNorm, head)
    equals the unsharded generator on an 8-device mesh."""
    import numpy as np
    from jax.sharding import Mesh
    from neurips18_hierchical_image_manipulation_tpu.models import networks
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.parallel import spatial

    n_dev = len(jax.devices())
    if n_dev < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(jax.devices()), ("data",))

    rng = np.random.RandomState(7)
    n_down, n_blocks = 2, 2
    net = networks.GlobalGenerator(
        output_nc=3, ngf=8, n_downsampling=n_down, n_blocks=n_blocks
    )
    x = jnp.asarray(rng.randn(1, 16, 8 * n_dev * 2 ** n_down, 5), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)

    nnops.set_default_precision("highest")  # parity tier on both paths
    try:
        want = np.asarray(net.apply(params, x))
        fn = spatial.make_spatial_generator(
            mesh, params, n_downsampling=n_down, n_blocks=n_blocks
        )
        got = np.asarray(fn(x))
    finally:
        nnops.set_default_precision("highest")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_spatial_local_enhancer_matches_unsharded():
    """W-sharded LocalEnhancer (sharded avg-pool pyramid + global trunk +
    local branch + head) equals the unsharded 1024p model on the mesh."""
    import numpy as np
    from jax.sharding import Mesh
    from neurips18_hierchical_image_manipulation_tpu.models import networks
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.parallel import spatial

    n_dev = len(jax.devices())
    if n_dev < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(jax.devices()), ("data",))

    rng = np.random.RandomState(3)
    net = networks.LocalEnhancer(
        output_nc=3, ngf=4, n_downsample_global=2, n_blocks_global=2,
        n_local_enhancers=1, n_blocks_local=1,
    )
    x = jnp.asarray(rng.randn(1, 16, 16 * n_dev, 5), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)

    nnops.set_default_precision("highest")
    try:
        want = np.asarray(net.apply(params, x))
        fn = spatial.make_spatial_local_enhancer(
            mesh, params, n_downsample_global=2, n_blocks_global=2,
            n_local_enhancers=1, n_blocks_local=1,
        )
        got = np.asarray(fn(x))
    finally:
        nnops.set_default_precision("highest")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_spatial_generator_rejects_width1_bottleneck():
    """A per-shard bottleneck width of 1 used to silently produce an
    EMPTY output (the resblock reflect-1 edge slice is width-0); the
    guard must reject it at trace time."""
    import pytest
    from jax.sharding import Mesh

    from neurips18_hierchical_image_manipulation_tpu.models import networks
    from neurips18_hierchical_image_manipulation_tpu.parallel import spatial

    devs = np.array(jax.devices()[:2])
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(devs, ("data",))
    net = networks.GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=1)
    x = jnp.zeros((1, 16, 8, 5), jnp.float32)  # per-shard ws=4 -> bottleneck 1
    params = net.init(jax.random.PRNGKey(0), x)
    fn = spatial.make_spatial_generator(mesh, params, n_downsampling=2, n_blocks=1)
    with pytest.raises(AssertionError, match="bottleneck"):
        fn(x)
