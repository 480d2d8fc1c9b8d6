"""Round-trip tests for the torch->npz checkpoint converters: build the
spec'd torch modules (torch_oracle), convert their state_dicts, load into
the flax nets, and check output parity — the M6 seam (SURVEY §8)."""

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.models import networks
from torch_oracle import GlobalGeneratorT, NLayerDiscriminatorT

sys.path.insert(0, "tools")
from convert_torch_checkpoint import (  # noqa: E402
    convert_global_generator,
    convert_multiscale_discriminator,
)
from load_vgg_weights import convert_vgg19_state_dict  # noqa: E402


def unflatten_into(template, flat, prefix):
    """Load flat {key: arr} into a template pytree by path."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for keypath, leaf in leaves:
        key = prefix + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        arr = flat[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), out)


def test_global_generator_converter_roundtrip(rng):
    torch.manual_seed(3)
    n_down, n_blocks, ngf, in_nc = 2, 2, 8, 6
    t = GlobalGeneratorT(in_nc, 3, ngf=ngf, n_down=n_down, n_blocks=n_blocks).eval()
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    flat = convert_global_generator(sd, n_down=n_down, n_blocks=n_blocks)

    g = networks.GlobalGenerator(output_nc=3, ngf=ngf, n_downsampling=n_down, n_blocks=n_blocks)
    x = rng.randn(1, in_nc, 16, 24).astype(np.float32)
    template = g.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params = unflatten_into(template, flat, prefix="G/")
    got = g.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-5, rtol=1e-4
    )


def test_multiscale_discriminator_converter(rng):
    torch.manual_seed(4)
    in_nc, ndf, n_layers, num_D = 5, 8, 2, 2
    # emulate pix2pixHD key layout: scale{i}_layer{n}.0.weight
    ds = [NLayerDiscriminatorT(in_nc, ndf=ndf, n_layers=n_layers).eval() for _ in range(num_D)]
    sd = {}
    for i, d in enumerate(ds):
        for n, stage in enumerate(d.stages):
            sd[f"scale{i}_layer{n}.0.weight"] = stage[0].weight.detach().numpy()
            sd[f"scale{i}_layer{n}.0.bias"] = stage[0].bias.detach().numpy()
    flat = convert_multiscale_discriminator(sd, num_D=num_D, n_layers=n_layers)

    md = networks.MultiscaleDiscriminator(
        ndf=ndf, n_layers=n_layers, num_D=num_D, get_interm_feat=True
    )
    x = rng.randn(1, in_nc, 32, 32).astype(np.float32)
    template = md.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params = unflatten_into(template, flat, prefix="D/")
    out = md.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    # our forward-order scale 0 (finest, full res input) must equal the
    # reference's LAST attribute (scale num_D-1) applied at full res
    with torch.no_grad():
        ref_feats = [f.numpy() for f in ds[num_D - 1](torch.from_numpy(x))]
    for got, ref in zip(out[0], ref_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-5, rtol=1e-4
        )


def test_vgg19_converter_shapes(rng):
    # synthetic torchvision-style state dict with correct shapes
    widths = {1: (3, 64, 64), 2: (64, 128, 128), 3: (128, 256, 256, 256, 256),
              4: (256, 512, 512, 512, 512), 5: (512, 512, 512, 512, 512)}
    from load_vgg_weights import TORCHVISION_CONV_INDICES

    sd = {}
    for (b, c), idx in TORCHVISION_CONV_INDICES.items():
        cin = widths[b][c - 1]
        cout = widths[b][c]
        sd[f"features.{idx}.weight"] = rng.randn(cout, cin, 3, 3).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(cout).astype(np.float32)
    flat = convert_vgg19_state_dict(sd)

    v = networks.Vgg19Features()
    x = jnp.zeros((1, 32, 32, 3))
    template = v.init(jax.random.PRNGKey(0), x)
    params = unflatten_into(template, flat, prefix="VGG/")
    taps = v.apply(params, x)
    assert len(taps) == 5
