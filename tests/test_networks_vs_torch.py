"""Module-level golden tests: flax networks vs CPU-torch oracles at fp32
(SURVEY.md §5 level 2). Small spatial sizes keep 1-core CPU CI fast."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.models import networks
from torch_oracle import (
    GlobalGeneratorT,
    NLayerDiscriminatorT,
    global_generator_params,
    nlayer_discriminator_params,
)

ATOL = 5e-5


def test_global_generator_parity(rng):
    torch.manual_seed(0)
    n_down, n_blocks, ngf, label_nc = 2, 3, 16, 8
    t = GlobalGeneratorT(label_nc, 3, ngf=ngf, n_down=n_down, n_blocks=n_blocks).eval()
    x = rng.randn(2, label_nc, 32, 64).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()

    g = networks.GlobalGenerator(output_nc=3, ngf=ngf, n_downsampling=n_down, n_blocks=n_blocks)
    params = global_generator_params(t, n_down=n_down, n_blocks=n_blocks)
    got = g.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
    )


def test_nlayer_discriminator_parity(rng):
    torch.manual_seed(1)
    in_nc, ndf, n_layers = 7, 16, 3
    t = NLayerDiscriminatorT(in_nc, ndf=ndf, n_layers=n_layers).eval()
    x = rng.randn(2, in_nc, 36, 52).astype(np.float32)
    with torch.no_grad():
        ref_feats = [f.numpy() for f in t(torch.from_numpy(x))]

    d = networks.NLayerDiscriminator(ndf=ndf, n_layers=n_layers, get_interm_feat=True)
    params = {"params": nlayer_discriminator_params(t)}
    got_feats = d.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert len(got_feats) == len(ref_feats) == n_layers + 2
    for got, ref in zip(got_feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
        )


def test_multiscale_discriminator_shapes(rng):
    d = networks.MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2, get_interm_feat=True)
    x = jnp.asarray(rng.randn(1, 64, 96, 6).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert len(out) == 2  # scales
    assert len(out[0]) == 2 + 2  # n_layers + 2 feature taps
    # scale 1 runs on a 3x3s2-avg-pooled input -> half spatial logits
    assert out[0][-1].shape[1] // out[1][-1].shape[1] in (1, 2)
    assert out[0][-1].shape[-1] == 1


def test_local_enhancer_shapes(rng):
    g = networks.LocalEnhancer(
        output_nc=3, ngf=8, n_downsample_global=2, n_blocks_global=2,
        n_local_enhancers=1, n_blocks_local=1,
    )
    x = jnp.asarray(rng.randn(1, 64, 128, 9).astype(np.float32))
    params = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(params, x)
    assert out.shape == (1, 64, 128, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_vgg19_taps(rng):
    v = networks.Vgg19Features()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = v.init(jax.random.PRNGKey(0), x)
    taps = v.apply(params, x)
    assert [t.shape for t in taps] == [
        (1, 64, 64, 64),
        (1, 32, 32, 128),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 512),
    ]


def test_two_stream_structure_generator(rng):
    label_nc = 8
    g = networks.TwoStreamStructureGenerator(
        label_nc=label_nc, ngf=8, n_downsampling=2, n_blocks=1
    )
    masked = jnp.asarray(rng.rand(2, 32, 32, label_nc).astype(np.float32))
    boxmask = jnp.zeros((2, 32, 32, 1)).at[:, 8:24, 8:24].set(1.0)
    cls = jax.nn.one_hot(jnp.asarray([3, 5]), label_nc)
    params = g.init(jax.random.PRNGKey(0), masked, boxmask, cls)
    layout_logits, mask_logit, merged = g.apply(params, masked, boxmask, cls)
    assert layout_logits.shape == (2, 32, 32, label_nc)
    assert mask_logit.shape == (2, 32, 32, 1)
    # merged is a probability field
    np.testing.assert_allclose(np.asarray(merged.sum(-1)), 1.0, atol=1e-5)
    # outside the box the object mask is zeroed -> merged == softmax(ctx)
    ctx = jax.nn.softmax(layout_logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(merged[:, 0, 0]), np.asarray(ctx[:, 0, 0]), atol=1e-6
    )


def test_encoder_instance_pooling(rng):
    enc = networks.Encoder(feat_num=3, nef=4, n_downsampling=2, label_nc=8, instance_slots=4)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    inst = jnp.zeros((1, 32, 32), jnp.int32).at[:, :16].set(2001)
    params = enc.init(jax.random.PRNGKey(0), img, inst)
    out = enc.apply(params, img, inst)
    assert out.shape == (1, 32, 32, 3)
    # within one instance the pooled feature is constant
    region = np.asarray(out[0, :16])
    np.testing.assert_allclose(region, np.broadcast_to(region[0, 0], region.shape), atol=1e-5)


def test_local_enhancer_parity(rng):
    """fp32 parity for the FULL LocalEnhancer (VERDICT r1 weak#4): trunk
    feature-sum, branch ordering, and head all checked vs the oracle."""
    from torch_oracle import LocalEnhancerT, local_enhancer_params

    torch.manual_seed(2)
    in_nc, ngf = 8, 8
    n_down_g, n_blocks_g, n_blocks_l = 2, 2, 2
    t = LocalEnhancerT(
        in_nc, 3, ngf=ngf, n_down_global=n_down_g,
        n_blocks_global=n_blocks_g, n_blocks_local=n_blocks_l,
    ).eval()
    x = rng.randn(2, in_nc, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()

    g = networks.LocalEnhancer(
        output_nc=3, ngf=ngf, n_downsample_global=n_down_g,
        n_blocks_global=n_blocks_g, n_local_enhancers=1,
        n_blocks_local=n_blocks_l,
    )
    params = local_enhancer_params(t, n_down_g, n_blocks_g, n_blocks_l)
    got = g.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
    )


def test_batch_norm_op_vs_torch(rng):
    """nnops.batch_norm == torch.nn.functional.batch_norm(training=True)
    (biased variance over (N,H,W), eps 1e-5, affine)."""
    import torch.nn.functional as F

    x = rng.randn(3, 10, 14, 6).astype(np.float32)
    scale = rng.randn(6).astype(np.float32)
    bias = rng.randn(6).astype(np.float32)
    ref = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), None, None,
        weight=torch.from_numpy(scale), bias=torch.from_numpy(bias),
        training=True, eps=1e-5,
    ).numpy()

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    got = nnops.batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
    )


def test_global_generator_batch_norm_parity(rng):
    """--norm batch fp32 parity: GlobalGenerator with BatchNorm2d(affine)
    vs the torch oracle (batch statistics — see torch_oracle.BN)."""
    from torch_oracle import BN

    torch.manual_seed(4)
    n_down, n_blocks, ngf, label_nc = 2, 2, 8, 6
    t = GlobalGeneratorT(
        label_nc, 3, ngf=ngf, n_down=n_down, n_blocks=n_blocks, norm=BN
    ).eval()
    # give the affine params non-trivial values (reference weights_init)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0.0, 0.1)
    x = rng.randn(2, label_nc, 32, 48).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()

    g = networks.GlobalGenerator(
        output_nc=3, ngf=ngf, n_downsampling=n_down, n_blocks=n_blocks,
        norm="batch",
    )
    params = global_generator_params(t, n_down=n_down, n_blocks=n_blocks)
    got = g.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
    )
    # init sanity: the flax init tree has the same structure as the mapping
    init = g.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert jax.tree_util.tree_structure(init) == jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, params)
    )


def test_nlayer_discriminator_batch_norm_parity(rng):
    from torch_oracle import BN

    torch.manual_seed(5)
    in_nc, ndf, n_layers = 5, 8, 3
    t = NLayerDiscriminatorT(in_nc, ndf=ndf, n_layers=n_layers, norm=BN).eval()
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0.0, 0.1)
    x = rng.randn(2, in_nc, 36, 40).astype(np.float32)
    with torch.no_grad():
        ref_feats = [f.numpy() for f in t(torch.from_numpy(x))]

    d = networks.NLayerDiscriminator(
        ndf=ndf, n_layers=n_layers, get_interm_feat=True, norm="batch"
    )
    params = {"params": nlayer_discriminator_params(t)}
    got_feats = d.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for got, ref in zip(got_feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
        )


def test_encoder_parity(rng):
    """fp32 parity for the instance-feature Encoder incl. instance-wise
    average pooling (VERDICT r1 weak#4)."""
    from torch_oracle import EncoderT, encoder_params

    torch.manual_seed(3)
    nef, feat_num, n_down = 8, 3, 2
    t = EncoderT(3, feat_num=feat_num, nef=nef, n_down=n_down).eval()
    img = rng.randn(2, 3, 32, 64).astype(np.float32)
    # instance map: things (class*1000+k, k<64 so the flax segment remap is
    # collision-free) + stuff regions (id == class id)
    inst = np.zeros((2, 32, 64), np.int32)
    inst[:, :16] = 23          # stuff: sky
    inst[:, 16:] = 7           # stuff: road
    inst[0, 4:20, 10:30] = 26000
    inst[0, 8:28, 40:60] = 26001
    inst[1, 2:14, 5:25] = 24000
    with torch.no_grad():
        ref = t(torch.from_numpy(img), torch.from_numpy(inst)).numpy()

    e = networks.Encoder(
        feat_num=feat_num, nef=nef, n_downsampling=n_down, label_nc=35
    )
    params = encoder_params(t, n_down=n_down)
    got = e.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(inst),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=ATOL, rtol=1e-4
    )


def test_structure_generator_class_sensitivity(rng):
    """Round-5 regression: the class conditioning must SURVIVE the
    InstanceNorms. The original concat->1x1conv->IN fuse was provably
    class-blind (a tiled one-hot is spatially constant, and IN subtracts
    the per-(N,C) spatial mean — outputs were bit-identical for every
    class). The fix injects a class embedding post-norm, pre-ReLU.
    Checks: different classes produce different streams; the null class
    (all-zeros one-hot, id -1) produces a zero shift by construction."""
    label_nc = 8
    g = networks.TwoStreamStructureGenerator(
        label_nc=label_nc, ngf=8, n_downsampling=2, n_blocks=1
    )
    masked = jnp.asarray(rng.rand(1, 32, 32, label_nc).astype(np.float32))
    boxmask = jnp.zeros((1, 32, 32, 1)).at[:, 8:24, 8:24].set(1.0)

    def run(cls_id):
        cls = jax.nn.one_hot(jnp.asarray([cls_id]), label_nc)  # -1 -> zeros
        return g.apply(params, masked, boxmask, cls)

    params = g.init(
        jax.random.PRNGKey(0), masked, boxmask,
        jax.nn.one_hot(jnp.asarray([3]), label_nc),
    )
    l3, m3, _ = run(3)
    l5, m5, _ = run(5)
    ln, mn, _ = run(-1)
    # class changes BOTH streams (this was bit-identical pre-fix)
    assert float(jnp.abs(l3 - l5).max()) > 1e-6
    assert float(jnp.abs(m3 - m5).max()) > 1e-6
    assert float(jnp.abs(l3 - ln).max()) > 1e-6
    # the null-class embedding is exactly the Dense bias-free zero shift:
    # one-hot(-1) is all-zeros, so cls_embed contributes nothing
    emb = params["params"]["cls_embed"]["kernel"]
    shift = jnp.zeros((emb.shape[1],))
    np.testing.assert_allclose(
        np.asarray(jax.nn.one_hot(jnp.asarray([-1]), label_nc) @ emb),
        np.asarray(shift[None]), atol=0,
    )
