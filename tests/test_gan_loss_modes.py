"""GANLoss mode coverage: vanilla BCE (--no_lsgan) vs torch oracle, and
list-of-lists handling (C17)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.losses import gan_loss


def test_vanilla_bce_matches_torch(rng):
    x = rng.randn(2, 7, 9, 1).astype(np.float32) * 2
    for target in (True, False):
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.full((2, 7, 9, 1), float(target))
        ).item()
        got = float(gan_loss(jnp.asarray(x), target, use_lsgan=False))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_lsgan_multiscale_sum(rng):
    a = rng.randn(1, 4, 4, 1).astype(np.float32)
    b = rng.randn(1, 2, 2, 1).astype(np.float32)
    multiscale = [[jnp.asarray(a) * 0, jnp.asarray(a)], [jnp.asarray(b)]]
    got = float(gan_loss(multiscale, True, use_lsgan=True))
    want = float(np.mean((a - 1) ** 2) + np.mean((b - 1) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_visualizer_tf_log(tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.utils.visualizer import (
        Visualizer,
    )
    import os

    opt = MaskToImageTrainOptions(
        name="tb", checkpoints_dir=str(tmp_path), tf_log=True, no_html=True
    )
    opt.parse()
    vis = Visualizer(opt)
    vis.plot_current_errors({"G_GAN": 0.5}, step=1)
    vis.display_current_results(
        {"img": np.zeros((8, 8, 3), np.uint8)}, epoch=1, step=1
    )
    logdir = os.path.join(str(tmp_path), "tb", "logs")
    assert any(f.startswith("events") for f in os.listdir(logdir))
