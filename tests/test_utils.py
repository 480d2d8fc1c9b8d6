"""Unit tests for the util layer (imaging, html, pool, checkpoint)."""

import os

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.utils import (
    Colorize,
    ImagePool,
    tensor2im,
    tensor2label,
)
from neurips18_hierchical_image_manipulation_tpu.utils.html import HTML
from neurips18_hierchical_image_manipulation_tpu.utils.imaging import save_image


def test_tensor2im_range():
    x = np.array([[[-1.0, 0.0, 1.0]]], np.float32)[None]
    out = tensor2im(x)
    assert out.shape == (1, 1, 3)
    np.testing.assert_array_equal(out[0, 0], [0, 127, 255])


def test_tensor2label_onehot_and_ids():
    ids = np.array([[7, 26], [24, 8]])
    rgb = tensor2label(ids, 35)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0], [128, 64, 128])  # road
    np.testing.assert_array_equal(rgb[0, 1], [0, 0, 142])  # car
    onehot = np.eye(35)[ids]
    np.testing.assert_array_equal(tensor2label(onehot, 35), rgb)


def test_colorize_generic_palette_distinct():
    c = Colorize(10)
    cols = {tuple(c(np.array([[i]]))[0, 0]) for i in range(1, 10)}
    assert len(cols) == 9


def test_image_pool_passthrough_and_replay():
    pool = ImagePool(0)
    x = np.ones((2, 4, 4, 3), np.float32)
    assert pool.query(x) is x

    pool = ImagePool(4, seed=0)
    a = pool.query(np.zeros((4, 2, 2, 1)))
    assert np.all(a == 0)
    b = pool.query(np.ones((4, 2, 2, 1)))
    assert b.shape == (4, 2, 2, 1)
    vals = {float(v) for v in b.reshape(4, -1)[:, 0]}
    assert vals <= {0.0, 1.0}


def test_html_gallery(tmp_path):
    web = str(tmp_path / "web")
    page = HTML(web, "t")
    save_image(np.zeros((4, 4, 3), np.uint8), os.path.join(page.get_image_dir(), "a.png"))
    page.add_header("epoch [1]")
    page.add_images(["a.png"], ["label"], ["a.png"])
    page.save()
    html = open(os.path.join(web, "index.html")).read()
    assert "epoch [1]" in html and "images/a.png" in html


def test_checkpoint_roundtrip(tmp_path, rng):
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState

    params = {
        "G": {"w": jnp.asarray(rng.randn(3, 3).astype(np.float32))},
        "D": {"w": jnp.asarray(rng.randn(2, 2).astype(np.float32))},
    }
    tx = optax.adam(1e-3)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(7))
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    opt = MaskToImageTrainOptions(name="ck", checkpoints_dir=str(tmp_path))
    cm = CheckpointManager(opt)
    cm.save("latest", state, epoch=3, epoch_iter=17)
    assert cm.exists("latest")
    assert cm.read_iter() == (3, 17)

    zero_state = GANTrainState.create(
        jax.tree.map(jnp.zeros_like, params), tx, tx, jax.random.PRNGKey(0)
    )
    restored = cm.restore("latest", zero_state)
    assert int(restored.step) == 42
    np.testing.assert_array_equal(
        np.asarray(restored.params["G"]["w"]), np.asarray(params["G"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored.rng), np.asarray(state.rng)
    )
