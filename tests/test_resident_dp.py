"""Multi-chip fused resident step (train/steps.make_resident_dp_train_step):
resident planes replicated over the mesh, per-device gather+augment inside
shard_map, pmean'd grads — must match the single-device fused step on the
same global stream (augmentations off; the draws are decorrelated per
device by contract when on)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from neurips18_hierchical_image_manipulation_tpu.configs.options import (
    MaskToImageTrainOptions,
)
from neurips18_hierchical_image_manipulation_tpu.data.cityscapes import (
    AlignedDataset,
)
from neurips18_hierchical_image_manipulation_tpu.data.device_resident import (
    DeviceResidentLoader,
)
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState


@pytest.fixture
def dataroot8(tmp_path):
    root = tmp_path / "city8"
    for sub in ("train_label", "train_inst", "train_img"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        h, w = 32, 64
        label = np.full((h, w), 3, np.uint8)
        inst = np.zeros((h, w), np.int32)
        label[8 + i : 24, 10 : 40 + i] = 6
        inst[8 + i : 24, 10 : 40 + i] = 6000 + i
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(label).save(root / "train_label" / f"{i}.png")
        Image.fromarray(inst, mode="I").save(root / "train_inst" / f"{i}.png")
        Image.fromarray(img).save(root / "train_img" / f"{i}.png")
    return str(root)


def _setup(dataroot8, tmp_path):
    opt = MaskToImageTrainOptions(
        name="rdp",
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"),
        dataroot=dataroot8,
        loadSize=64,
        fineSize=32,
        resize_or_crop="none",
        no_flip=True,
        batchSize=8,
        serial_batches=True,
        use_bbox_dataset=False,
        use_masked_image=False,
        label_nc=35,
        ngf=8,
        ndf=8,
        n_downsample_global=2,
        n_blocks_global=1,
        num_D=1,
        n_layers_D=2,
        no_vgg_loss=True,
    )
    ds = AlignedDataset(opt)
    loader = DeviceResidentLoader(ds, batch_size=8, shuffle=True, seed=5)
    model = create_model(opt)
    sample_fn, data = loader.fused_sampler()
    params = model.init_params(jax.random.PRNGKey(0), loader.first_batch())
    tx = optax.adam(2e-4, b1=0.5)

    def fresh_state():
        return GANTrainState.create(
            jax.tree.map(jnp.array, params), tx, tx, jax.random.PRNGKey(1)
        )

    return model, loader, sample_fn, data, fresh_state


def test_resident_dp_matches_single_device(dataroot8, tmp_path):
    model, loader, sample_fn, data, fresh_state = _setup(dataroot8, tmp_path)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    assert mesh.devices.size == 8

    # single-device fused stream (shuffle ON: the global permutation is a
    # pure function of (seed, epoch), shared by both paths; augmentations
    # off so per-device draw streams don't enter)
    sstep, _ = train_steps.make_resident_train_step(
        model, sample_fn, loader.n_samples, 8, shuffle=True, seed=5, donate=False
    )
    s_a = fresh_state()
    for _ in range(3):
        s_a, m_a, _ = sstep(s_a, data)

    dstep, dstep_wb = train_steps.make_resident_dp_train_step(
        model, mesh, sample_fn, loader.n_samples, 8,
        shuffle=True, seed=5, donate=False,
    )
    data_r = train_steps.replicate(data, mesh)
    s_b = train_steps.replicate(fresh_state(), mesh)
    for _ in range(3):
        s_b, m_b, _ = dstep(s_b, data_r)

    assert int(s_a.step) == int(s_b.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6
        ),
        s_a.params, s_b.params,
    )
    for k in m_a:
        np.testing.assert_allclose(
            np.asarray(m_a[k]), np.asarray(m_b[k]), atol=1e-5, rtol=1e-5
        )

    # the global batch the mesh trained on == the single-device stream's
    s_c = train_steps.replicate(fresh_state(), mesh)
    _, _, _, fbatch = dstep_wb(s_c, data_r)
    perm = np.asarray(
        jax.random.permutation(
            jax.random.fold_in(jax.random.PRNGKey(5 ^ 0x5EED), 0),
            loader.n_samples,
        )
    )
    expect = np.asarray(data["label"])[perm[:8]]
    np.testing.assert_array_equal(np.asarray(fbatch["label"]), expect)


def test_resident_dp_rejects_indivisible_batch(dataroot8, tmp_path):
    model, loader, sample_fn, data, _ = _setup(dataroot8, tmp_path)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    with pytest.raises(ValueError, match="divisible"):
        train_steps.make_resident_dp_train_step(
            model, mesh, sample_fn, loader.n_samples, 9
        )
