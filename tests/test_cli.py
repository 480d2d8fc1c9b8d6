"""CLI smoke tests: tiny end-to-end train + test runs through the real
drivers on a synthetic PNG dataroot (SURVEY §4.1-4.3 call stacks)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def dataroot(tmp_path):
    root = tmp_path / "city"
    for sub in ("train_label", "train_inst", "train_img",
                "test_label", "test_inst", "test_img"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for phase in ("train", "test"):
        for i in range(2):
            h, w = 64, 64
            label = np.full((h, w), 3, np.uint8)
            inst = np.zeros((h, w), np.int32)
            label[20:44, 16:48] = 6
            inst[20:44, 16:48] = 6000 + i
            img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(label).save(root / f"{phase}_label" / f"{i}.png")
            Image.fromarray(inst, mode="I").save(root / f"{phase}_inst" / f"{i}.png")
            Image.fromarray(img).save(root / f"{phase}_img" / f"{i}.png")
    return str(root)


def common_flags(dataroot, tmp_path, name):
    return [
        "--name", name,
        "--dataroot", dataroot,
        "--checkpoints_dir", os.path.join(str(tmp_path), "ckpt"),
        "--label_nc", "8",
        "--ngf", "8", "--ndf", "8",
        "--n_downsample_global", "2", "--n_blocks_global", "1",
        "--n_layers_D", "2", "--num_D", "1",
        "--resize_or_crop", "none", "--no_flip",
        "--batchSize", "1", "--serial_batches",
        "--nThreads", "1",
    ]


def test_box2mask_train_and_test_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import (
        box2mask_test,
        box2mask_train,
    )

    flags = common_flags(dataroot, tmp_path, "b2m") + [
        "--fineSize", "32",
        "--min_box_size", "4",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "2",
        "--save_epoch_freq", "1", "--save_latest_freq", "2",
        "--no_vgg_loss",
    ]
    box2mask_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "b2m")
    assert os.path.exists(os.path.join(ckdir, "opt.txt"))
    assert os.path.exists(os.path.join(ckdir, "loss_log.txt"))
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))
    assert os.path.isdir(os.path.join(ckdir, "web"))

    test_flags = common_flags(dataroot, tmp_path, "b2m") + [
        "--fineSize", "32",
        "--min_box_size", "4",
        "--results_dir", os.path.join(str(tmp_path), "results"),
        "--how_many", "2",
    ]
    box2mask_test.main(test_flags)
    out = os.path.join(str(tmp_path), "results", "b2m", "test_latest", "index.html")
    assert os.path.exists(out)


def test_mask2image_train_and_test_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import (
        mask2image_test,
        mask2image_train,
    )

    flags = common_flags(dataroot, tmp_path, "m2i") + [
        "--fineSize", "64",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "2",
        "--save_epoch_freq", "1", "--save_latest_freq", "2",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "m2i")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))

    test_flags = common_flags(dataroot, tmp_path, "m2i") + [
        "--fineSize", "64",
        "--results_dir", os.path.join(str(tmp_path), "results"),
        "--how_many", "2",
    ]
    mask2image_test.main(test_flags)
    out = os.path.join(str(tmp_path), "results", "m2i", "test_latest", "index.html")
    assert os.path.exists(out)


def test_local_enhancer_train_cli(dataroot, tmp_path):
    """netG=local coarse-to-fine path with frozen global trunk (C15
    LocalEnhancer + --niter_fix_global) through the real train driver."""
    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    flags = common_flags(dataroot, tmp_path, "le") + [
        "--netG", "local",
        "--fineSize", "64",
        "--n_local_enhancers", "1", "--n_blocks_local", "1",
        "--niter_fix_global", "1",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "1000",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "le")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))


def test_load_pretrain_global_into_local(dataroot, tmp_path):
    """--load_pretrain: a trained GlobalGenerator trunk initializes the
    LocalEnhancer's global scope (coarse-to-fine hand-off)."""
    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    # 1) train the global stage briefly
    gflags = common_flags(dataroot, tmp_path, "pre_g") + [
        "--fineSize", "64", "--niter", "1", "--niter_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "100", "--display_freq", "1000", "--no_vgg_loss",
    ]
    mask2image_train.main(gflags)

    # 2) local stage initialized from it (ngf halves: local ngf = global/2)
    lflags = common_flags(dataroot, tmp_path, "pre_l") + [
        "--netG", "local", "--ngf", "4",
        "--n_local_enhancers", "1", "--n_blocks_local", "1",
        "--fineSize", "64", "--niter", "1", "--niter_decay", "0",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--print_freq", "100", "--display_freq", "1000", "--no_vgg_loss",
        "--load_pretrain", os.path.join(str(tmp_path), "ckpt", "pre_g"),
    ]
    mask2image_train.main(lflags)
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt", "pre_l", "ckpt", "latest"))


def test_mask2image_spatial_shards_cli(dataroot, tmp_path):
    """--spatial_shards N: W-sharded generator inference through the real
    test driver on the virtual CPU mesh (SURVEY §6.7 surface)."""
    import jax as _jax

    if len(_jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    from neurips18_hierchical_image_manipulation_tpu.cli import (
        mask2image_test,
        mask2image_train,
    )

    flags = common_flags(dataroot, tmp_path, "m2i_sp") + [
        "--fineSize", "64",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "4",
        "--save_epoch_freq", "1", "--save_latest_freq", "4",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    test_flags = common_flags(dataroot, tmp_path, "m2i_sp") + [
        "--fineSize", "64",
        "--results_dir", os.path.join(str(tmp_path), "results_sp"),
        "--how_many", "2",
        "--spatial_shards", "2",
    ]
    mask2image_test.main(test_flags)
    out = os.path.join(
        str(tmp_path), "results_sp", "m2i_sp", "test_latest", "index.html"
    )
    assert os.path.exists(out)


def test_mask2image_spatial_shards_local_cli(dataroot, tmp_path):
    """--spatial_shards with netG=local: the 1024p coarse-to-fine model —
    the model spatial sharding exists for — W-sharded through the real
    test driver."""
    import jax as _jax

    if len(_jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh")
    from neurips18_hierchical_image_manipulation_tpu.cli import (
        mask2image_test,
        mask2image_train,
    )

    arch = [
        "--netG", "local", "--n_local_enhancers", "1",
        "--n_blocks_local", "1",
    ]
    flags = common_flags(dataroot, tmp_path, "m2i_sp_loc") + arch + [
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "4",
        "--save_epoch_freq", "1", "--save_latest_freq", "4",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    test_flags = common_flags(dataroot, tmp_path, "m2i_sp_loc") + arch + [
        "--results_dir", os.path.join(str(tmp_path), "results_sp_loc"),
        "--how_many", "1",
        "--spatial_shards", "2",
    ]
    mask2image_test.main(test_flags)
    out = os.path.join(
        str(tmp_path), "results_sp_loc", "m2i_sp_loc", "test_latest", "index.html"
    )
    assert os.path.exists(out)


def test_mask2image_load_features_cli(dataroot, tmp_path):
    """--instance_feat --load_features through the real drivers: precompute
    tool writes {phase}_feat, then training consumes batch['feat'] (the
    pix2pixHD precompute_feature_maps flow, SURVEY §3.3)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import precompute_feature_maps

    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    feat_flags = [
        "--instance_feat", "--feat_num", "3", "--nef", "4",
        "--n_downsample_E", "2",
    ]
    precompute_feature_maps.main(
        common_flags(dataroot, tmp_path, "m2i_feat") + feat_flags
    )
    assert sorted(os.listdir(os.path.join(dataroot, "train_feat"))) == [
        "0.npy", "1.npy",
    ]

    flags = common_flags(dataroot, tmp_path, "m2i_feat") + feat_flags + [
        "--load_features",
        "--no-use_bbox_dataset", "--no-use_masked_image",
        "--fineSize", "64",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "1000",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "m2i_feat")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))


def test_mask2image_fused_resident_cli(dataroot, tmp_path):
    """--device_resident_data through the REAL m2i train driver takes the
    FUSED step path (train/loop.py): sampling+augmentation inlined into
    the donated step, display iterations via step_with_batch. Bbox-crop
    resident loader (the flagship config family)."""
    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    flags = common_flags(dataroot, tmp_path, "m2ifused") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--device_resident_data",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "2",
        "--save_epoch_freq", "1", "--save_latest_freq", "2",
        "--no_vgg_loss",
    ]
    mask2image_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "m2ifused")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))
    log = open(os.path.join(ckdir, "loss_log.txt")).read()
    assert "epoch: 1" in log
    # display iteration went through step_with_batch -> HTML gallery
    assert os.path.exists(os.path.join(ckdir, "web", "index.html"))


def test_mask2image_fused_resident_mesh_cli(dataroot, tmp_path):
    """--device_resident_data + --mesh_devices 2 takes the MESH fused
    branch (train/loop.py -> make_resident_dp_train_step): planes
    replicated over the 2-device mesh, per-device gather inside
    shard_map, zero per-step H2D."""
    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    flags = common_flags(dataroot, tmp_path, "m2ifusedmesh") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--device_resident_data",
        "--mesh_devices", "2", "--batchSize", "2",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "2",
        "--save_epoch_freq", "1", "--save_latest_freq", "2",
        "--no_vgg_loss",
    ]
    # common_flags already sets --batchSize 1; the later value wins only
    # if argparse allows repeats — strip the first occurrence instead
    i = flags.index("--batchSize")
    del flags[i : i + 2]
    mask2image_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "m2ifusedmesh")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))
    log = open(os.path.join(ckdir, "loss_log.txt")).read()
    assert "epoch: 1" in log


def test_box2mask_fused_resident_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import box2mask_train

    flags = common_flags(dataroot, tmp_path, "b2mfused") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--device_resident_data",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "2",
        "--save_epoch_freq", "1", "--save_latest_freq", "2",
        "--no_vgg_loss",
    ]
    box2mask_train.main(flags)
    ckdir = os.path.join(str(tmp_path), "ckpt", "b2mfused")
    assert os.path.isdir(os.path.join(ckdir, "ckpt", "latest"))


def test_conv_precision_follows_config():
    """--conv_precision auto (round 4): --dtype bfloat16 engages the perf
    tier (Precision.DEFAULT — the packed-stem / phasepack / encode-kernel
    / IN-custom-VJP gates key off it), fp32 keeps the bit-parity tier.
    Before this, the CLI drivers never set precision and real bf16
    training ran the parity tier (reports/dynamics_r03's 79.2 img/s vs
    bench.py's 93.4)."""
    import jax

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    prev = nnops.get_default_precision()
    try:
        create_model(MaskToImageTrainOptions(name="pa", dtype="bfloat16"))
        assert nnops.get_default_precision() == jax.lax.Precision.DEFAULT
        create_model(MaskToImageTrainOptions(name="pb"))
        assert nnops.get_default_precision() == jax.lax.Precision.HIGHEST
        # explicit override beats auto
        create_model(
            MaskToImageTrainOptions(
                name="pc", dtype="bfloat16", conv_precision="highest"
            )
        )
        assert nnops.get_default_precision() == jax.lax.Precision.HIGHEST
        create_model(MaskToImageTrainOptions(name="pd", conv_precision="default"))
        assert nnops.get_default_precision() == jax.lax.Precision.DEFAULT
        with pytest.raises(ValueError):
            create_model(MaskToImageTrainOptions(name="pe", conv_precision="bogus"))
    finally:
        nnops.set_default_precision(prev)


def test_cli_enables_persistent_compile_cache(tmp_path, monkeypatch):
    """parse_cli wires the persistent XLA compile cache (round 4): real
    CLI runs previously re-paid the full 8-18 min tunnel compile every
    time because only bench/tools set jax_compilation_cache_dir."""
    import jax

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTestOptions,
        parse_cli,
    )

    cache_dir = str(tmp_path / "jcache")
    monkeypatch.setenv("HIMAN_JAX_CACHE_DIR", cache_dir)
    parse_cli(
        MaskToImageTestOptions,
        ["--name", "cc", "--checkpoints_dir", str(tmp_path / "ck")],
    )
    assert jax.config.jax_compilation_cache_dir == cache_dir
    assert os.path.isdir(cache_dir)
