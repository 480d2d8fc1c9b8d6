"""Resume (--continue_train) semantics + evaluation CLI smoke tests."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from test_cli import common_flags, dataroot  # noqa: F401  (fixture reuse)


def test_continue_train_resumes(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import box2mask_train

    flags = common_flags(dataroot, tmp_path, "resume") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "100", "--display_freq", "1000",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--no_vgg_loss",
    ]
    box2mask_train.main(flags)
    iter_file = os.path.join(str(tmp_path), "ckpt", "resume", "iter.txt")
    assert os.path.exists(iter_file)
    first = open(iter_file).read()

    # resume for one more epoch from 'latest'
    flags2 = [f for f in flags]
    flags2[flags2.index("--niter") + 1] = "2"
    box2mask_train.main(flags2 + ["--continue_train"])
    second = open(iter_file).read()
    assert first != second  # bookkeeping advanced


def test_evaluate_box2mask_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import evaluate

    flags = common_flags(dataroot, tmp_path, "ev") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--phase", "test", "--how_many", "2",
    ]
    res = evaluate.main(["--stage", "box2mask"] + flags)
    assert 0.0 <= res["value"] <= 1.0
    assert res["samples"] >= 1


def test_evaluate_mask2image_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import evaluate

    flags = common_flags(dataroot, tmp_path, "ev2") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--phase", "test", "--how_many", "2",
    ]
    res = evaluate.main(["--stage", "mask2image"] + flags)
    assert np.isfinite(res["value"])


def test_two_step_demo_cli(dataroot, tmp_path):
    from neurips18_hierchical_image_manipulation_tpu.cli import two_step_demo

    two_step_demo.main([
        "--name", "demo",
        "--b2m_name", "b2m_demo", "--m2i_name", "m2i_demo",
        "--checkpoints_dir", os.path.join(str(tmp_path), "ckpt"),
        "--results_dir", os.path.join(str(tmp_path), "results"),
        "--dataroot", dataroot,
        "--edit", "add", "--cls", "6",
        "--label_nc", "8",
        "--fineSize_b2m", "32", "--fineSize_m2i", "32",
        "--loadSize", "64", "--how_many", "1",
    ])
    out = os.path.join(str(tmp_path), "results", "demo", "index.html")
    assert os.path.exists(out)


def test_mid_epoch_resume_skips_seen_batches(dataroot, tmp_path):
    """iter.txt's (epoch, iter) must fast-forward the resumed epoch:
    pre-fix the saved iter was ignored and the whole epoch replayed,
    desyncing the optax step count from the epoch bookkeeping."""
    import re

    from neurips18_hierchical_image_manipulation_tpu.cli import box2mask_train

    flags = common_flags(dataroot, tmp_path, "midresume") + [
        "--fineSize", "32", "--min_box_size", "4",
        "--niter", "1", "--niter_decay", "0",
        "--print_freq", "1", "--display_freq", "1000",
        "--save_epoch_freq", "1", "--save_latest_freq", "1000",
        "--no_vgg_loss", "--batchSize", "1", "--serial_batches",
    ]
    box2mask_train.main(flags)
    run_dir = os.path.join(str(tmp_path), "ckpt", "midresume")
    log1 = open(os.path.join(run_dir, "loss_log.txt")).read()
    n_total = len(re.findall(r"\(epoch: 1,", log1))
    assert n_total >= 2  # enough batches to make skipping observable

    # pretend we stopped mid-epoch after 1 iter of epoch 1
    with open(os.path.join(run_dir, "iter.txt"), "w") as f:
        f.write("1,1")
    box2mask_train.main(flags + ["--continue_train"])
    log2 = open(os.path.join(run_dir, "loss_log.txt")).read()
    n_after = len(re.findall(r"\(epoch: 1,", log2)) - n_total
    # resumed epoch 1 ran only the unseen tail (total - 1 skipped)
    assert n_after == n_total - 1
