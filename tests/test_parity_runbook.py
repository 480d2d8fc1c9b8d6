"""Parity runbook dry run (SURVEY §8 M6; VERDICT r2 next#7): the ONE
documented command chain — convert .pth -> load -> render -> FID (+ mIoU
stage wiring) -> JSON report — runs end-to-end with random-weight
stand-ins, so only the real weights are missing in this zero-egress env.
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture
def dataroot(tmp_path):
    root = tmp_path / "city"
    for sub in ("test_label", "test_inst", "test_img"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        h, w = 32, 64
        label = rng.randint(0, 8, (h, w)).astype(np.uint8)
        inst = (label.astype(np.int64) * 1000).astype(np.int32)
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(label).save(root / "test_label" / f"{i}.png")
        Image.fromarray(inst, mode="I").save(root / "test_inst" / f"{i}.png")
        Image.fromarray(img).save(root / "test_img" / f"{i}.png")
    return str(root)


def test_parity_report_dry_run(dataroot, tmp_path):
    import parity_report

    weights_dir = str(tmp_path / "weights")
    out = str(tmp_path / "report.json")
    report = parity_report.main([
        "--weights_dir", weights_dir,
        "--dataroot", dataroot,
        "--out", out,
        "--label_nc", "8",
        "--ngf", "8",
        "--n_down", "2",
        "--n_blocks", "2",
        "--fineSize", "32",
        "--loadSize", "64",
        "--resize_or_crop", "none",
        "--how_many", "3",
        "--make_standins",
    ])

    # stand-ins were created in the reference formats
    assert os.path.exists(os.path.join(weights_dir, "latest_net_G.pth"))
    assert os.path.exists(os.path.join(weights_dir, "vgg19.pth"))

    # every stage ran and reported
    assert report["stages"]["convert_G"]["arrays"] > 0
    assert report["stages"]["convert_VGG"]["arrays"] > 0
    fid = report["stages"]["fid"]
    assert fid["samples"] == 3
    assert np.isfinite(fid["value"])
    assert fid["features"] == "vgg19-pretrained"

    # report persisted as JSON
    with open(out) as f:
        persisted = json.load(f)
    assert persisted["stages"]["fid"]["value"] == fid["value"]


def test_parity_report_converted_g_matches_torch(dataroot, tmp_path):
    """The converted stand-in G must produce the SAME image as the torch
    module it came from — the load path is numerics-checked, not just
    shape-checked."""
    import torch

    import jax
    import jax.numpy as jnp

    import parity_report
    from convert_torch_checkpoint import convert_global_generator
    from torch_oracle import GlobalGeneratorT

    from neurips18_hierchical_image_manipulation_tpu.models import networks

    weights_dir = str(tmp_path / "w2")
    parity_report.make_standins(weights_dir, input_nc=9, ngf=8, n_down=2,
                                n_blocks=2, seed=7)
    sd = torch.load(
        os.path.join(weights_dir, "latest_net_G.pth"),
        map_location="cpu",
        weights_only=True,
    )
    t = GlobalGeneratorT(9, 3, ngf=8, n_down=2, n_blocks=2).eval()
    t.load_state_dict(sd)

    flat = parity_report._strip_net_prefix(
        convert_global_generator(
            {k: v.numpy() for k, v in sd.items()}, n_down=2, n_blocks=2
        )
    )
    g = networks.GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    x = np.random.RandomState(0).randn(1, 9, 16, 24).astype(np.float32)
    template = g.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params = parity_report._load_into(template, flat)
    got = np.asarray(g.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=5e-5, rtol=1e-4)
