"""Turnkey parity runbook driver (SURVEY.md §8 M6; VERDICT r2 next#7).

ONE command that — given reference weights dropped in a directory —
converts them, evaluates FID + layout mIoU, and writes a parity report:

  python tools/parity_report.py \
      --weights_dir /path/to/weights --dataroot /path/to/cityscapes \
      --out parity_report.json \
      [--b2m_name run --b2m_checkpoints_dir ckpts]   # layout mIoU stage

Expected weight files (reference formats, SURVEY.md C12):
  {weights_dir}/latest_net_G.pth   pix2pixHD mask2image generator
                                   state_dict (``model.{i}.weight`` keys)
  {weights_dir}/vgg19.pth          torchvision VGG19 (``features.{i}.*``)
                                   — drives BOTH the FID feature
                                   extractor and perceptual-loss parity

Layout mIoU evaluates a structure-generator checkpoint trained by THIS
framework (--b2m_name/--b2m_checkpoints_dir): the reference's box2mask
checkpoint layout is an [R]-tier reconstruction (SURVEY §0), so no .pth
converter is offered for it — train with cli/box2mask_train and point
this tool at the run.

Dry run (zero-egress env has no real weights): ``--make_standins`` first
writes RANDOM-weight .pth files in the exact reference formats, so the
entire convert -> load -> render -> FID chain is exercised end-to-end and
only the *numbers* await real weights (tests/test_parity_runbook.py runs
this in CI).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from convert_torch_checkpoint import convert_global_generator  # noqa: E402
from load_vgg_weights import (  # noqa: E402
    TORCHVISION_CONV_INDICES,
    convert_vgg19_state_dict,
)

# VGG19 conv (in, out) channels per (block, conv) — torchvision order
_VGG19_CHANNELS = {
    (1, 1): (3, 64), (1, 2): (64, 64),
    (2, 1): (64, 128), (2, 2): (128, 128),
    (3, 1): (128, 256), (3, 2): (256, 256), (3, 3): (256, 256), (3, 4): (256, 256),
    (4, 1): (256, 512), (4, 2): (512, 512), (4, 3): (512, 512), (4, 4): (512, 512),
    (5, 1): (512, 512), (5, 2): (512, 512), (5, 3): (512, 512), (5, 4): (512, 512),
}


def make_standins(weights_dir: str, input_nc: int, ngf: int, n_down: int,
                  n_blocks: int, seed: int = 0) -> None:
    """Write random-weight .pth stand-ins in the reference formats."""
    import torch

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from torch_oracle import GlobalGeneratorT  # the reference-format module

    os.makedirs(weights_dir, exist_ok=True)
    torch.manual_seed(seed)
    g = GlobalGeneratorT(input_nc, 3, ngf=ngf, n_down=n_down, n_blocks=n_blocks)
    torch.save(g.state_dict(), os.path.join(weights_dir, "latest_net_G.pth"))

    rng = np.random.RandomState(seed)
    vgg_sd = {}
    for (b, c), idx in TORCHVISION_CONV_INDICES.items():
        ci, co = _VGG19_CHANNELS[(b, c)]
        vgg_sd[f"features.{idx}.weight"] = torch.from_numpy(
            (rng.randn(co, ci, 3, 3) * 0.05).astype(np.float32)
        )
        vgg_sd[f"features.{idx}.bias"] = torch.zeros(co)
    torch.save(vgg_sd, os.path.join(weights_dir, "vgg19.pth"))
    print(f"stand-ins written to {weights_dir}")


def _strip_net_prefix(flat):
    return {k.split("/", 1)[1]: v for k, v in flat.items()}


def _load_into(template, flat_noprefix):
    import jax
    import jax.numpy as jnp

    leaves, _ = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for keypath, leaf in leaves:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        arr = flat_noprefix[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        out.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out
    )


def run_report(args) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTestOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.loader import (
        CreateDataLoader,
    )
    from neurips18_hierchical_image_manipulation_tpu.eval.metrics import (
        FIDEvaluator,
        vgg_pool_features,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.networks import (
        Vgg19Features,
    )

    report = {"weights_dir": args.weights_dir, "stages": {}}

    # ---- 1. convert the reference mask2image generator ----
    g_pth = os.path.join(args.weights_dir, "latest_net_G.pth")
    sd = torch.load(g_pth, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    g_flat = _strip_net_prefix(
        convert_global_generator(sd, n_down=args.n_down, n_blocks=args.n_blocks)
    )
    report["stages"]["convert_G"] = {"pth": g_pth, "arrays": len(g_flat)}

    # ---- 2. convert VGG19 (FID features) ----
    vgg_pth = os.path.join(args.weights_dir, "vgg19.pth")
    vgg_flat = None
    if os.path.exists(vgg_pth):
        vsd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
        vsd = {k: np.asarray(v) for k, v in vsd.items()}
        vgg_flat = _strip_net_prefix(convert_vgg19_state_dict(vsd))
        report["stages"]["convert_VGG"] = {"pth": vgg_pth, "arrays": len(vgg_flat)}
    else:
        report["stages"]["convert_VGG"] = {
            "pth": None,
            "note": "vgg19.pth absent - FID uses random-init VGG features "
            "(NOT paper-comparable)",
        }

    # ---- 3. render the test split with the converted G; FID ----
    opt = MaskToImageTestOptions(
        name="parity_m2i",
        checkpoints_dir=os.path.join(args.weights_dir, ".parity_ckpt"),
        dataroot=args.dataroot,
        label_nc=args.label_nc,
        ngf=args.ngf,
        n_downsample_global=args.n_down,
        n_blocks_global=args.n_blocks,
        fineSize=args.fineSize,
        loadSize=args.loadSize,
        resize_or_crop=args.resize_or_crop,
        phase=args.phase,
        no_instance=args.no_instance,
        # A label2city pix2pixHD checkpoint has NO masked-RGB conditioning
        # channels; --use_masked_image opts into the hierarchical-editing
        # variant (stand-ins then carry the +3 input channels too).
        use_masked_image=args.use_masked_image,
    )
    model = create_model(opt)
    loader = CreateDataLoader(opt)

    fwd = jax.jit(lambda p, b: model.inference(p, b))
    vgg = Vgg19Features()
    params = fid_eval = None
    n = 0
    for host_batch in loader:
        batch = {
            k: jnp.asarray(v)
            for k, v in host_batch.items()
            if not isinstance(v, list)
        }
        if params is None:
            params = model.init_params(jax.random.PRNGKey(0), batch)
            params["G"] = _load_into(params["G"], g_flat)
            vgg_params = vgg.init(jax.random.PRNGKey(1), batch["image"][:1])
            if vgg_flat is not None:
                vgg_params = _load_into(vgg_params, vgg_flat)
            fid_eval = FIDEvaluator(vgg_pool_features(vgg, vgg_params), 512)
        fake = fwd(params, batch)
        fid_eval.update(real_images=batch["image"], fake_images=fake)
        n += int(fake.shape[0])
        if n >= args.how_many:
            break
    report["stages"]["fid"] = {
        "value": float(fid_eval.compute()),
        "samples": n,
        "features": "vgg19-pretrained" if vgg_flat is not None else "vgg19-random",
    }

    # ---- 4. structure generator layout mIoU (our checkpoint format) ----
    if args.b2m_name:
        from neurips18_hierchical_image_manipulation_tpu.cli.evaluate import (
            eval_box2mask,
        )

        argv = [
            "--name", args.b2m_name,
            "--checkpoints_dir", args.b2m_checkpoints_dir,
            "--dataroot", args.dataroot,
            "--phase", args.phase,
            "--how_many", str(args.how_many),
        ] + (args.b2m_args.split() if args.b2m_args else [])
        report["stages"]["layout_miou"] = eval_box2mask(argv)
    else:
        report["stages"]["layout_miou"] = {
            "note": "no --b2m_name given - train cli/box2mask_train and "
            "pass the run name for the mIoU stage"
        }

    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights_dir", required=True)
    p.add_argument("--dataroot", required=True)
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--label_nc", type=int, default=35)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--n_down", type=int, default=4)
    p.add_argument("--n_blocks", type=int, default=9)
    p.add_argument("--fineSize", type=int, default=512)
    p.add_argument("--loadSize", type=int, default=1024)
    p.add_argument("--resize_or_crop", default="scale_width")
    p.add_argument("--phase", default="test")
    p.add_argument("--no_instance", action="store_true")
    p.add_argument("--use_masked_image", action="store_true")
    p.add_argument("--how_many", type=int, default=500)
    p.add_argument("--b2m_name", default="")
    p.add_argument("--b2m_checkpoints_dir", default="./checkpoints")
    p.add_argument("--b2m_args", default="")
    p.add_argument("--make_standins", action="store_true")
    args = p.parse_args(argv)

    if args.make_standins:
        # the stand-in G must match the arch flags AND the model's input
        # channels: label_nc one-hot + 1 instance-edge channel, +3 masked
        # RGB only under --use_masked_image
        input_nc = (
            args.label_nc
            + (0 if args.no_instance else 1)
            + (3 if args.use_masked_image else 0)
        )
        make_standins(args.weights_dir, input_nc, args.ngf, args.n_down,
                      args.n_blocks)

    report = run_report(args)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
