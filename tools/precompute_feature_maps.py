"""Precompute per-image encoder feature maps (the reference's
precompute_feature_maps.py flow, SURVEY.md §3.3 --load_features).

Runs the trained instance-feature Encoder (C15) over every sample of
``{dataroot}/{phase}_label|_inst|_img`` at NATIVE resolution (no
augmentation — the train-time transform is applied to the loaded map by
AlignedDataset, exactly like the label plane) and saves one float32
``.npy`` per image into ``{dataroot}/{phase}_feat/{label_basename}.npy``.

Divergence from the reference, documented: the reference saves feature
maps as PNGs (a lossy uint8 round-trip); we save exact float arrays.

Usage:
  python tools/precompute_feature_maps.py --name exp --dataroot d \
      --instance_feat --which_epoch latest [--phase train]
Then train with ``--instance_feat --load_features``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    import jax
    import numpy as np

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTestOptions,
        parse_cli,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.cityscapes import (
        AlignedDataset,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.transforms import (
        normalize_rgb,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.utils.checkpoint import (
        CheckpointManager,
    )

    opt = parse_cli(MaskToImageTestOptions, argv)
    # feature maps are consumed at TRAIN time (--load_features), so the
    # useful default split is train — TestOptions' phase=test default only
    # applies when --phase is given explicitly. Detect "explicitly" with a
    # sentinel-default argparse probe (honors prefix abbreviations like
    # `--phas test`, which a raw argv string scan would miss).
    import argparse

    eff_argv = argv if argv is not None else sys.argv[1:]
    probe = argparse.ArgumentParser(add_help=False)
    probe.add_argument("--phase", default=None)
    probe_ns, _ = probe.parse_known_args(eff_argv)
    if probe_ns.phase is None:
        opt.phase = "train"
    assert getattr(opt, "instance_feat", False) or getattr(opt, "label_feat", False), (
        "precompute_feature_maps needs --instance_feat or --label_feat "
        "(the model has no Encoder otherwise)"
    )
    # native-resolution, un-augmented pass: the saved map must be a pure
    # function of the image so the train-time transform can re-augment it
    opt.resize_or_crop = "none"
    opt.no_flip = True
    opt.serial_batches = True
    opt.isTrain = False
    opt.load_features = False  # we are producing them
    opt.uint8_transfer = False

    model = create_model(opt)
    ds = AlignedDataset(opt)
    assert ds.image_paths is not None, f"no {opt.phase}_img dir under {opt.dataroot}"

    sample0 = ds[0]
    batch0 = {k: np.asarray(v)[None] for k, v in sample0.items() if k != "path"}
    if getattr(opt, "use_masked_image", False) and "boxes" not in batch0:
        # aligned samples carry no boxes; init with a degenerate zero box so
        # netG keeps the masked-RGB conditioning channels (param shapes must
        # match the training checkpoint) — only netE is applied afterwards
        batch0["boxes"] = np.zeros((1, 4), np.int32)
    params = jax.jit(lambda r: model.init_params(r, batch0))(
        jax.random.PRNGKey(opt.seed)
    )
    params.pop("VGG", None)
    ckpt = CheckpointManager(opt)
    if ckpt.has_params(opt.which_epoch):
        params = ckpt.restore_params(opt.which_epoch, params)
        print(f"restored checkpoint '{opt.which_epoch}'")
    else:
        print("WARNING: no checkpoint found — encoding with random init")

    use_inst = bool(getattr(opt, "instance_feat", False))
    enc = jax.jit(lambda img, seg: model.netE.apply(params["E"], img, seg))

    out_dir = os.path.join(opt.dataroot, f"{opt.phase}_feat")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i in range(len(ds)):
        s = ds[i]
        img = s["image"]
        if img.dtype == np.uint8:
            img = normalize_rgb(img)
        seg = s["inst"] if use_inst else s["label"]
        feat = np.asarray(
            enc(img[None].astype(np.float32), np.asarray(seg)[None].astype(np.int32))
        )[0].astype(np.float32)
        stem = os.path.splitext(os.path.basename(s["path"]))[0]
        np.save(os.path.join(out_dir, stem + ".npy"), feat)
        n += 1
    print(f"wrote {n} feature maps ({feat.shape}) to {out_dir}")


if __name__ == "__main__":
    main()
