"""Convert reference PyTorch checkpoints -> himan flat-npz params.

The reference saves per-net state_dicts as
``{ckpt_dir}/{name}/{epoch}_net_{G|D|E}.pth`` (SURVEY.md C12). Its modules
are nn.Sequential stacks whose construction order is fixed by the §3.2
spec, so state_dict keys are positional: ``model.{i}.weight`` for the
generator, ``model.{i}.conv_block.{j}.weight`` inside resblocks,
``scale/layer{n}`` for the multiscale discriminator.

This tool maps those onto our flax param tree (models/networks.py) and
writes the npz sidecar format consumed by
``CheckpointManager.restore_params`` / ``load_params_npz``:

  G (GlobalGenerator):  conv_in, down{i}, res{i}/conv{1,2}, up{i}, conv_out
  D (Multiscale):       scale{i}/layer{n}

Conv weights: torch OIHW -> HWIO; transposed-conv: torch IOHW -> HWIO
(our conv_transpose2d flips spatially at call time, so NO flip here).

Usage:
  python tools/convert_torch_checkpoint.py --net G \
      --pth latest_net_G.pth --out g_params.npz \
      --input_nc 39 --output_nc 3 --ngf 64 --n_down 4 --n_blocks 9
"""

from __future__ import annotations

import argparse

import numpy as np


def conv_w(sd, key):
    return np.ascontiguousarray(
        np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    )


def convT_w(sd, key):
    return np.ascontiguousarray(
        np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 0, 1)
    )


def bias(sd, key):
    return np.asarray(sd[f"{key}.bias"])


def global_generator_index_map(n_down: int, n_blocks: int):
    """Sequential indices of param-bearing layers in pix2pixHD's
    GlobalGenerator Sequential: [pad, conv7, IN, ReLU] + n_down x [conv,
    IN, ReLU] + n_blocks x [ResnetBlock] + n_down x [convT, IN, ReLU] +
    [pad, conv7, tanh]."""
    idx = {}
    i = 1
    idx["conv_in"] = i
    i = 4
    for d in range(n_down):
        idx[f"down{d}"] = i
        i += 3
    for r in range(n_blocks):
        idx[f"res{r}"] = i
        i += 1
    for u in range(n_down):
        idx[f"up{u}"] = i
        i += 3
    idx["conv_out"] = i + 1  # +1 skips the ReflectionPad
    return idx


def convert_global_generator(sd, n_down=4, n_blocks=9, prefix="model"):
    """torch state_dict -> flat {key: array} in our npz naming
    (G/params/<name>/kernel etc. — the pytree path layout of
    Pix2PixHDModel params['G'])."""
    flat = {}
    idx = global_generator_index_map(n_down, n_blocks)

    def put(name, kernel, b):
        flat[f"G/params/{name}/kernel"] = kernel
        flat[f"G/params/{name}/bias"] = b

    put("conv_in", conv_w(sd, f"{prefix}.{idx['conv_in']}"), bias(sd, f"{prefix}.{idx['conv_in']}"))
    for d in range(n_down):
        k = f"{prefix}.{idx[f'down{d}']}"
        put(f"down{d}", conv_w(sd, k), bias(sd, k))
    for r in range(n_blocks):
        base = f"{prefix}.{idx[f'res{r}']}"
        # pix2pixHD names the inner Sequential 'conv_block'; our oracle
        # uses 'block' — accept both
        inner = "conv_block" if f"{base}.conv_block.1.weight" in sd else "block"
        put(f"res{r}/conv1", conv_w(sd, f"{base}.{inner}.1"), bias(sd, f"{base}.{inner}.1"))
        put(f"res{r}/conv2", conv_w(sd, f"{base}.{inner}.5"), bias(sd, f"{base}.{inner}.5"))
    for u in range(n_down):
        k = f"{prefix}.{idx[f'up{u}']}"
        put(f"up{u}", convT_w(sd, k), bias(sd, k))
    k = f"{prefix}.{idx['conv_out']}"
    put("conv_out", conv_w(sd, k), bias(sd, k))
    return flat


def convert_multiscale_discriminator(sd, num_D=2, n_layers=3):
    """pix2pixHD MultiscaleDiscriminator with getIntermFeat registers
    'scale{i}_layer{n}' (or layer{i}.model{n}) submodules; map either onto
    our scale{i}/layer{n}. NOTE scale index order: pix2pixHD stores
    coarsest at attribute 0 and runs FINEST first in forward — our
    scale0 is the finest, matching its forward order."""
    flat = {}
    n_params_layers = n_layers + 2
    for i in range(num_D):
        # reference attribute index for our forward-order scale i:
        ref_i = num_D - 1 - i
        for n in range(n_params_layers):
            candidates = [
                f"scale{ref_i}_layer{n}.0",
                f"layer{ref_i}.model{n}.0",
                f"discriminator_{ref_i}.model{n}.0",
            ]
            key = next((c for c in candidates if f"{c}.weight" in sd), None)
            if key is None:
                raise KeyError(
                    f"no discriminator key for scale {ref_i} layer {n}; "
                    f"tried {candidates}"
                )
            flat[f"D/params/scale{i}/layer{n}/kernel"] = conv_w(sd, key)
            flat[f"D/params/scale{i}/layer{n}/bias"] = bias(sd, key)
    return flat


def main():
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--net", choices=["G", "D"], required=True)
    p.add_argument("--n_down", type=int, default=4)
    p.add_argument("--n_blocks", type=int, default=9)
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--n_layers_D", type=int, default=3)
    args = p.parse_args()

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    if args.net == "G":
        flat = convert_global_generator(sd, args.n_down, args.n_blocks)
    else:
        flat = convert_multiscale_discriminator(sd, args.num_D, args.n_layers_D)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
