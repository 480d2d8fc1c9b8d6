"""CPU-torch oracle models built from the SURVEY.md §3.2 behavioral spec.

These are hand-written from the spec (pix2pixHD architecture numbers), NOT
copied from any repo — they exist so the flax networks can be golden-tested
at fp32 (SURVEY.md §5 test pyramid, level M0 of §8).
"""

import functools

import torch
import torch.nn as nn


def IN(ch):
    return nn.InstanceNorm2d(ch, affine=False, eps=1e-5, track_running_stats=False)


class ResnetBlockT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), IN(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), IN(dim),
        )

    def forward(self, x):
        return x + self.block(x)


class GlobalGeneratorT(nn.Module):
    def __init__(self, input_nc, output_nc, ngf=64, n_down=4, n_blocks=9):
        super().__init__()
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7), IN(ngf), nn.ReLU(True)]
        for i in range(n_down):
            cin, cout = ngf * 2**i, ngf * 2 ** (i + 1)
            layers += [nn.Conv2d(cin, cout, 3, stride=2, padding=1), IN(cout), nn.ReLU(True)]
        for _ in range(n_blocks):
            layers += [ResnetBlockT(ngf * 2**n_down)]
        for i in range(n_down):
            cin = ngf * 2 ** (n_down - i)
            cout = cin // 2
            layers += [
                nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1, output_padding=1),
                IN(cout), nn.ReLU(True),
            ]
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class NLayerDiscriminatorT(nn.Module):
    def __init__(self, input_nc, ndf=64, n_layers=3):
        super().__init__()
        padw = 2
        self.stages = nn.ModuleList()
        self.stages.append(nn.Sequential(
            nn.Conv2d(input_nc, ndf, 4, stride=2, padding=padw), nn.LeakyReLU(0.2, True)))
        nf = ndf
        for _ in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            self.stages.append(nn.Sequential(
                nn.Conv2d(nf_prev, nf, 4, stride=2, padding=padw), IN(nf), nn.LeakyReLU(0.2, True)))
        nf_prev, nf = nf, min(nf * 2, 512)
        self.stages.append(nn.Sequential(
            nn.Conv2d(nf_prev, nf, 4, stride=1, padding=padw), IN(nf), nn.LeakyReLU(0.2, True)))
        self.stages.append(nn.Sequential(nn.Conv2d(nf, 1, 4, stride=1, padding=padw)))

    def forward(self, x):
        feats = []
        h = x
        for stage in self.stages:
            h = stage(h)
            feats.append(h)
        return feats


def torch_conv_to_flax(conv: nn.Conv2d):
    return {
        "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),  # OIHW->HWIO
        "bias": conv.bias.detach().numpy(),
    }


def torch_convT_to_flax(conv: nn.ConvTranspose2d):
    return {
        "kernel": conv.weight.detach().numpy().transpose(2, 3, 0, 1),  # IOHW->HWIO
        "bias": conv.bias.detach().numpy(),
    }


def global_generator_params(t: GlobalGeneratorT, n_down=4, n_blocks=9):
    """Map GlobalGeneratorT weights onto the flax GlobalGenerator pytree."""
    seq = list(t.model)
    params = {}
    i = 1  # after ReflectionPad
    params["conv_in"] = torch_conv_to_flax(seq[i]); i += 3
    for d in range(n_down):
        params[f"down{d}"] = torch_conv_to_flax(seq[i]); i += 3
    for r in range(n_blocks):
        blk = seq[i]; i += 1
        params[f"res{r}"] = {
            "conv1": torch_conv_to_flax(blk.block[1]),
            "conv2": torch_conv_to_flax(blk.block[5]),
        }
    for u in range(n_down):
        params[f"up{u}"] = torch_convT_to_flax(seq[i]); i += 3
    i += 1  # ReflectionPad
    params["conv_out"] = torch_conv_to_flax(seq[i])
    return {"params": params}


def nlayer_discriminator_params(t: NLayerDiscriminatorT):
    params = {}
    for n, stage in enumerate(t.stages):
        params[f"layer{n}"] = torch_conv_to_flax(stage[0])
    return params
