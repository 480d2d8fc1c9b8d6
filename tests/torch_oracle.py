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


def BN(ch):
    """--norm batch: BatchNorm2d(affine=True). track_running_stats=False so
    the oracle always normalizes by batch statistics — identical to the
    reference's observable behavior (pix2pixHD never calls .eval(), so its
    modules run in train mode everywhere and use batch stats)."""
    return nn.BatchNorm2d(ch, affine=True, eps=1e-5, track_running_stats=False)


class ResnetBlockT(nn.Module):
    def __init__(self, dim, norm=IN):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), norm(dim), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), norm(dim),
        )

    def forward(self, x):
        return x + self.block(x)


class GlobalGeneratorT(nn.Module):
    def __init__(self, input_nc, output_nc, ngf=64, n_down=4, n_blocks=9, norm=IN):
        super().__init__()
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7), norm(ngf), nn.ReLU(True)]
        for i in range(n_down):
            cin, cout = ngf * 2**i, ngf * 2 ** (i + 1)
            layers += [nn.Conv2d(cin, cout, 3, stride=2, padding=1), norm(cout), nn.ReLU(True)]
        for _ in range(n_blocks):
            layers += [ResnetBlockT(ngf * 2**n_down, norm)]
        for i in range(n_down):
            cin = ngf * 2 ** (n_down - i)
            cout = cin // 2
            layers += [
                nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1, output_padding=1),
                norm(cout), nn.ReLU(True),
            ]
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class NLayerDiscriminatorT(nn.Module):
    def __init__(self, input_nc, ndf=64, n_layers=3, norm=IN):
        super().__init__()
        padw = 2
        self.stages = nn.ModuleList()
        self.stages.append(nn.Sequential(
            nn.Conv2d(input_nc, ndf, 4, stride=2, padding=padw), nn.LeakyReLU(0.2, True)))
        nf = ndf
        for _ in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            self.stages.append(nn.Sequential(
                nn.Conv2d(nf_prev, nf, 4, stride=2, padding=padw), norm(nf), nn.LeakyReLU(0.2, True)))
        nf_prev, nf = nf, min(nf * 2, 512)
        self.stages.append(nn.Sequential(
            nn.Conv2d(nf_prev, nf, 4, stride=1, padding=padw), norm(nf), nn.LeakyReLU(0.2, True)))
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


def torch_bn_to_flax(bn: nn.BatchNorm2d):
    return {
        "scale": bn.weight.detach().numpy(),
        "bias": bn.bias.detach().numpy(),
    }


def _maybe_bn(params, name, layer):
    if isinstance(layer, nn.BatchNorm2d):
        params[name] = torch_bn_to_flax(layer)


def global_generator_params(t: GlobalGeneratorT, n_down=4, n_blocks=9):
    """Map GlobalGeneratorT weights onto the flax GlobalGenerator pytree
    (batch-norm gamma/beta included when the oracle was built with BN)."""
    seq = list(t.model)
    params = {}
    i = 1  # after ReflectionPad
    params["conv_in"] = torch_conv_to_flax(seq[i])
    _maybe_bn(params, "norm_in", seq[i + 1]); i += 3
    for d in range(n_down):
        params[f"down{d}"] = torch_conv_to_flax(seq[i])
        _maybe_bn(params, f"norm_down{d}", seq[i + 1]); i += 3
    for r in range(n_blocks):
        blk = seq[i]; i += 1
        params[f"res{r}"] = {
            "conv1": torch_conv_to_flax(blk.block[1]),
            "conv2": torch_conv_to_flax(blk.block[5]),
        }
        _maybe_bn(params[f"res{r}"], "norm1", blk.block[2])
        _maybe_bn(params[f"res{r}"], "norm2", blk.block[6])
    for u in range(n_down):
        params[f"up{u}"] = torch_convT_to_flax(seq[i])
        _maybe_bn(params, f"norm_up{u}", seq[i + 1]); i += 3
    i += 1  # ReflectionPad
    params["conv_out"] = torch_conv_to_flax(seq[i])
    return {"params": params}


def nlayer_discriminator_params(t: NLayerDiscriminatorT):
    params = {}
    for n, stage in enumerate(t.stages):
        params[f"layer{n}"] = torch_conv_to_flax(stage[0])
        if len(stage) > 1:
            _maybe_bn(params, f"norm{n}", stage[1])
    return params


class LocalEnhancerT(nn.Module):
    """pix2pixHD LocalEnhancer oracle (1 enhancer): global trunk minus its
    head at 1/2 res, local branch downsamples, SUMS trunk output into its
    bottleneck, refines with resblocks, upsamples, then the c7s1 head."""

    def __init__(self, input_nc, output_nc, ngf=32, n_down_global=4,
                 n_blocks_global=9, n_blocks_local=3):
        super().__init__()
        ngf_g = ngf * 2
        trunk = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf_g, 7), IN(ngf_g), nn.ReLU(True)]
        for i in range(n_down_global):
            cin, cout = ngf_g * 2**i, ngf_g * 2 ** (i + 1)
            trunk += [nn.Conv2d(cin, cout, 3, stride=2, padding=1), IN(cout), nn.ReLU(True)]
        for _ in range(n_blocks_global):
            trunk += [ResnetBlockT(ngf_g * 2**n_down_global)]
        for i in range(n_down_global):
            cin = ngf_g * 2 ** (n_down_global - i)
            trunk += [
                nn.ConvTranspose2d(cin, cin // 2, 3, stride=2, padding=1, output_padding=1),
                IN(cin // 2), nn.ReLU(True),
            ]
        self.global_trunk = nn.Sequential(*trunk)
        self.downsample = nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
        self.local_in = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7), IN(ngf), nn.ReLU(True),
            nn.Conv2d(ngf, ngf * 2, 3, stride=2, padding=1), IN(ngf * 2), nn.ReLU(True),
        )
        refine = [ResnetBlockT(ngf * 2) for _ in range(n_blocks_local)]
        refine += [
            nn.ConvTranspose2d(ngf * 2, ngf, 3, stride=2, padding=1, output_padding=1),
            IN(ngf), nn.ReLU(True),
        ]
        self.local_refine = nn.Sequential(*refine)
        self.head = nn.Sequential(
            nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()
        )

    def forward(self, x):
        out = self.global_trunk(self.downsample(x))
        h = self.local_in(x) + out
        return self.head(self.local_refine(h))


def local_enhancer_params(t: LocalEnhancerT, n_down_global, n_blocks_global,
                          n_blocks_local):
    seq = list(t.global_trunk)
    g = {}
    i = 1
    g["conv_in"] = torch_conv_to_flax(seq[i]); i += 3
    for d in range(n_down_global):
        g[f"down{d}"] = torch_conv_to_flax(seq[i]); i += 3
    for r in range(n_blocks_global):
        blk = seq[i]; i += 1
        g[f"res{r}"] = {
            "conv1": torch_conv_to_flax(blk.block[1]),
            "conv2": torch_conv_to_flax(blk.block[5]),
        }
    for u in range(n_down_global):
        g[f"up{u}"] = torch_convT_to_flax(seq[i]); i += 3
    params = {"global": g}
    params["local1_conv_in"] = torch_conv_to_flax(t.local_in[1])
    params["local1_down"] = torch_conv_to_flax(t.local_in[4])
    for r in range(n_blocks_local):
        blk = t.local_refine[r]
        params[f"local1_res{r}"] = {
            "conv1": torch_conv_to_flax(blk.block[1]),
            "conv2": torch_conv_to_flax(blk.block[5]),
        }
    params["local1_up"] = torch_convT_to_flax(t.local_refine[n_blocks_local])
    params["conv_out"] = torch_conv_to_flax(t.head[1])
    return {"params": params}


class EncoderT(nn.Module):
    """pix2pixHD instance-feature Encoder oracle: conv enc-dec to feat_num
    maps + instance-wise average pooling over the inst map."""

    def __init__(self, input_nc=3, feat_num=3, nef=16, n_down=4):
        super().__init__()
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, nef, 7), IN(nef), nn.ReLU(True)]
        for i in range(n_down):
            cin, cout = nef * 2**i, nef * 2 ** (i + 1)
            layers += [nn.Conv2d(cin, cout, 3, stride=2, padding=1), IN(cout), nn.ReLU(True)]
        for i in range(n_down):
            cin = nef * 2 ** (n_down - i)
            layers += [
                nn.ConvTranspose2d(cin, cin // 2, 3, stride=2, padding=1, output_padding=1),
                IN(cin // 2), nn.ReLU(True),
            ]
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(nef, feat_num, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, img, inst):
        out = self.model(img)
        pooled = out.clone()
        for b in range(img.size(0)):
            for i in inst[b].unique():
                mask = inst[b] == i  # (H,W)
                for c in range(out.size(1)):
                    pooled[b, c][mask] = out[b, c][mask].mean()
        return pooled


def encoder_params(t: EncoderT, n_down=4):
    seq = list(t.model)
    params = {}
    i = 1
    params["conv_in"] = torch_conv_to_flax(seq[i]); i += 3
    for d in range(n_down):
        params[f"down{d}"] = torch_conv_to_flax(seq[i]); i += 3
    for u in range(n_down):
        params[f"up{u}"] = torch_convT_to_flax(seq[i]); i += 3
    i += 1
    params["conv_out"] = torch_conv_to_flax(seq[i])
    return {"params": params}
