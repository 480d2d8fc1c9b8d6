"""Network zoo — flax re-implementations of the reference's nn.Modules.

Reference contract: SURVEY.md §3.2 (pix2pixHD ``models/networks.py`` lineage
[L]; two-stream structure nets from the paper [P §3.2 + suppl.], reference
paths tier [R] since the mount was empty).

All modules are NHWC (TPU lanes = channels). Weight init matches the
reference's ``weights_init``: conv kernels ~ N(0, 0.02); biases are zero
(torch leaves bias at its default uniform init — a deliberate, documented
divergence that only affects fresh-training init noise, not loaded
checkpoints). ``--norm instance`` (the reference default) is
InstanceNorm(affine=False) — parameterless; ``--norm batch`` is
BatchNorm2d(affine=True) with gamma ~ N(1, 0.02), beta = 0, owned by the
named ``NormAct`` submodules (batch statistics always — see
nnops.batch_norm).

Checkpoint converters map torch (out,in,kh,kw) conv weights to our HWIO and
torch (in,out,kh,kw) transposed-conv weights to our HWIO (see
tools/convert_torch_checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops import nnops

conv_init = nn.initializers.normal(stddev=0.02)
zeros_init = nn.initializers.zeros


class Conv(nn.Module):
    """torch.nn.Conv2d twin: explicit symmetric int padding, HWIO kernel.

    The optional second input ``x2`` computes the conv over the channel
    concat (x ⊕ x2) as two partial convs over one kernel —
    ``conv(concat(a,b), W) = conv(a, W[:ca]) + conv(b, W[ca:])`` exactly
    (modulo float add order). The param tree is identical to the concat
    form, so checkpoints are unaffected. Used by the PatchGAN stems so the
    conditioning half of the input (identical across the D(real) /
    D(fake) / D(fake.detach()) applies of one train step) is CSE-shared
    by XLA, and the input-gradient only spans the 3 RGB channels."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    # dead_bias: an InstanceNorm(affine=False) follows, which cancels a
    # per-channel constant shift EXACTLY (it subtracts the per-(N,C)
    # spatial mean), so the bias has zero effect on the output and an
    # exactly-zero gradient. Declaring-but-not-applying it keeps the param
    # tree / checkpoint layout identical while deleting the full-res bias
    # add and its backward reduce (measured ~10 ms/step of reduce_sum at
    # 512x256 bs32 across the conv+IN sites). torch's bias is equally
    # inert there — loaded checkpoint values change nothing either way.
    dead_bias: bool = False
    # packed_s2d2: x is space-to-depth-by-2 packed (N,H/2,W/2,4*Ci); the
    # conv (3x3 s1 SAME only) computes fully in packed coordinates with
    # the SAME (3,3,Ci,Co) kernel param — see nnops.conv2d_s2d_same_packed
    packed_s2d2: bool = False
    # packed_s2d_io: pre-padded packed input, packed VALID output (the
    # packed generator stem conv) — nnops.conv2d_s2d_packed_io
    packed_s2d_io: bool = False
    # packed_s2d_in: packed input, natural unpacked stride-2 output (the
    # packed-region exit, down0) — nnops.conv2d_s2d_stride2_packed_in
    packed_s2d_in: bool = False
    # reflect: ReflectionPad2d(reflect) is FUSED into the conv
    # (nnops.conv2d_reflect: zero-SAME conv + tiny border-strip
    # corrections — no materialized padded copy, no slice/rev/add VJP
    # fold). Requires stride 1, kernel == 2*reflect+1, padding == 0.
    # Identical math to reflect_pad + conv; param tree unchanged.
    reflect: int = 0

    @nn.compact
    def __call__(self, x, x2=None):
        if self.packed_s2d2 or self.packed_s2d_io or self.packed_s2d_in:
            assert x2 is None
            ci = x.shape[-1] // 4
            w = self.param(
                "kernel", conv_init, (self.kernel, self.kernel, ci, self.features)
            )
            b = self.param("bias", zeros_init, (self.features,)) if self.use_bias else None
            if self.dead_bias:
                b = None
            if self.packed_s2d_io:
                return nnops.conv2d_s2d_packed_io(x, w, b)
            if self.packed_s2d_in:
                assert self.kernel == 3 and self.stride == 2 and self.padding == 1
                return nnops.conv2d_s2d_stride2_packed_in(x, w, b)
            assert self.kernel == 3 and self.stride == 1
            return nnops.conv2d_s2d_same_packed(x, w, b)
        ci = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        w = self.param(
            "kernel",
            conv_init,
            (self.kernel, self.kernel, ci, self.features),
        )
        b = self.param("bias", zeros_init, (self.features,)) if self.use_bias else None
        if self.dead_bias:
            b = None
        if self.reflect:
            # hard error, not assert: conv2d_reflect silently ignores
            # stride/padding, so a violating config would produce wrong
            # outputs (and `python -O` strips asserts)
            if (
                self.stride != 1
                or self.padding != 0
                or self.kernel != 2 * self.reflect + 1
            ):
                raise ValueError(
                    "Conv(reflect=%d) requires stride==1, padding==0, "
                    "kernel==2*reflect+1; got stride=%d padding=%d kernel=%d"
                    % (self.reflect, self.stride, self.padding, self.kernel)
                )
            conv = nnops.conv2d_reflect
        else:
            import functools as _ft

            conv = _ft.partial(
                nnops.conv2d, stride=self.stride, padding=self.padding
            )
        if x2 is None:
            return conv(x, w, b)
        c1 = x.shape[-1]
        y = conv(x, w[:, :, :c1], b)
        y2 = conv(x2, w[:, :, c1:], None)
        if x2.shape[0] != x.shape[0]:
            # batched-pair D apply: one side holds the conditioning ONCE
            # while the other stacks k inputs along batch (e.g.
            # [real; fake.detach()]) — the conditioning partial conv runs
            # at base batch and its result is tiled
            if x2.shape[0] > x.shape[0]:
                y = jnp.concatenate([y] * (x2.shape[0] // x.shape[0]), axis=0)
            else:
                y2 = jnp.concatenate([y2] * (x.shape[0] // x2.shape[0]), axis=0)
        return y + y2


class ConvTranspose(nn.Module):
    """torch.nn.ConvTranspose2d twin (k=3, s=2, p=1, op=1 by default — the
    reference's only use). Kernel stored HWIO with I = input channels."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dead_bias: bool = False  # see Conv.dead_bias — IN follows and cancels it
    # packed_out: emit the s2d-by-2 PACKED output (N,H,W,4*features),
    # phase-major — nnops.conv_transpose2d_packed_out (the packed enhancer
    # tail). Same param tree; d2s2(output) == the literal convT exactly.
    packed_out: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            conv_init,
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", zeros_init, (self.features,))
        if self.dead_bias:
            b = None
        if self.packed_out:
            assert (
                self.kernel, self.stride, self.padding, self.output_padding
            ) == (3, 2, 1, 1)
            return nnops.conv_transpose2d_packed_out(x, w, b)
        return nnops.conv_transpose2d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


def norm_act(x, norm: str = "instance", act: str = "relu"):
    if norm == "instance":
        from ..ops.pallas import config as pallas_config
        from ..ops.pallas.instance_norm import fused_instance_norm

        if pallas_config.enabled():
            x = fused_instance_norm(x, relu=(act == "relu"))
            if act == "relu":
                return x
        elif act in ("relu", "lrelu"):
            # fused IN+act: the byte-diet custom VJP saves only the stats
            # (activation mask recomputed in backward) — see nnops
            return nnops.instance_norm_act(x, act)
        else:
            x = nnops.instance_norm(x)
    elif norm != "none":
        raise ValueError(f"unsupported norm: {norm}")
    if act == "relu":
        x = nnops.relu(x)
    elif act == "lrelu":
        x = nnops.leaky_relu(x, 0.2)
    elif act != "none":
        raise ValueError(f"unsupported act: {act}")
    return x


def _bn_scale_init(key, shape, dtype=jnp.float32):
    # reference weights_init for norm layers: gamma ~ N(1.0, 0.02)
    import jax

    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class NormAct(nn.Module):
    """``get_norm_layer`` twin as a module so batch norm can own params.

    * ``instance``: InstanceNorm2d(affine=False) — parameterless; the
      module leaves NO trace in the param tree, so every existing
      instance-norm checkpoint is unchanged (delegates to ``norm_act``,
      including its fused-Pallas path).
    * ``batch``: BatchNorm2d(affine=True) with BATCH statistics always
      (see nnops.batch_norm — pix2pixHD never calls .eval(), so batch
      stats are its observable inference behavior too). gamma ~ N(1,.02),
      beta = 0 per the reference's ``weights_init``.
    * ``none``: activation only.
    """

    norm: str = "instance"
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        if self.norm == "batch":
            c = x.shape[-1]
            scale = self.param("scale", _bn_scale_init, (c,))
            bias = self.param("bias", zeros_init, (c,))
            x = nnops.batch_norm(x, scale, bias)
            return norm_act(x, "none", self.act)
        return norm_act(x, self.norm, self.act)


class ResnetBlock(nn.Module):
    """ReflectPad1 -> Conv3x3 -> IN -> ReLU -> [Dropout(0.5)] ->
    ReflectPad1 -> Conv3x3 -> IN; residual add. Dropout sits between the
    two convs (pix2pix placement) and only when --use_dropout is on —
    off is the reference default."""

    dim: int
    norm: str = "instance"
    dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        db = self.norm == "instance"
        h = Conv(self.dim, 3, name="conv1", dead_bias=db, reflect=1)(x)
        # checkpoint_name: inert identity outside jax.checkpoint; under
        # remat_policy='conv_out' these two tags are the save set (backward
        # recomputes only IN/ReLU/pad chains, never a conv)
        h = checkpoint_name(h, "res_conv_out")
        h = NormAct(self.norm, "relu", name="norm1")(h)
        if self.dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = Conv(self.dim, 3, name="conv2", dead_bias=db, reflect=1)(h)
        h = checkpoint_name(h, "res_conv_out")
        if self.norm == "instance":
            from ..ops.pallas import config as pallas_config
            from ..ops.pallas.instance_norm import fused_instance_norm

            if pallas_config.enabled():
                return fused_instance_norm(h, residual=x)
            h = nnops.instance_norm(h)
        elif self.norm == "batch":
            h = NormAct("batch", "none", name="norm2")(h)
        return x + h


def _resblock_cls(remat: bool, remat_policy: str = "none"):
    """Resblock wrapper for the remat-policy sweep (VERDICT r3 next#2).
    remat=True with the default policy keeps the r2 behavior (plain
    jax.checkpoint = save block I/O only); 'conv_out' saves the tagged
    conv outputs so backward recomputes only elementwise chains."""
    if remat_policy not in ("none", "block", "conv_out"):
        # validate BEFORE the remat early-return: a typo'd policy with
        # remat=True would otherwise silently measure block remat
        raise ValueError(f"unknown remat_policy {remat_policy!r}")
    if remat_policy == "conv_out":
        return nn.remat(
            ResnetBlock,
            static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names("res_conv_out"),
        )
    if remat or remat_policy == "block":
        return nn.remat(ResnetBlock, static_argnums=(2,))
    return ResnetBlock


class GlobalGenerator(nn.Module):
    """pix2pixHD GlobalGenerator (SURVEY §3.2): c7s1-ngf, n_downsampling
    stride-2 convs, n_blocks resnet blocks, mirrored transposed-conv
    upsampling, c7s1-output_nc + tanh."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4  # flag default --n_downsample_global 4
    n_blocks: int = 9
    norm: str = "instance"
    dropout: bool = False  # --use_dropout
    remat: bool = False  # jax.checkpoint each resblock: FLOPs for HBM
    remat_policy: str = "none"  # none|block|conv_out (configs/options.py)

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False):
        # optional x2: channel-concat semantics via the split-stem Conv
        # (see Conv). x may also be a nnops.PackedStemInput: pre-padded
        # s2d-by-2 packed stem input — conv_in runs packed-io, IN+relu
        # stay packed, down0 consumes packed and exits unpacked. Param
        # tree is IDENTICAL across the three forms.
        db = self.norm == "instance"
        start = 0
        if isinstance(x, nnops.PackedStemInput):
            assert x2 is None and self.norm == "instance"
            h2 = Conv(self.ngf, 7, name="conv_in", dead_bias=db, packed_s2d_io=True)(
                x.packed
            )
            h2 = nnops.instance_norm_packed_act(h2, self.ngf, "relu")
            h = Conv(
                self.ngf * 2, 3, stride=2, padding=1, name="down0",
                dead_bias=db, packed_s2d_in=True,
            )(h2)
            h = norm_act(h, self.norm)
            start = 1
        else:
            h = Conv(self.ngf, 7, name="conv_in", dead_bias=db, reflect=3)(x, x2)
            h = NormAct(self.norm, "relu", name="norm_in")(h)
        for i in range(start, self.n_downsampling):
            h = Conv(self.ngf * 2 ** (i + 1), 3, stride=2, padding=1, name=f"down{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_down{i}")(h)
        block_cls = _resblock_cls(self.remat, self.remat_policy)
        for i in range(self.n_blocks):
            h = block_cls(
                self.ngf * 2**self.n_downsampling,
                self.norm,
                self.dropout,
                name=f"res{i}",
            )(h, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose(self.ngf * mult // 2, name=f"up{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_up{i}")(h)
        h = Conv(self.output_nc, 7, name="conv_out", reflect=3)(h)
        return jnp.tanh(h)


class _GlobalBackbone(nn.Module):
    """GlobalGenerator minus its final (pad, conv7, tanh) head — the trunk
    the LocalEnhancer builds on (pix2pixHD drops the last 3 layers)."""

    ngf: int
    n_downsampling: int
    n_blocks: int
    norm: str = "instance"
    dropout: bool = False

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False):
        # x may be a nnops.PackedStemInput (pre-padded reflect-3, s2d-by-2
        # packed) — same packed stem region as GlobalGenerator: conv_in
        # packed-io, IN+relu packed, down0 consumes packed and exits
        # unpacked. Param tree identical across the two forms.
        db = self.norm == "instance"
        start = 0
        if isinstance(x, nnops.PackedStemInput):
            assert x2 is None and self.norm == "instance"
            h2 = Conv(self.ngf, 7, name="conv_in", dead_bias=db, packed_s2d_io=True)(
                x.packed
            )
            h2 = nnops.instance_norm_packed_act(h2, self.ngf, "relu")
            h = Conv(
                self.ngf * 2, 3, stride=2, padding=1, name="down0",
                dead_bias=db, packed_s2d_in=True,
            )(h2)
            h = norm_act(h, self.norm)
            start = 1
        else:
            h = Conv(self.ngf, 7, name="conv_in", dead_bias=db, reflect=3)(x, x2)
            h = NormAct(self.norm, "relu", name="norm_in")(h)
        for i in range(start, self.n_downsampling):
            h = Conv(self.ngf * 2 ** (i + 1), 3, stride=2, padding=1, name=f"down{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_down{i}")(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(
                self.ngf * 2**self.n_downsampling,
                self.norm,
                self.dropout,
                name=f"res{i}",
            )(h, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose(self.ngf * mult // 2, name=f"up{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_up{i}")(h)
        return h


class LocalEnhancer(nn.Module):
    """pix2pixHD LocalEnhancer: a global trunk run at 1/2**n res plus
    n_local_enhancers coarse-to-fine local branches; branch n downsamples
    its input, SUMS the trunk/previous output into its bottleneck, refines
    with n_blocks_local resblocks and upsamples. Final head: c7s1-out+tanh.
    """

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"
    dropout: bool = False

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False):
        # build the input pyramid: x at full res, downsampled per enhancer.
        # x2 (optional split-stem second input, see Conv) gets its own
        # pyramid so the parts never concatenate at full res.
        pyramid = [x]
        pyramid2 = [x2]
        for _ in range(self.n_local_enhancers):
            pyramid.append(nnops.avg_pool_3x3s2(pyramid[-1]))
            pyramid2.append(
                nnops.avg_pool_3x3s2(pyramid2[-1]) if x2 is not None else None
            )

        ngf_global = self.ngf * (2**self.n_local_enhancers)
        # s2d-by-2 packed stems (perf tier, exact math — see
        # nnops.conv2d_s2d_packed_io / TRACE_1024p_r04.txt): the enhancer's
        # full-res 7x7 conv_in (ngf=32 quarter-fills the 128 lanes at
        # 1024x512, measured 76-81 TF/s) and the trunk's stem both run
        # packed. Param tree identical; exit (down, stride 2) lands on the
        # natural unpacked grid.
        pack = (
            nnops.stem_pack_enabled()
            and self.norm == "instance"
            and x2 is None
            and self.n_downsample_global >= 1
        )
        g_in = pyramid[-1]
        if pack and g_in.shape[1] % 2 == 0 and g_in.shape[2] % 2 == 0:
            g_in = nnops.PackedStemInput(nnops.s2d2(nnops.reflect_pad(g_in, 3)))
        out = _GlobalBackbone(
            ngf_global,
            self.n_downsample_global,
            self.n_blocks_global,
            self.norm,
            self.dropout,
            name="global",
        )(g_in, pyramid2[-1], train)

        for n in range(1, self.n_local_enhancers + 1):
            ngf_n = self.ngf * (2 ** (self.n_local_enhancers - n))
            inp = pyramid[self.n_local_enhancers - n]
            inp2 = pyramid2[self.n_local_enhancers - n]
            db = self.norm == "instance"
            if pack and inp.shape[1] % 2 == 0 and inp.shape[2] % 2 == 0:
                xp = nnops.s2d2(nnops.reflect_pad(inp, 3))
                h = Conv(
                    ngf_n, 7, name=f"local{n}_conv_in",
                    dead_bias=db, packed_s2d_io=True,
                )(xp)
                h = nnops.instance_norm_packed_act(h, ngf_n, "relu")
                h = Conv(
                    ngf_n * 2, 3, stride=2, padding=1, name=f"local{n}_down",
                    dead_bias=db, packed_s2d_in=True,
                )(h)
                h = norm_act(h, self.norm)
            else:
                h = Conv(
                    ngf_n, 7, name=f"local{n}_conv_in", dead_bias=db, reflect=3
                )(inp, inp2)
                h = NormAct(self.norm, "relu", name=f"local{n}_norm_in")(h)
                h = Conv(ngf_n * 2, 3, stride=2, padding=1, name=f"local{n}_down", dead_bias=db)(h)
                h = NormAct(self.norm, "relu", name=f"local{n}_norm_down")(h)
            h = h + out  # fuse trunk features
            for i in range(self.n_blocks_local):
                h = ResnetBlock(
                    ngf_n * 2, self.norm, self.dropout, name=f"local{n}_res{i}"
                )(h, train)
            if pack:
                # packed tail: the up emits the phase-major packed output
                # (one full-lane 2x2 matmul instead of the ~28 TF/s
                # adjoint conv at this thin-channel full-res shape),
                # IN+relu stays packed, one d2s2 unpacks for the head/next
                # branch. d2s2(packed convT) == the literal convT exactly.
                h = ConvTranspose(
                    ngf_n, name=f"local{n}_up", dead_bias=db, packed_out=True
                )(h)
                h = nnops.instance_norm_packed_act(h, ngf_n, "relu")
                h = nnops.d2s2(h)
            else:
                h = ConvTranspose(ngf_n, name=f"local{n}_up", dead_bias=db)(h)
                h = NormAct(self.norm, "relu", name=f"local{n}_norm_up")(h)
            out = h

        out = Conv(self.output_nc, 7, name="conv_out", reflect=3)(out)
        return jnp.tanh(out)


class NLayerDiscriminator(nn.Module):
    """PatchGAN (SURVEY §3.2): Conv4x4 s2 -> LReLU, then (n_layers-1)
    Conv4x4 s2 + IN + LReLU doubling channels (cap 512), one Conv4x4 s1 +
    IN + LReLU, final Conv4x4 s1 -> 1 logit map (no sigmoid under LSGAN).
    Returns the list of intermediate features when get_interm_feat (for the
    feature-matching loss); otherwise just the final logits."""

    ndf: int = 64
    n_layers: int = 3
    get_interm_feat: bool = True
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, x2=None):
        padw = 2  # ceil((4-1)/2) — pix2pixHD convention
        feats = []
        h = Conv(self.ndf, 4, stride=2, padding=padw, name="layer0")(x, x2)
        h = nnops.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        db = self.norm == "instance"
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv(nf, 4, stride=2, padding=padw, name=f"layer{n}", dead_bias=db)(h)
            h = NormAct(self.norm, "lrelu", name=f"norm{n}")(h)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = Conv(nf, 4, stride=1, padding=padw, name=f"layer{self.n_layers}", dead_bias=db)(h)
        h = NormAct(self.norm, "lrelu", name=f"norm{self.n_layers}")(h)
        feats.append(h)
        h = Conv(1, 4, stride=1, padding=padw, name=f"layer{self.n_layers + 1}")(h)
        feats.append(h)
        if self.get_interm_feat:
            return feats
        return [h]


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs on an AvgPool(3,2,1,count_include_pad=False) image
    pyramid. Output: list over scales (index 0 = full resolution) of lists
    of per-layer features (last element = logits)."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    get_interm_feat: bool = True
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, x2=None):
        """x (+ optional x2, channel-concat semantics — see Conv): the
        two-input form keeps the conditioning pyramid separate so its
        AvgPool downsamples and layer0 partial convs CSE across the three
        per-step D applies. ``x`` may also be a tuple/list: a PRECOMPUTED
        conditioning pyramid (scale 0 first; e.g. the Pallas
        encode_cond_pooled output) — identical values, pooling skipped."""
        x_pyr = x if isinstance(x, (tuple, list)) else None
        results = []
        inp = x_pyr[0] if x_pyr is not None else x
        inp2 = x2
        for i in range(self.num_D):
            d = NLayerDiscriminator(
                self.ndf,
                self.n_layers,
                self.get_interm_feat,
                self.norm,
                name=f"scale{i}",
            )
            results.append(d(inp, inp2))
            if i != self.num_D - 1:
                inp = (
                    x_pyr[i + 1]
                    if x_pyr is not None
                    else nnops.avg_pool_3x3s2(inp)
                )
                if inp2 is not None:
                    inp2 = nnops.avg_pool_3x3s2(inp2)
        return results


class Encoder(nn.Module):
    """pix2pixHD instance-feature Encoder (SURVEY §3.2): conv encoder-decoder
    producing feat_num maps, then instance-wise average pooling over the
    instance map so every instance region carries one feature vector.

    Raw Cityscapes instance ids (class*1000+k) are remapped to a static
    segment space of size ``max_segments`` (class * slots + k % slots) —
    the jit-able equivalent of torch's dynamic ``inst.unique()`` loop;
    collisions only above ``slots`` instances of one class per image
    (documented divergence)."""

    feat_num: int = 3
    nef: int = 16
    n_downsampling: int = 4
    norm: str = "instance"
    label_nc: int = 35
    instance_slots: int = 64

    @nn.compact
    def __call__(self, img, inst):
        db = self.norm == "instance"
        h = Conv(self.nef, 7, name="conv_in", dead_bias=db, reflect=3)(img)
        h = NormAct(self.norm, "relu", name="norm_in")(h)
        for i in range(self.n_downsampling):
            h = Conv(self.nef * 2 ** (i + 1), 3, stride=2, padding=1, name=f"down{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_down{i}")(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose(self.nef * mult // 2, name=f"up{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"norm_up{i}")(h)
        h = Conv(self.feat_num, 7, name="conv_out", reflect=3)(h)
        h = jnp.tanh(h)
        ids = inst.astype(jnp.int32)
        seg = (ids // 1000) * self.instance_slots + (ids % 1000) % self.instance_slots
        seg = jnp.clip(seg, 0, self.label_nc * self.instance_slots - 1)
        return nnops.segment_mean_2d(h, seg, self.label_nc * self.instance_slots)


class Vgg19Features(nn.Module):
    """VGG19 feature taps at relu1_1/2_1/3_1/4_1/5_1 (torchvision feature
    indices 0-1 / 2-6 / 7-11 / 12-20 / 21-29 — SURVEY §8 "VGG19 weights").

    Implemented from the public architecture; pretrained weights are
    injected through ``tools/load_vgg_weights.py`` (safetensors/npz seam) —
    tests pass with random init. NOTE the reference feeds [-1,1] images
    directly (no ImageNet normalization) — preserved here.
    """

    # conv widths per block; taps happen after the first ReLU of each block
    cfg: Sequence[Sequence[int]] = (
        (64, 64),
        (128, 128),
        (256, 256, 256, 256),
        (512, 512, 512, 512),
        (512, 512, 512, 512),
    )

    @nn.compact
    def __call__(self, x):
        # Perf path: block 1 (conv1_1, conv1_2, pool1) computes in
        # space-to-depth-by-2 coordinates. At 512x256 the 3->64 and 64->64
        # convs under-fill the 128 lanes (measured 5.3 ms/step at 5.7 TF/s
        # and 13.1 ms at 70 TF/s); packed they run 12->256 / 256->256 at
        # full tiles (~4x padded FLOPs, net win), the 2x2-s2 maxpool
        # degenerates to a free phase max (whose select-and-scatter
        # backward cost 4.9 ms), and nothing is unpacked in between — the
        # relu1_1 loss tap is consumed element-bijectively by the
        # mean-|a-b| perceptual loss, so its packed layout changes no loss
        # value. Param tree identical (Conv.packed_s2d2 reuses the same
        # kernels). Parity tier (HIGHEST) keeps the literal lowering.
        pack1 = (
            nnops.vgg_pack_enabled()
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        taps = []
        h = x
        for b, widths in enumerate(self.cfg):
            if b == 0 and pack1:
                # grid-shifted ka=2 chaining (1.78x padded FLOPs, vs 4x for
                # the naive packed-SAME form): conv1_1 runs VALID on the
                # pad-2 packed input and lands on "grid B" (blocks cover
                # originals (2i-1, 2i), i.e. the zero-padded-by-1 packed
                # layout conv1_2's SAME semantics need) — after masking the
                # out-of-image half-phase border to literal zeros. conv1_2
                # then runs VALID grid-B -> grid-A. The relu1_1 loss tap is
                # the masked grid-B tensor scaled by numelB/numelA, which
                # makes mean-|a-b| EXACT (border diffs are 0 on both sides,
                # only the mean's denominator needs correcting).
                xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
                h2 = nnops.s2d2(xp)
                h2 = Conv(64, 3, padding=1, name="conv1_1", packed_s2d_io=True)(h2)
                h2 = nnops.relu(nnops.mask_packed_border(h2, 64))
                hb2, wb2 = h2.shape[1], h2.shape[2]
                scale = (hb2 * wb2) / float((hb2 - 1) * (wb2 - 1))
                taps.append(h2 * jnp.asarray(scale, h2.dtype))
                h2 = Conv(64, 3, padding=1, name="conv1_2", packed_s2d_io=True)(h2)
                h2 = nnops.relu(h2)
                # pool1 comes out of the phase max; block 2 must not pool again
                h = nnops.phase_max_pool_packed(h2, 64)
                continue
            if b > 0 and not (b == 1 and pack1):
                h = nnops.max_pool_2x2(h)
            for c, width in enumerate(widths):
                h = Conv(width, 3, padding=1, name=f"conv{b + 1}_{c + 1}")(h)
                h = nnops.relu(h)
                if c == 0:
                    taps.append(h)
        return taps


# ---------------------------------------------------------------------------
# Two-stream structure generator (box2mask) — paper §3.2 [P], repo tier [R]
# ---------------------------------------------------------------------------


class TwoStreamStructureGenerator(nn.Module):
    """Structure generator: shared conv encoder over (masked one-hot layout
    ⊕ box-mask channel), class conditioning at the bottleneck (a
    box-masked class map into the 1x1 fuse + a post-norm class embedding
    — both chosen to SURVIVE InstanceNorm, which exactly cancels
    spatially-constant pre-norm signals; see the inline comment), resnet
    bottleneck, and TWO skip-connected decoder streams:

      * object stream  -> 1-channel object-mask logit (sigmoid)
      * context stream -> label_nc-channel layout logits (softmax)

    ``merge``: inside the (soft) object mask the layout becomes class ``c``;
    outside, the context stream's prediction — producing the completed
    semantic layout for the crop (SURVEY §3.2 "Structure generator").
    """

    label_nc: int = 35
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 4
    norm: str = "instance"

    @nn.compact
    def __call__(self, masked_layout, boxmask, class_onehot):
        """masked_layout: (B,H,W,label_nc); boxmask: (B,H,W,1);
        class_onehot: (B,label_nc). Returns (layout_logits, mask_logit,
        merged_probs)."""
        db = self.norm == "instance"
        x = jnp.concatenate([masked_layout, boxmask], axis=-1)
        h = Conv(self.ngf, 7, name="enc_in", dead_bias=db, reflect=3)(x)
        h = NormAct(self.norm, "relu", name="enc_norm_in")(h)
        skips = []
        for i in range(self.n_downsampling):
            skips.append(h)
            h = Conv(self.ngf * 2 ** (i + 1), 3, stride=2, padding=1, name=f"enc_down{i}", dead_bias=db)(h)
            h = NormAct(self.norm, "relu", name=f"enc_norm_down{i}")(h)

        # Class conditioning at the bottleneck — TWO mechanisms, both of
        # which survive InstanceNorm (the naive tile-everywhere concat ->
        # 1x1 conv -> IN fuse is spatially CONSTANT per channel and IN
        # subtracts the per-(N,C) spatial mean, so it is EXACTLY cancelled:
        # measured round 5, outputs were bit-identical for cls =
        # null/road/car and remove-edit restore acc sat at 0.11):
        #
        #  1. a BOX-MASKED class map concatenated into the 1x1 fuse —
        #     one-hot(cls) tiled only where the (pooled) box mask is
        #     nonzero. Spatially VARYING (in-box vs out), so no IN can
        #     cancel it, and it is localized exactly where the streams
        #     must act on the class. This is the strong signal the object
        #     stream needs to flip between "draw the class-c object"
        #     (add) and "draw nothing" (null -> all-zeros map; measured:
        #     the shift-only variant left add in-box acc at 0.30 because
        #     the class response was ~0.02 in logit scale).
        #  2. a per-channel class embedding added BETWEEN the norm and
        #     the ReLU (post-norm, pre-nonlinearity): the ReLU clips
        #     per-pixel, turning the constant shift into spatially-varying
        #     modulation downstream — a weaker global bias both streams
        #     can use.
        #
        # cls = -1 (the null class) one-hots to all-zeros -> zero map and
        # zero shift by construction.
        ch = self.ngf * 2**self.n_downsampling
        b_, hh, ww, _ = h.shape
        fy, fx = boxmask.shape[1] // hh, boxmask.shape[2] // ww
        bm = boxmask.reshape(b_, hh, fy, ww, fx, 1).max(axis=(2, 4))
        cmap = class_onehot[:, None, None, :] * bm
        h = Conv(ch, 1, name="cls_fuse", dead_bias=db)(
            jnp.concatenate([h, cmap], axis=-1)
        )
        h = NormAct(self.norm, "none", name="cls_norm")(h)
        # bias-free so the null class (one-hot all-zeros) embeds to an
        # exactly-zero shift no matter what training does
        cls_shift = nn.Dense(
            ch, kernel_init=conv_init, use_bias=False, name="cls_embed"
        )(class_onehot)
        h = nnops.relu(h + cls_shift[:, None, None, :])
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 2**self.n_downsampling, self.norm, name=f"res{i}")(h)

        def decoder(tag, out_nc, h):
            for i in range(self.n_downsampling):
                mult = 2 ** (self.n_downsampling - i)
                h = ConvTranspose(self.ngf * mult // 2, name=f"{tag}_up{i}", dead_bias=db)(h)
                h = NormAct(self.norm, "relu", name=f"{tag}_norm_up{i}")(h)
                h = h + skips[self.n_downsampling - 1 - i]  # U-Net skip (add)
            return Conv(out_nc, 7, name=f"{tag}_out", reflect=3)(h)

        layout_logits = decoder("ctx", self.label_nc, h)
        mask_logit = decoder("obj", 1, h)

        obj_mask = jnp.clip(nn.sigmoid(mask_logit) * boxmask, 0.0, 1.0)
        ctx_probs = nn.softmax(layout_logits, axis=-1)
        cls_map = jnp.broadcast_to(
            class_onehot[:, None, None, :], ctx_probs.shape
        )
        merged = ctx_probs * (1.0 - obj_mask) + cls_map * obj_mask
        return layout_logits, mask_logit, merged


class LayoutDiscriminator(nn.Module):
    """Conditional layout discriminator for box2mask [P]: a PatchGAN over
    (layout one-hot ⊕ tiled class one-hot ⊕ box mask)."""

    ndf: int = 64
    n_layers: int = 3
    get_interm_feat: bool = True
    norm: str = "instance"

    @nn.compact
    def __call__(self, layout, boxmask, class_onehot):
        # cond is built at boxmask's batch; layout may stack k inputs along
        # batch (e.g. [gt; merged.detach()]) — Conv tiles the cond partial
        b, h, w = boxmask.shape[0], layout.shape[1], layout.shape[2]
        cls = jnp.broadcast_to(
            class_onehot[:, None, None, :], (b, h, w, class_onehot.shape[-1])
        )
        # (cls ⊕ boxmask) is identical across the per-step D applies —
        # passed as the split-stem second input so XLA CSE shares its
        # layer0 partial conv (see Conv docstring)
        cond = jnp.concatenate([cls, boxmask], axis=-1)
        return NLayerDiscriminator(
            self.ndf, self.n_layers, self.get_interm_feat, self.norm, name="d"
        )(layout, cond)


def define_G(opt) -> Any:
    """Factory mirroring the reference's ``define_G`` (C15). opt is a
    MaskToImageOptions / BoxToMaskOptions dataclass (configs/options.py)."""
    if opt.netG == "global":
        return GlobalGenerator(
            output_nc=opt.output_nc,
            ngf=opt.ngf,
            n_downsampling=opt.n_downsample_global,
            n_blocks=opt.n_blocks_global,
            norm=opt.norm,
            dropout=getattr(opt, "use_dropout", False),
            remat=getattr(opt, "remat", False),
            remat_policy=getattr(opt, "remat_policy", "none"),
        )
    if opt.netG == "local":
        return LocalEnhancer(
            output_nc=opt.output_nc,
            ngf=opt.ngf,
            n_downsample_global=opt.n_downsample_global,
            n_blocks_global=opt.n_blocks_global,
            n_local_enhancers=opt.n_local_enhancers,
            n_blocks_local=opt.n_blocks_local,
            norm=opt.norm,
            dropout=getattr(opt, "use_dropout", False),
        )
    if opt.netG == "twostream":
        if getattr(opt, "use_dropout", False):
            # fail loudly rather than silently ignore (VERDICT r1 weak#7)
            raise ValueError("--use_dropout is not supported for netG=twostream")
        return TwoStreamStructureGenerator(
            label_nc=opt.label_nc,
            ngf=opt.ngf,
            n_downsampling=opt.n_downsample_global,
            n_blocks=opt.n_blocks_global,
            norm=opt.norm,
        )
    raise ValueError(f"unknown netG: {opt.netG}")


def define_D(opt) -> MultiscaleDiscriminator:
    return MultiscaleDiscriminator(
        ndf=opt.ndf,
        n_layers=opt.n_layers_D,
        num_D=opt.num_D,
        get_interm_feat=not opt.no_ganFeat_loss,
        norm=opt.norm,
    )
