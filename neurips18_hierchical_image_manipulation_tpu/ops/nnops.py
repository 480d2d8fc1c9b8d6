"""Low-level NN primitives with torch-exact semantics, NHWC layout.

These reproduce — bit-comparably at fp32 (tight ulp band, see tests) — the
PyTorch ops the reference stacks into its networks (SURVEY.md §3.2):

  * ``conv2d``            <-> ``torch.nn.Conv2d`` (symmetric int padding)
  * ``conv_transpose2d``  <-> ``torch.nn.ConvTranspose2d(k, s, p, output_padding)``
  * ``instance_norm``     <-> ``torch.nn.InstanceNorm2d(affine=False, eps=1e-5)``
                              (biased variance, no running stats)
  * ``reflect_pad``       <-> ``torch.nn.ReflectionPad2d``
  * ``avg_pool_3x3s2``    <-> ``torch.nn.AvgPool2d(3, 2, padding=1,
                              count_include_pad=False)`` — the downsampler
                              between multiscale-D scales
  * ``leaky_relu``        <-> slope 0.2 (PatchGAN)

Layout convention: activations NHWC, conv kernels HWIO. Transposed-conv
kernels are ALSO stored HWIO with I = the op's input channels (i.e. already
"flipped" relative to torch's (in, out, kH, kW)); the spatial flip happens
inside ``conv_transpose2d``.

Everything here is pure jnp/lax — jit-fusable, static shapes, MXU-friendly.
The Pallas fast path for the fused conv+IN+ReLU residual block lives in
``ops/pallas``; this module is the always-available reference tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# fp32 parity mode: on TPU, XLA lowers fp32 convs onto the MXU with bf16
# passes by default, which breaks the BASELINE.json:5 "bit-comparable at
# fp32" bar. HIGHEST forces full fp32 accumulation. The perf training path
# runs in bf16 anyway (set via configs), so this only taxes the parity path.
_PRECISION = lax.Precision.HIGHEST


def set_default_precision(p):
    """Override conv precision globally ('default'/'highest' or a
    lax.Precision). Used by the bf16 perf configs."""
    global _PRECISION
    if isinstance(p, str):
        p = {"default": lax.Precision.DEFAULT, "highest": lax.Precision.HIGHEST}[p]
    _PRECISION = p


def get_default_precision():
    """Current global conv precision — save before a temporary
    set_default_precision so the caller's mode can be restored."""
    return _PRECISION


import contextlib as _contextlib


@_contextlib.contextmanager
def precision_scope(precision=None, in_custom_vjp=None, pallas_enabled=None,
                    conv_reflect_fused=None):
    """Temporarily pin the precision tier (plus the IN-custom-VJP and
    Pallas-tier gates) around an op-construction section, restoring the
    caller's state after.

    All three gates are process globals read at TRACE time, so a program
    that composes two models trained under DIFFERENT tiers (the two-step
    pipeline: a parity-fp32 box2mask stage feeding a bf16-perf mask2image
    stage, or a --no_pallas stage next to a pallas-enabled one) must scope
    each stage's ops — otherwise whichever create_model ran last silently
    re-tiers the other stage's trace. ``None`` leaves the corresponding
    gate untouched.
    """
    from .pallas import config as pallas_config

    global _IN_CUSTOM_VJP, _CONV_REFLECT_FUSED
    prev_p = _PRECISION
    prev_v = _IN_CUSTOM_VJP
    prev_k = pallas_config._ENABLED
    prev_r = _CONV_REFLECT_FUSED
    try:
        if precision is not None:
            set_default_precision(precision)
        if in_custom_vjp is not None and _IN_CUSTOM_VJP_ENV is None:
            _IN_CUSTOM_VJP = bool(in_custom_vjp)
        if pallas_enabled is not None:
            pallas_config.set_enabled(pallas_enabled)
        if conv_reflect_fused is not None and _CONV_REFLECT_FUSED_ENV is None:
            _CONV_REFLECT_FUSED = bool(conv_reflect_fused)
        yield
    finally:
        set_default_precision(prev_p)
        _IN_CUSTOM_VJP = prev_v
        pallas_config.set_enabled(prev_k)
        _CONV_REFLECT_FUSED = prev_r


def _lane_pad_targets(ci: int, co: int):
    """Channel-padding policy for the bf16 perf path (v5e profiling,
    2026-08-16): XLA picks pathological batch-minor layouts for low/odd
    channel counts (the 39-ch conditioning stem and 3-ch RGB head cost
    ~40ms/step in pure transposes+copies at 512x256 bs32). Padding input/
    output channels with zeros is numerically EXACT (0-channels contribute
    exactly 0) and restores lane-aligned layouts. Measured END-TO-END it
    LOSES (74.1 vs 81.3 img/s full GAN step: the padded full-res tensors
    raise HBM pressure and worsen XLA's auto-remat), so _LANE_PAD defaults
    off. Returns (ci_t, co_t)."""
    def up(c):
        if c >= 64:
            return c  # 64+ already lane-friendly in T(8,128) tiles
        if c > 32:
            return 64
        return -(-c // 8) * 8  # next multiple of 8 (sublane)

    return up(ci), up(co)


def conv2d(x, w, b=None, *, stride=1, padding=0, precision=None):
    """torch.nn.Conv2d equivalent. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout).

    On the perf path (Precision.DEFAULT) low-channel operands are
    zero-padded to lane-aligned widths and the output sliced back — see
    ``_lane_pad_targets``. Exact math; disable with HIMAN_LANE_PAD=0."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(p) if isinstance(p, (tuple, list)) else (p, p) for p in padding]
    prec = precision or _PRECISION
    co = w.shape[-1]
    if _phasepack_eligible(x, w, s, pad, prec):
        return conv2d_phasepack(x, w, b, precision=prec)
    if _s2d_eligible_padded(x, w, s, pad, prec):
        xp = (
            x
            if pad == [(0, 0), (0, 0)]
            else jnp.pad(x, [(0, 0), pad[0], pad[1], (0, 0)])
        )
        return conv2d_s2d(xp, w, b, stride=s[0], precision=prec)
    if prec == lax.Precision.DEFAULT and _LANE_PAD:
        ci = x.shape[-1]
        ci_t, co_t = _lane_pad_targets(ci, co)
        if ci_t != ci:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, ci_t - ci)])
            w = jnp.pad(w, [(0, 0), (0, 0), (0, ci_t - ci), (0, 0)])
        if co_t != co:
            w = jnp.pad(w, [(0, 0), (0, 0), (0, 0), (0, co_t - co)])
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=pad,
        dimension_numbers=_DIMNUMS,
        precision=prec,
    )
    if y.shape[-1] != co:
        y = y[..., :co]
    if b is not None:
        y = y + b
    return y


def conv2d_reflect(x, w, b=None, *, precision=None):
    """conv2d over a ReflectionPad2d((k-1)//2) input, stride 1 — exact
    same math as ``conv2d(reflect_pad(x, p), w, b)`` WITHOUT materializing
    the padded copy (reference: pix2pixHD's ReflectionPad2d+Conv2d pairs).

    Reflect-pad is the LocalEnhancer's single biggest non-conv cost: the
    1024x512 bs4 train step spends 43.1 ms/step on pad concats + their
    slice/rev/add VJP folds (measured 2026-08-19: zero-pad bound 288.9 ms
    vs 332.0 ms baseline, TRACE_1024p_r04b.txt 14.2 ms concatenate +
    12.4 ms add_any forward-side alone). Construction:

      y0   = conv2d(x, w, b, padding=p)      # zero pad — folded into the
                                             # conv by XLA, no copy
      y    = y0 + pad(top - y0[:, :p]) + pad(bottom - ...)
                + pad(left - ...) + pad(right - ...)

    where top/bottom/left/right are EXACT border outputs from tiny strip
    convs over reassembled reflected rows/cols (top/bottom strips carry
    the corner columns via horizontal reflection; left/right strips cover
    interior rows only, so nothing is corrected twice). The corrections
    are elementwise adds of zero-padded small tensors, so XLA fuses all
    four into one pass over y0, and the VJP sends dy UNCHANGED into the
    main conv's gradient (plus free slices for the strips) — no
    border-masking select, no fold chain.

    Interior outputs are the same dot products as the literal form;
    border outputs reduce over the same taps in the same kernel order —
    parity-tested against conv2d(reflect_pad(x, p), w) fwd+grad at the
    perf tier (tests/test_conv_reflect.py: p=1/2/3, minimal shapes,
    bias/no-bias).

    CONFIG-KEYED via set_conv_reflect_fused (models/factory.py): the
    fused form landed in the r4 snapshot unbenchmarked and cost the
    MXU-bound flagship -7.0% end-to-end (93.46 -> 86.93 img/s, measured
    same-session r5) — it defaults OFF and is enabled only where
    measured to win (see the factory keying comment)."""
    k = w.shape[0]
    p = (k - 1) // 2
    prec = precision or _PRECISION
    if (
        not _CONV_REFLECT_FUSED
        or x.ndim != 4
        or w.shape[0] != w.shape[1]
        or p < 1
        or prec == lax.Precision.HIGHEST
        or x.shape[1] < 3 * p
        or x.shape[2] < 3 * p
        or x.shape[1] < k
        or x.shape[2] < k
    ):
        return conv2d(reflect_pad(x, p), w, b, precision=prec)
    n, h, wd, ci = x.shape
    co = w.shape[-1]

    y0 = conv2d(x, w, b, padding=p, precision=prec)

    def hreflect(s):
        # columns -p..-1 are x[:, :, p..1]; columns wd..wd+p-1 are
        # x[:, :, wd-2..wd-p-1] (torch ReflectionPad2d, no edge repeat)
        left = jnp.flip(s[:, :, 1 : p + 1], 2)
        right = jnp.flip(s[:, :, wd - p - 1 : wd - 1], 2)
        return jnp.concatenate([left, s, right], 2)

    # top strip: input rows -p..2p-1 (reflected head + first 2p rows),
    # horizontally reflected -> VALID conv = exact out rows 0..p-1, all
    # wd columns (corners included)
    ts = jnp.concatenate([jnp.flip(x[:, 1 : p + 1], 1), x[:, : 2 * p]], 1)
    top = conv2d(hreflect(ts), w, b, precision=prec)
    # bottom strip: input rows h-2p..h-1 + reflected tail rows h-2..h-p-1
    bs = jnp.concatenate(
        [x[:, h - 2 * p :], jnp.flip(x[:, h - p - 1 : h - 1], 1)], 1
    )
    bot = conv2d(hreflect(bs), w, b, precision=prec)
    # left/right strips: interior out rows p..h-p-1 only (corner rows are
    # already exact from top/bottom), reflected head/tail columns
    ls = jnp.concatenate([jnp.flip(x[:, :, 1 : p + 1], 2), x[:, :, : 2 * p]], 2)
    left = conv2d(ls, w, b, precision=prec)
    rs = jnp.concatenate(
        [x[:, :, wd - 2 * p :], jnp.flip(x[:, :, wd - p - 1 : wd - 1], 2)], 2
    )
    right = conv2d(rs, w, b, precision=prec)

    z = ((0, 0), (0, 0))
    y = y0
    y = y + jnp.pad(top - y0[:, :p], ((0, 0), (0, h - p), z[0], z[1]))
    y = y + jnp.pad(bot - y0[:, h - p :], ((0, 0), (h - p, 0), z[0], z[1]))
    y = y + jnp.pad(
        left - y0[:, p : h - p, :p], ((0, 0), (p, p), (0, wd - p), (0, 0))
    )
    y = y + jnp.pad(
        right - y0[:, p : h - p, wd - p :], ((0, 0), (p, p), (wd - p, 0), (0, 0))
    )
    return y


# conv-transpose implementation selector for ConvT(k3,s2,p1,op1):
#   "adjoint"  = lhs_dilated conv (torch-exact accumulation order; parity tier)
#   "subpixel" = 4 phase convs + interleave
#   "d2s"      = one 2x2 conv to 4*Co channels + depth-to-space
#   "auto"     = currently ADJOINT everywhere. Isolated fwd+bwd timings
#                (v5e bs32 bf16, tools/bench_convt.py 2026-08-16) say the
#                alternates should win at low-channel/large-spatial shapes:
#                  16x32x1024->512: adjoint 3.75ms  subpixel 3.77  d2s 6.38
#                  32x64x512->256 : adjoint 5.25    subpixel 4.96  d2s 6.22
#                  64x128x256->128: adjoint 8.36    subpixel 8.34  d2s 5.58
#                  128x256x128->64: adjoint 22.38   subpixel 22.39 d2s 6.16
#                ...but END-TO-END the full GAN train step measured SLOWER
#                with them (subpixel-everywhere 73.9 img/s, shape-adaptive
#                subpixel/d2s 74.1 vs adjoint 81.3): the phase stacks add
#                materialized intermediates that break XLA's fusion/remat
#                schedule in the memory-pressured full program. Honestly
#                gated off until a variant wins end-to-end; force with
#                HIMAN_CONVT_IMPL=subpixel|d2s.
import os as _os

_CONVT_IMPL = _os.environ.get("HIMAN_CONVT_IMPL", "auto")
# end-to-end LOSS measured (74.1 vs 81.3 img/s, see _lane_pad_targets
# docstring) — opt-in via HIMAN_LANE_PAD=1
_LANE_PAD = _os.environ.get("HIMAN_LANE_PAD", "0") == "1"
# lane-fold the IN stats reduce for c<128 (see instance_norm docstring).
# Measured end-to-end: 82.79 vs 83.5 img/s baseline (and 81.57 when the
# normalize was folded too) — the extra view splits the stats fusion and
# loses more than full-lane reduction gains. Opt-in.
_IN_LANE_FOLD = _os.environ.get("HIMAN_IN_LANE_FOLD", "0") == "1"
# ConvT(k3,s2,p1,op1) custom VJP: phase-correlation weight gradient +
# stride-2 conv input gradient, replacing XLA's derived adjoint backward
# whose wgrad spatially REVERSES the full-res activations (5.1 ms/step of
# standalone `reverse` at the bench config). Measured END-TO-END: 90.3 vs
# 92.5 img/s — the nine einsum correlations + the g phase split cost more
# than the reverses they remove (XLA fuses the reverse into neighboring
# gradient work). Opt-in via HIMAN_CONVT_PHASE_BWD=1; goldens in
# tests ensure it stays correct as a tuning surface.
_CONVT_PHASE_BWD = _os.environ.get("HIMAN_CONVT_PHASE_BWD", "0") == "1"


def set_conv_transpose_impl(impl: str):
    global _CONVT_IMPL
    assert impl in ("adjoint", "subpixel", "d2s", "auto"), impl
    _CONVT_IMPL = impl


def conv_transpose2d_subpixel(x, w, b=None, *, precision=None):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) via subpixel phase decomposition.

    The adjoint form dilates the input with zeros (3 of every 4 positions),
    so a dense 3x3 conv over it wastes ~4x the MXU work. Output pixels
    partition into 4 phases by parity, each an ordinary small conv:

      out[2i,   2j  ] = x[i,j]*w[1,1]
      out[2i,   2j+1] = x[i,j]*w[1,2] + x[i,j+1]*w[1,0]
      out[2i+1, 2j  ] = x[i,j]*w[2,1] + x[i+1,j]*w[0,1]
      out[2i+1, 2j+1] = x[i,j]*w[2,2] + x[i,j+1]*w[2,0]
                      + x[i+1,j]*w[0,2] + x[i+1,j+1]*w[0,0]

    (w indexed HWIO, out-of-range x terms are zero). Identical arithmetic
    to the adjoint modulo float summation order.
    """
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    prec = precision or _PRECISION

    def pconv(kern, pad_h, pad_w):
        return lax.conv_general_dilated(
            x, kern, window_strides=(1, 1),
            padding=[(0, pad_h), (0, pad_w)],
            dimension_numbers=_DIMNUMS, precision=prec,
        )

    p00 = pconv(w[1:2, 1:2], 0, 0)
    p01 = pconv(jnp.stack([w[1, 2], w[1, 0]])[None], 0, 1)  # (1,2,Ci,Co)
    p10 = pconv(jnp.stack([w[2, 1], w[0, 1]])[:, None], 1, 0)  # (2,1,Ci,Co)
    k11 = jnp.stack(
        [jnp.stack([w[2, 2], w[2, 0]]), jnp.stack([w[0, 2], w[0, 0]])]
    )  # (2,2,Ci,Co)
    p11 = pconv(k11, 1, 1)

    top = jnp.stack([p00, p01], axis=3)  # (N,H,W,2,C)
    bot = jnp.stack([p10, p11], axis=3)
    y = jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * wd, co)
    if b is not None:
        y = y + b
    return y


def _convt_d2s_kernel(w):
    """Phase kernels for ConvTranspose2d(k3,s2,p1,op1) as one 2x2 conv to
    4*Co phase-major channels: tap (dy,dx) contributes to phase p in
    out[2i+p_r, 2j+p_c] per the subpixel decomposition."""
    ci = w.shape[2]
    co = w.shape[-1]
    z = jnp.zeros_like(w[0, 0])
    k = jnp.stack(
        [
            # tap (0,0): all four phases read x[i,j]
            jnp.stack([w[1, 1], w[1, 2], w[2, 1], w[2, 2]], axis=-2),
            # tap (0,1): phases (0,1) and (1,1) read x[i,j+1]
            jnp.stack([z, w[1, 0], z, w[2, 0]], axis=-2),
        ]
    )
    k2 = jnp.stack(
        [
            # tap (1,0): phases (1,0) and (1,1) read x[i+1,j]
            jnp.stack([z, z, w[0, 1], w[0, 2]], axis=-2),
            # tap (1,1): phase (1,1) reads x[i+1,j+1]
            jnp.stack([z, z, z, w[0, 0]], axis=-2),
        ]
    )
    return jnp.stack([k, k2]).reshape(2, 2, ci, 4 * co)


def conv_transpose2d_packed_out(x, w, b=None, *, precision=None):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) producing the s2d-by-2 PACKED
    output (N, H, W, 4Co), phase-major — i.e. ``conv_transpose2d_d2s``
    WITHOUT the trailing depth-to-space. ``d2s2(result)`` equals the
    literal convT exactly. The packed enhancer tail's up: at the
    LocalEnhancer's thin-channel full-res shape the adjoint form runs at
    ~28 TF/s (TRACE_1024p_r04b.txt nnops:374) while this is one
    full-lane 2x2 matmul, and the following IN+relu stays packed."""
    y4 = lax.conv_general_dilated(
        x, _convt_d2s_kernel(w), window_strides=(1, 1),
        padding=[(0, 1), (0, 1)],
        dimension_numbers=_DIMNUMS, precision=precision or _PRECISION,
    )  # (N,H,W,4Co), channel layout [phase(2x2), Co]
    if b is not None:
        y4 = y4 + jnp.tile(b, 4)
    return y4


def conv_transpose2d_d2s(x, w, b=None, *, precision=None):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) as ONE 2x2 conv producing
    4*Co channels followed by depth-to-space — the same phase math as
    ``conv_transpose2d_subpixel`` but as a single MXU matmul (unused taps
    zero-padded: 4 taps/output vs the naive dilated form's 9)."""
    y = d2s2(conv_transpose2d_packed_out(x, w, precision=precision))
    if b is not None:
        y = y + b
    return y


def _convt_k3s2_fwd_impl(x, w, b, prec):
    w_flipped = w[::-1, ::-1, :, :]
    y = lax.conv_general_dilated(
        x, w_flipped, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=_DIMNUMS, precision=prec,
    )
    if b is not None:
        y = y + b
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _convt_k3s2_vjp(x, w, b, prec):
    """ConvT(k=3,s=2,p=1,op=1) with a hand-derived backward:

    dx = conv2d(g, w.transpose(ci<->co), stride=2, padding=1) — exact (the
    adjoint of the adjoint is the plain strided conv; no kernel flip, the
    index algebra lands on w[1+dy, 1+dx]).

    dW[a,b] = sum_n,i,j x[i + (a>1? wait-no)...] — per output phase
    (di,dj) of g, each kernel tap couples ONE shifted copy of x:
      dW[1,1] <- (g_ph00, shift 0,0)        dW[1,2] <- (g_ph01, 0,0)
      dW[1,0] <- (g_ph01, 0,1)              dW[2,1] <- (g_ph10, 0,0)
      dW[0,1] <- (g_ph10, 1,0)              dW[2,2] <- (g_ph11, 0,0)
      dW[2,0] <- (g_ph11, 0,1)              dW[0,2] <- (g_ph11, 1,0)
      dW[0,0] <- (g_ph11, 1,1)
    computed as nine [ci,co] einsum contractions over N*H*W — no
    activation reversal, no input dilation (XLA's derived wgrad reverses
    the full-res activations: 5.1 ms/step of standalone `reverse`)."""
    return _convt_k3s2_fwd_impl(x, w, b, prec)


def _convt_k3s2_vjp_fwd(x, w, b, prec):
    return _convt_k3s2_fwd_impl(x, w, b, prec), (x, w, b is None)


def _convt_k3s2_vjp_bwd(prec, res, g):
    x, w, no_bias = res
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    db = None if no_bias else jnp.sum(g, axis=(0, 1, 2))
    # input grad: plain stride-2 conv of g with the ci<->co-swapped kernel
    dx = lax.conv_general_dilated(
        g, w.transpose(0, 1, 3, 2), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)], dimension_numbers=_DIMNUMS, precision=prec,
    )
    # weight grad: phase-split g once (s2d2: phase-major (di,dj,co)), then
    # nine shifted correlations x . g_phase
    g4 = s2d2(g)  # (n, h, wd, 4co)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def corr(sh_i, sh_j, ph):
        xs = lax.dynamic_slice(xp, (0, sh_i, sh_j, 0), (n, h, wd, ci))
        gp = lax.dynamic_slice(g4, (0, 0, 0, ph * co), (n, h, wd, co))
        return jnp.einsum(
            "nhwc,nhwd->cd", xs, gp,
            precision=prec, preferred_element_type=jnp.float32,
        )

    # phase order in s2d2 channels: ph = di*2 + dj
    taps = {
        (1, 1): (0, 0, 0), (1, 2): (0, 0, 1), (1, 0): (0, 1, 1),
        (2, 1): (0, 0, 2), (0, 1): (1, 0, 2), (2, 2): (0, 0, 3),
        (2, 0): (0, 1, 3), (0, 2): (1, 0, 3), (0, 0): (1, 1, 3),
    }
    rows = []
    for a in range(3):
        row = []
        for bb in range(3):
            si, sj, ph = taps[(a, bb)]
            row.append(corr(si, sj, ph).astype(w.dtype))
        rows.append(jnp.stack(row, 0))
    dw = jnp.stack(rows, 0)
    return dx, dw, db


_convt_k3s2_vjp.defvjp(_convt_k3s2_vjp_fwd, _convt_k3s2_vjp_bwd)


def conv_transpose2d(
    x, w, b=None, *, stride=2, padding=1, output_padding=1, precision=None
):
    """torch.nn.ConvTranspose2d equivalent (fractionally-strided conv).

    x: (N,H,W,Cin); w: (kh,kw,Cin,Cout) — NOTE torch stores (Cin,Cout,kh,kw);
    converters must permute (2,3,0,1). Output spatial size is
    ``(i-1)*s - 2p + k + output_padding`` per axis (exactly 2x for the
    reference's k=3, s=2, p=1, op=1 upsamplers).

    Implemented as conv_general_dilated with lhs_dilation=s over the
    spatially-flipped kernel with padding (k-1-p, k-1-p+op) — this is the
    exact adjoint-of-conv definition torch uses, so fp32 results match the
    CPU-torch oracle to float accumulation order.
    """
    kh, kw = w.shape[0], w.shape[1]
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    prec = precision or _PRECISION
    eligible = (
        (kh, kw) == (3, 3)
        and s == (2, 2)
        and p == (1, 1)
        and (output_padding == 1 or output_padding == (1, 1))
    )
    if eligible:
        impl = _CONVT_IMPL
        if impl == "auto":
            impl = "adjoint"  # end-to-end winner; see selector comment
        if impl == "subpixel":
            return conv_transpose2d_subpixel(x, w, b, precision=prec)
        if impl == "d2s":
            return conv_transpose2d_d2s(x, w, b, precision=prec)
        if _CONVT_PHASE_BWD and prec != lax.Precision.HIGHEST:
            return _convt_k3s2_vjp(x, w, b, prec)
    op = (
        (output_padding, output_padding)
        if isinstance(output_padding, int)
        else tuple(output_padding)
    )
    w_flipped = w[::-1, ::-1, :, :]
    pad = [
        (kh - 1 - p[0], kh - 1 - p[0] + op[0]),
        (kw - 1 - p[1], kw - 1 - p[1] + op[1]),
    ]
    y = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=_DIMNUMS,
        precision=precision or _PRECISION,
    )
    if b is not None:
        y = y + b
    return y


# phase-packed lowering of the 7x7 stride-1 tiny-co "head" convs (the
# G/Encoder RGB output conv 64->3 at full res). Motivation (v5e trace,
# 512x256 bs32 GAN step, tools/trace_attrib.py): the head conv costs
# 17.8 ms fwd + ~14 ms bwd at 4.5 TFLOP/s because co=3 still pays a full
# 128-lane output tile — the conv runs EXACTLY as fast as a 64->128 conv
# (17.9 ms roofline), 125/128 lanes dead. The fix: compute a stride-4
# conv whose kernel embeds the 7x7 taps at all 4x4 output phase offsets
# (K4[a,b,:, (p,q,c)] = W[a-p, b-q, :, c]), giving co=16*3=48 in ONE
# output tile, then depth-to-space. ~3.2x padded FLOPs at ~42/3.2 = 13x
# better lane economics; no input transpose. Exact same arithmetic per
# output element (modulo float summation order).
_HEAD_PACK = _os.environ.get("HIMAN_HEAD_PACK", "1") == "1"
_HEAD_PACK_BWD = _os.environ.get("HIMAN_HEAD_PACK_BWD", "0") == "1"


def _phasepack_eligible(x, w, s, pad, prec):
    if prec == lax.Precision.HIGHEST or not _HEAD_PACK:
        return False
    kh, kw, ci, co = w.shape
    if (kh, kw) != (7, 7) or co > 16 or ci < 32:
        return False
    if s != (1, 1) or pad != [(0, 0), (0, 0)]:
        return False
    n, hp, wp, _ = x.shape
    return (hp - 6) % 4 == 0 and (wp - 6) % 4 == 0


def conv2d_phasepack(x, w, b=None, *, precision=None):
    """7x7 VALID stride-1 conv via a stride-4 phase-embedded kernel, with
    a custom VJP that phase-packs the input gradient too.

    x: pre-padded (N, Ho+6, Wo+6, Ci) with Ho,Wo % 4 == 0; w: (7,7,Ci,Co).
    out[4i+p, 4j+q, c] = sum_d xpad[4i+p+d] W[d] == stride-4 conv with
    K4[a,b,:,(p,q,c)] = W[a-p, b-q, :, c] (zero outside 0<=a-p<7), kernel
    extent 10, followed by depth-to-space.

    Backward: by default plain AD through the packed construction (the
    input grad lowers to a stride-4-dilated conv, dW through the embed's
    transpose). A custom VJP that phase-packs the input gradient as a
    second packed conv exists (HIMAN_HEAD_PACK_BWD=1) but measured
    SLOWER end-to-end (91.2 vs 92.5 img/s at the bench config): the
    packed dgrad's K=300 starvation + extra pads cost more than XLA's
    dilated lowering in-graph."""
    if _HEAD_PACK_BWD:
        return _conv2d_phasepack_vjp(x, w, b, precision or _PRECISION)
    return _conv2d_phasepack_impl(x, w, b, precision or _PRECISION)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv2d_phasepack_vjp(x, w, b, prec):
    return _conv2d_phasepack_impl(x, w, b, prec)


def _phasepack_vjp_fwd(x, w, b, prec):
    return _conv2d_phasepack_impl(x, w, b, prec), (x, w, b is None)


def _phasepack_vjp_bwd(prec, res, g):
    x, w, no_bias = res
    n, hp, wp, ci = x.shape
    db = None if no_bias else jnp.sum(g, axis=(0, 1, 2))
    dw = jax.vjp(lambda w_: _conv2d_phasepack_impl(x, w_, None, prec), w)[1](g)[0]
    # dx[m] = sum_d g[m-6+d'] flipW[d'] == VALID conv of pad(g, 6) with the
    # spatially-flipped, ci<->co-swapped kernel — phase-packed again. Extra
    # trailing zero padding rounds the output up to %4 (sliced off).
    eh = (-hp) % 4
    ew = (-wp) % 4
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (7,7,Co,Ci)
    gp = jnp.pad(g, ((0, 0), (6, 6 + eh), (6, 6 + ew), (0, 0)))
    dx = _conv2d_phasepack_impl(gp, wt, None, prec)[:, :hp, :wp]
    return dx, dw, db


def _conv2d_phasepack_impl(x, w, b, prec):
    kh, kw, ci, co = w.shape
    n, hp, wp, _ = x.shape
    ho, wo = hp - 6, wp - 6
    k4 = jnp.concatenate(
        [
            jnp.pad(w, ((p, 3 - p), (q, 3 - q), (0, 0), (0, 0)))
            for p in range(4)
            for q in range(4)
        ],
        axis=-1,
    )  # (10, 10, ci, 16*co), phase-major output channels
    y4 = lax.conv_general_dilated(
        x, k4, window_strides=(4, 4), padding="VALID",
        dimension_numbers=_DIMNUMS, precision=prec,
    )  # (n, ho/4, wo/4, 16*co)
    y = y4.reshape(n, ho // 4, wo // 4, 4, 4, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, ho, wo, co)
    if b is not None:
        y = y + b
    return y


# VGG block-1 packed path gate (see networks.Vgg19Features): perf tier
# only — the parity tier (Precision.HIGHEST) keeps the literal lowering.
def vgg_pack_enabled():
    return (
        _os.environ.get("HIMAN_VGG_PACK", "1") == "1"
        and _PRECISION != lax.Precision.HIGHEST
    )


# packed generator stem region (encode_input builds the stem input already
# s2d-by-2 packed; conv_in runs packed-io; down0 consumes packed) — perf
# tier only, exact math (see conv2d_s2d_packed_io)
def stem_pack_enabled():
    return (
        _os.environ.get("HIMAN_STEM_PACK", "1") == "1"
        and _PRECISION != lax.Precision.HIGHEST
    )


class PackedStemInput:
    """Marker wrapper: generator input pre-padded (reflect 3) and
    s2d-by-2 packed, (B, (H+6)/2, (W+6)/2, 4*ci). flax treats it as a
    pytree leaf container via registration below."""

    def __init__(self, packed):
        self.packed = packed


jax.tree_util.register_pytree_node(
    PackedStemInput,
    lambda t: ((t.packed,), None),
    lambda aux, ch: PackedStemInput(ch[0]),
)



_conv2d_phasepack_vjp.defvjp(_phasepack_vjp_fwd, _phasepack_vjp_bwd)

def s2d_kernel_3x3_same(w):
    """Packed-space kernel for a 3x3 stride-1 SAME conv on s2d-by-2 data.

    Packed conv: y2[i,j,(p,q,co)] = sum_{a,b,(r,s,ci)}
        x2[i+a-1, j+b-1, (r,s,ci)] * w[2a+r-p-1, 2b+s-q-1, ci, co]
    (zero taps outside [0,3)), which equals the original SAME conv at
    pixel (2i+p, 2j+q): zero padding in packed space == zero original
    pixels. Returns (3, 3, 4ci, 4co), channels phase-major (r,s,ci) /
    (p,q,co) matching ``_s2d``."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    z = jnp.zeros_like(w[0, 0])

    def tap(dy, dx):
        if 0 <= dy < 3 and 0 <= dx < 3:
            return w[dy, dx]
        return z

    rows = []
    for a in range(3):
        row = []
        for b in range(3):
            m = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    jnp.stack(
                                        [
                                            tap(2 * a + r - p - 1, 2 * b + s - q - 1)
                                            for q in range(2)
                                        ],
                                        0,
                                    )
                                    for p in range(2)
                                ],
                                0,
                            )
                            for s in range(2)
                        ],
                        0,
                    )
                    for r in range(2)
                ],
                0,
            )  # (r, s, p, q, ci, co)
            m = m.transpose(0, 1, 4, 2, 3, 5).reshape(4 * ci, 4 * co)
            row.append(m)
        rows.append(jnp.stack(row, 0))
    return jnp.stack(rows, 0)


def conv2d_s2d_same_packed(x2, w, b=None, *, precision=None):
    """3x3 stride-1 SAME conv computed entirely in s2d-by-2 coordinates:
    input AND output stay packed (N, H/2, W/2, 4C). ~4x padded FLOPs vs
    the unpacked conv but full 128-lane tiles on both contraction and
    output — a large net win for the sub-lane channel counts of VGG
    block1 (64ch at full res ran at 37-70 TF/s; see Vgg19Features)."""
    prec = precision or _PRECISION
    k2 = s2d_kernel_3x3_same(w)
    y2 = lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMNUMS, precision=prec,
    )
    if b is not None:
        y2 = y2 + jnp.tile(b, 4)
    return y2


def _s2d_kernel_s1_valid(w):
    """Packed kernel for stride-1 VALID conv on pre-padded s2d-by-2 data,
    output STAYS packed: K[a,b,(r,s,ci),(p,q,co)] = w[2a+r-p, 2b+s-q]
    (zero outside [0,k)). ka = (k+2)//2. Same construction as
    ``conv2d_s2d`` stride-1 (nnops) without the trailing depth-to-space."""
    kh, kw, ci, co = w.shape
    ka = (kh + 2) // 2
    z = jnp.zeros_like(w[0, 0])

    def tap(dy, dx):
        if 0 <= dy < kh and 0 <= dx < kw:
            return w[dy, dx]
        return z

    rows = []
    for a in range(ka):
        row = []
        for bb in range(ka):
            m = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    jnp.stack(
                                        [tap(2 * a + r - p, 2 * bb + s - q) for q in range(2)],
                                        0,
                                    )
                                    for p in range(2)
                                ],
                                0,
                            )
                            for s in range(2)
                        ],
                        0,
                    )
                    for r in range(2)
                ],
                0,
            )  # (r, s, p, q, ci, co)
            m = m.transpose(0, 1, 4, 2, 3, 5).reshape(4 * ci, 4 * co)
            row.append(m)
        rows.append(jnp.stack(row, 0))
    return jnp.stack(rows, 0)  # (ka, ka, 4ci, 4co)


def conv2d_s2d_packed_io(x2, w, b=None, *, precision=None):
    """Stride-1 VALID conv on PRE-PADDED s2d-by-2 packed input, packed
    output (N, Hp/2-ka+1, Wp/2-ka+1, 4Co) covering the full VALID output
    (requires even padded dims and even output dims). Used by the packed
    generator stem: the 7x7 39->64 conv at 512x256 runs at 58-80 TF/s
    unpacked (co=64 half-fills the lanes); packed it is 624->256 at
    (16*4)/49 = 1.31x padded FLOPs with full tiles."""
    prec = precision or _PRECISION
    k2 = _s2d_kernel_s1_valid(w)
    y2 = lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DIMNUMS, precision=prec,
    )
    if b is not None:
        y2 = y2 + jnp.tile(b, 4)
    return y2


def conv2d_s2d_stride2_packed_in(x2, w, b=None, *, precision=None):
    """3x3 stride-2 pad-1 conv consuming s2d-by-2 PACKED input, producing
    the natural UNPACKED output (stride 2 lands on the packed grid):
    out[i,j] = sum_{dy,dx} x[2i+dy-1, 2j+dx-1] w[dy,dx] with
    K[a,b,(r,s,ci),co] = w[2a+r-1, 2b+s-1], packed padding ((1,0),(1,0)).
    The packed-in form is the exit from the packed stem region (down0)."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    prec = precision or _PRECISION
    z = jnp.zeros_like(w[0, 0])

    def tap(dy, dx):
        if 0 <= dy < 3 and 0 <= dx < 3:
            return w[dy, dx]
        return z

    rows = []
    for a in range(2):
        row = []
        for bb in range(2):
            m = jnp.stack(
                [
                    jnp.stack(
                        [tap(2 * a + r - 1, 2 * bb + s - 1) for s in range(2)], 0
                    )
                    for r in range(2)
                ],
                0,
            )  # (r, s, ci, co)
            row.append(m.reshape(4 * ci, co))
        rows.append(jnp.stack(row, 0))
    k2 = jnp.stack(rows, 0)  # (2, 2, 4ci, co)
    y = lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=_DIMNUMS, precision=prec,
    )
    if b is not None:
        y = y + b
    return y


def _in_packed_stats(x2, c, eps):
    """Packed-IN statistics: fp32 (mean4, rstd4) broadcast to the packed
    channel view [N,1,1,4c]."""
    n, h2, w2, c4 = x2.shape
    xf = x2.astype(jnp.float32)
    xv = xf.reshape(n, h2, w2, 4, c)
    s = jnp.sum(xv, axis=(1, 2, 3))
    ss = jnp.sum(xv * xv, axis=(1, 2, 3))
    cnt = float(h2 * w2 * 4)
    mean = s / cnt
    var = jnp.maximum(ss / cnt - mean * mean, 0.0)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    rstd4 = jnp.tile(lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
    return mean4, rstd4


def instance_norm_packed(x2, c, *, eps=1e-5):
    """InstanceNorm(affine=False) on s2d-by-2 packed activations: the
    per-(N, original-channel) spatial statistics fold the 4 phase groups
    together; the normalize stays in the packed view. Exact same math as
    unpacking -> instance_norm (modulo fp reduction order)."""
    if _IN_CUSTOM_VJP and _PRECISION != lax.Precision.HIGHEST:
        return _in_packed_act(x2, c, eps, "none")
    mean4, rstd4 = _in_packed_stats(x2, c, eps)
    # barriered re-read: see instance_norm — keeps the fp32 copy virtual
    xn = lax.optimization_barrier(x2).astype(jnp.float32)
    return ((xn - mean4) * rstd4).astype(x2.dtype)


def instance_norm_packed_act(x2, c, act, *, eps=1e-5):
    """Packed IN + folded activation — the packed stem's analogue of
    ``instance_norm_act`` (same byte-diet custom VJP rationale)."""
    if _IN_CUSTOM_VJP and _PRECISION != lax.Precision.HIGHEST:
        return _in_packed_act(x2, c, eps, act)
    return _apply_act(instance_norm_packed(x2, c, eps=eps), act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _in_packed_act(x2, c, eps, act):
    """Packed-IN [+act] byte-diet custom VJP: jax-native autodiff saved an
    fp32 [N,H2,W2,4,c] view AND the fp32 centered tensor (2.1 GB at the
    flagship stem, reports/byte_ledger_r04.json); this saves only
    (x2 bf16, mean4, rstd4) and recomputes xhat + the activation mask."""
    y, _, _ = _in_packed_fwd_impl(x2, c, eps, act)
    return y


def _in_packed_fwd_impl(x2, c, eps, act):
    mean4, rstd4 = _in_packed_stats(x2, c, eps)
    xn = lax.optimization_barrier(x2).astype(jnp.float32)
    y = ((xn - mean4) * rstd4).astype(x2.dtype)
    return _apply_act(y, act), mean4, rstd4


def _in_packed_fwd(x2, c, eps, act):
    y, mean4, rstd4 = _in_packed_fwd_impl(x2, c, eps, act)
    return y, (x2, mean4, rstd4)


def _in_packed_bwd(c, eps, act, res, dy):
    x2, mean4, rstd4 = res
    n, h2, w2, c4 = x2.shape
    xf = lax.optimization_barrier(x2).astype(jnp.float32)
    xhat = (xf - mean4) * rstd4
    g = dy.astype(jnp.float32)
    if act == "relu":
        g = jnp.where(xhat > 0, g, 0.0)
    elif act == "lrelu":
        g = jnp.where(xhat > 0, g, g * 0.2)
    cnt = float(h2 * w2 * 4)
    # reductions fold the 4 phase groups per original channel, like fwd
    gs = jnp.sum(g.reshape(n, h2, w2, 4, c), axis=(1, 2, 3))
    gxs = jnp.sum((g * xhat).reshape(n, h2, w2, 4, c), axis=(1, 2, 3))
    g_mean = jnp.tile(gs / cnt, (1, 4))[:, None, None, :]
    gx_mean = jnp.tile(gxs / cnt, (1, 4))[:, None, None, :]
    dx = rstd4 * (g - g_mean - xhat * gx_mean)
    return (dx.astype(x2.dtype),)


_in_packed_act.defvjp(_in_packed_fwd, _in_packed_bwd)


def mask_packed_border(x2, c):
    """Zero the half-phase border of a packed tensor whose grid covers one
    original pixel beyond the image on each side ("grid B": block i holds
    originals (2i-1, 2i)). Zeroes (row 0, phase 0), (last row, phase 1)
    and same on W — producing exactly the zero-padded-by-1 packed form a
    SAME conv downstream expects."""
    n, h2, w2, c4 = x2.shape
    xv = x2.reshape(n, h2, w2, 2, 2, c)
    rm = jnp.ones((h2, 2), x2.dtype)
    rm = rm.at[0, 0].set(0).at[h2 - 1, 1].set(0)
    cm = jnp.ones((w2, 2), x2.dtype)
    cm = cm.at[0, 0].set(0).at[w2 - 1, 1].set(0)
    xv = xv * rm[None, :, None, :, None, None] * cm[None, None, :, None, :, None]
    return xv.reshape(n, h2, w2, c4)


def phase_max_pool_packed(x2, c):
    """MaxPool2d(2, 2) on s2d-by-2 packed data == max over the 4 phase
    groups — returns UNPACKED (N, H/2, W/2, C) at pool-output resolution
    with zero data movement beyond the elementwise max. Ties share
    gradient (vs torch first-max routing): fp-rare, perf path only."""
    n, h2, w2, _ = x2.shape
    return x2.reshape(n, h2, w2, 4, c).max(axis=3)


def _s2d(x):
    """Space-to-depth by 2, NHWC, phase-major (row_phase, col_phase, C)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


s2d2 = _s2d  # public alias (packed VGG block 1, tests)


def d2s2(x2):
    """Depth-to-space by 2 — exact inverse of ``s2d2`` (phase-major)."""
    n, h2, w2, c4 = x2.shape
    c = c4 // 4
    x = x2.reshape(n, h2, w2, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, c)


def conv2d_s2d(x, w, b=None, *, stride=1, precision=None):
    """k×k VALID conv computed in space-to-depth-by-2 coordinates.

    Motivation (v5e profiling, 512x256 bs32 GAN step): the reference's
    7×7 low-channel stems (39→64) and 4×4-stride-2 PatchGAN stems (39→64)
    are MXU-starved — XLA picks batch-minor layouts for the sub-lane
    channel counts and the weight-gradient convolutions degenerate
    (12.7 ms for the 7×7×39×64 stem wgrad alone). Folding 2×2 space into
    channels turns them into k'=⌈(k+1)/2⌉ convs at 4× the channels:
    7×7×39→64 becomes 4×4×156→256 (output phases packed in channels,
    depth-to-space at the end), and 4×4-s2 becomes 2×2×156→64 with no
    output phases. Identical arithmetic modulo float summation order;
    the padded-out-of-range taps are structural zeros.

    x: ALREADY-PADDED input (N,Hp,Wp,Ci) with even Hp,Wp; stride ∈ {1,2}.
    stride 1 additionally requires even output dims.
    """
    kh, kw, ci, co = w.shape
    n, hp, wp, _ = x.shape
    prec = precision or _PRECISION
    xs = _s2d(x)
    z = jnp.zeros_like(w[0, 0])

    def tap(dh, dw):
        if 0 <= dh < kh and 0 <= dw < kw:
            return w[dh, dw]
        return z

    if stride == 1:
        # W'[a,b, (r,s)·ci, (p,q)·co] = w[2a+r-p, 2b+s-q] — the ONE
        # builder shared with the packed-stem path
        wp_k = _s2d_kernel_s1_valid(w)  # (ka, ka, 4ci, 4co)
        ys = lax.conv_general_dilated(
            xs, wp_k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DIMNUMS, precision=prec,
        )
        nb, ho2, wo2, _ = ys.shape
        y = ys.reshape(nb, ho2, wo2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(nb, 2 * ho2, 2 * wo2, co)
    elif stride == 2:
        ka = (kh + 1) // 2
        # out[i,j] = Σ_{a,b,r,s} xs[i+a, j+b, (r,s)ci] · w[2a+r, 2b+s]
        rows = []
        for a in range(ka):
            row = []
            for bb in range(ka):
                m = jnp.stack(
                    [jnp.stack([tap(2 * a + r, 2 * bb + s) for s in range(2)], 0) for r in range(2)],
                    0,
                )  # (r, s, ci, co)
                row.append(m.reshape(4 * ci, co))
            rows.append(jnp.stack(row, 0))
        wp_k = jnp.stack(rows, 0)  # (ka, ka, 4ci, co)
        y = lax.conv_general_dilated(
            xs, wp_k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DIMNUMS, precision=prec,
        )
    else:
        raise ValueError(f"conv2d_s2d: unsupported stride {stride}")
    if b is not None:
        y = y + b
    return y


# space-to-depth policy for low-channel convs on the perf path — a
# comma-set of site classes: "stem" (7x7 s1, ci<64: G/encoder input convs),
# "head" (7x7 s1, co<64: RGB output convs), "d" (4x4 s2, ci<64: PatchGAN
# layer0). "0"/"" disables, "all" = every class.
#
# Measured END-TO-END (full GAN step 512x256 bs32 bf16, v5e, 2026-08-16,
# baseline 82.98 img/s): stem 81.07, head 76.40, d 74.68, all 78.09 —
# every class LOSES despite healthier matmul shapes (e.g. the stem wgrad
# becomes [4,4,156,256] instead of the 12.7 ms/step [7,7,39,64] fusion):
# the s2d/d2s transposes of full-res tensors and the disturbed fusion
# schedule cost more than the MXU fill buys. Default OFF; opt in with
# HIMAN_S2D_STEMS=stem,head,d to re-test on other shapes.
_S2D_STEMS = _os.environ.get("HIMAN_S2D_STEMS", "0")


def _s2d_classes():
    v = _S2D_STEMS
    if v in ("0", ""):
        return set()
    if v in ("1", "all"):
        return {"stem", "head", "d"}
    return set(p.strip() for p in v.split(","))


def _s2d_eligible_padded(x, w, s, pad, prec):
    """Eligibility for the s2d route given conv2d's normalized stride
    tuple and [(ph,ph'),(pw,pw')] padding (applied to x before s2d)."""
    if prec == lax.Precision.HIGHEST:
        return False
    classes = _s2d_classes()
    if not classes:
        return False
    kh, kw, ci, co = w.shape
    if ci >= 64 and co >= 64:
        return False  # healthy shapes: XLA's direct lowering is fine
    if s[0] != s[1]:
        return False
    if s[0] == 1:
        cls = "stem" if ci < 64 else "head"
    else:
        cls = "d"
    if cls not in classes:
        return False
    h = x.shape[1] + pad[0][0] + pad[0][1]
    wd = x.shape[2] + pad[1][0] + pad[1][1]
    if h % 2 or wd % 2:
        return False
    if s[0] == 1:
        return (kh, kw) == (7, 7) and (h - 6) % 2 == 0 and (wd - 6) % 2 == 0
    if s[0] == 2:
        return (kh, kw) == (4, 4)
    return False


def instance_norm(x, *, eps=1e-5):
    """torch.nn.InstanceNorm2d(affine=False): per-(N,C) spatial standardize.

    Biased variance (torch IN normalizes by HW, not HW-1), eps inside the
    sqrt, no learned affine (the reference uses ``--norm instance`` which is
    InstanceNorm2d(affine=False) — SURVEY.md §3.2 weights_init note).

    Statistics are always accumulated in fp32 — under the bf16 training
    policy the conv FLOPs stay bf16 on the MXU while the spatial mean/var
    reduction keeps full precision (bf16 mantissa is too short for
    HW-sized accumulations).

    Parity path (Precision.HIGHEST): torch's literal two-pass form
    (mean, then E[(x-mean)^2]). Perf path: ONE fused pass computing
    (sum, sum-of-squares) so the (huge, full-res) input is read once for
    statistics instead of twice — var = E[x^2]-E[x]^2 in fp32, clamped at
    0 against cancellation. Profiling (v5e, 512x256 bs32 GAN step) put the
    two-pass convert+reduce fusions at ~20% of step time.
    """
    if _PRECISION == lax.Precision.HIGHEST:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
    if _IN_CUSTOM_VJP and x.ndim == 4:
        return _in_act(x, eps, "none")
    mean, rstd = _in_stats(x, eps)
    # re-read x for the normalize through an optimization barrier: without
    # it XLA CSEs this cast with the stats pass's and MATERIALIZES the
    # fp32 copy of the full-res tensor to HBM (measured 7.2 ms/step of
    # convert_element_type at 512x256 bs32); barriered, each cast fuses
    # into its consumer and the fp32 tensor never exists in memory.
    xn = lax.optimization_barrier(x).astype(jnp.float32)
    return ((xn - mean) * rstd).astype(x.dtype)


def _in_stats(x, eps):
    """Perf-path IN statistics: fp32 (mean, rstd) keepdims over (H, W)."""
    n, h, w, c = x.shape
    f = 128 // c if (c < 128 and 128 % c == 0) else 1
    if _IN_LANE_FOLD and f > 1 and w % f == 0:
        # Lane-fold the STATS reduce only: a spatial reduce keeping (N,C)
        # runs at c/128 of HBM bandwidth when c under-fills the 128 vector
        # lanes (measured 4.5 ms vs the 2.0 ms roofline for IN fwd on
        # [32,256,512,64]). (W, c) -> (W/f, f*c) is a free bitcast (W is
        # adjacent to the minor C axis), so the reduction runs full-lane;
        # the normalize stays in the original view so it keeps fusing into
        # its consumers.
        xv = x.reshape(n, h, w // f, f * c).astype(jnp.float32)
        s = jnp.sum(xv, axis=(1, 2)).reshape(n, f, c).sum(axis=1)
        ss = jnp.sum(xv * xv, axis=(1, 2)).reshape(n, f, c).sum(axis=1)
        cnt = float(h * w)
        mean = (s / cnt)[:, None, None, :]
        var = jnp.maximum((ss / cnt)[:, None, None, :] - mean * mean, 0.0)
    else:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        msq = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
        var = jnp.maximum(msq - mean * mean, 0.0)
    return mean, lax.rsqrt(var + eps)


def _spatial_mean2(a, b):
    """Means of two fp32 [N,H,W,C] tensors over (H, W), keepdims — the IN
    backward's reduction pair, lane-folded like the forward stats when C
    under-fills the 128 vector lanes."""
    n, h, w, c = a.shape
    f = 128 // c if (c < 128 and 128 % c == 0) else 1
    cnt = float(h * w)
    if _IN_LANE_FOLD and f > 1 and w % f == 0:
        av = a.reshape(n, h, w // f, f * c)
        bv = b.reshape(n, h, w // f, f * c)
        sa = jnp.sum(av, axis=(1, 2)).reshape(n, f, c).sum(axis=1)
        sb = jnp.sum(bv, axis=(1, 2)).reshape(n, f, c).sum(axis=1)
        return (sa / cnt)[:, None, None, :], (sb / cnt)[:, None, None, :]
    return (
        jnp.mean(a, axis=(1, 2), keepdims=True),
        jnp.mean(b, axis=(1, 2), keepdims=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _in_act(x, eps, act):
    """IN(affine=False) [+ relu/lrelu] with a byte-diet custom VJP.

    jax's native VJP of the fp32-stats normalize saves TWO fp32 copies of
    the full-res input (the upcast and the centered tensor) per norm site
    — 11.1 GB of the flagship step's 27.9 GB semantic residual set
    (reports/byte_ledger_r04.json, VERDICT r3 next#2). This VJP saves
    only (x bf16, mean, rstd): x is the producing conv's output, which
    the conv's weight-grad keeps alive anyway, so the marginal saved
    bytes per site are the [N,1,1,C] stats. Backward recomputes xhat (one
    fused mul-add) and, when the activation is folded in, the activation
    mask — so IN+act together save NOTHING full-res beyond the conv
    output. Same closed-form dx as autodiff:
        dx = rstd * (g - mean(g) - xhat * mean(g * xhat))
    computed in fp32 with the forward's lane-folded reductions.
    Activation-grad convention at exactly 0 matches torch (grad 0), vs
    jnp.maximum's propagate-on-tie; bf16 ties are measure-zero and the
    parity suite pins the HIGHEST path, which doesn't route here."""
    y, _, _ = _in_act_fwd_impl(x, eps, act)
    return y


def _apply_act(y, act):
    if act == "relu":
        return jnp.maximum(y, 0)
    if act == "lrelu":
        return jnp.where(y >= 0, y, y * jnp.asarray(0.2, y.dtype))
    return y


def _in_act_fwd_impl(x, eps, act):
    mean, rstd = _in_stats(x, eps)
    xn = lax.optimization_barrier(x).astype(jnp.float32)
    y = ((xn - mean) * rstd).astype(x.dtype)
    return _apply_act(y, act), mean, rstd


def _in_act_fwd(x, eps, act):
    y, mean, rstd = _in_act_fwd_impl(x, eps, act)
    return y, (x, mean, rstd)


def _in_act_bwd(eps, act, res, dy):
    x, mean, rstd = res
    xf = lax.optimization_barrier(x).astype(jnp.float32)
    xhat = (xf - mean) * rstd
    g = dy.astype(jnp.float32)
    if act == "relu":
        g = jnp.where(xhat > 0, g, 0.0)
    elif act == "lrelu":
        g = jnp.where(xhat > 0, g, g * 0.2)
    g_mean, gx_mean = _spatial_mean2(g, g * xhat)
    dx = rstd * (g - g_mean - xhat * gx_mean)
    return (dx.astype(x.dtype),)


_in_act.defvjp(_in_act_fwd, _in_act_bwd)

# Byte-diet custom VJP for IN (+folded activation), CONFIG-KEYED.
# Measured END-TO-END (v5e, 2026-08-19): flagship bs32 512x256 custom
# 93.04 vs native 93.44 img/s (reports/remat_sweep_r04.jsonl) — XLA's
# auto-remat already keeps the deletable bytes virtual there and the
# explicit recompute schedules 0.4% worse; but the BANDWIDTH-bound 1024p
# LocalEnhancer materializes its fp32 IN converts (TRACE_1024p_r04.txt:
# ~19 ms of convert_element_type) and the custom backward WINS +7.1%
# (10.40 -> 11.14 img/s, reports/bench_1024p_r04.jsonl). The model
# factory keys the gate on the config (netG=='local' -> on); an explicit
# HIMAN_IN_CUSTOM_VJP=0/1 env var wins over the auto choice.
import os as _os

_IN_CUSTOM_VJP_ENV = _os.environ.get("HIMAN_IN_CUSTOM_VJP")
_IN_CUSTOM_VJP = _IN_CUSTOM_VJP_ENV == "1"

_CONV_REFLECT_FUSED_ENV = _os.environ.get("HIMAN_CONV_REFLECT_FUSED")
_CONV_REFLECT_FUSED = _CONV_REFLECT_FUSED_ENV == "1"


def set_in_custom_vjp(on: bool) -> None:
    """Config-keyed auto gate (models/factory.py). No-op when the user
    set HIMAN_IN_CUSTOM_VJP explicitly."""
    global _IN_CUSTOM_VJP
    if _IN_CUSTOM_VJP_ENV is None:
        _IN_CUSTOM_VJP = bool(on)


def get_in_custom_vjp() -> bool:
    """Current IN-custom-VJP gate (for save/restore and per-model
    re-pinning via precision_scope)."""
    return _IN_CUSTOM_VJP


# Fused reflect-pad conv (conv2d_reflect's strip-correction form),
# CONFIG-KEYED — the root cause of the round-4 93.5 -> 86.9 headline
# regression: the fused form landed in the r4 end-of-round snapshot
# WITHOUT an end-to-end measurement and engaged on every perf-tier
# generator. Measured END-TO-END this round (v5e, same session,
# reports/bench_variance_r05.jsonl): flagship bs32 512x256 fused 86.93
# vs literal 93.46 img/s (-7.0% — the flagship is MXU-bound and XLA
# already folds the materialized reflect copy into the conv while the
# strip form adds 4 tiny poorly-shaped convs + a 5-way add per site);
# 1024p LocalEnhancer measured separately (see factory keying / the
# bench_1024p_r05 artifact). HIMAN_CONV_REFLECT_FUSED=0/1 wins over the
# config auto-key (resolved above next to the IN gate).


def set_conv_reflect_fused(on: bool) -> None:
    """Config-keyed auto gate (models/factory.py). No-op when the user
    set HIMAN_CONV_REFLECT_FUSED explicitly."""
    global _CONV_REFLECT_FUSED
    if _CONV_REFLECT_FUSED_ENV is None:
        _CONV_REFLECT_FUSED = bool(on)


def get_conv_reflect_fused() -> bool:
    return _CONV_REFLECT_FUSED


def instance_norm_act(x, act, *, eps=1e-5):
    """Fused IN + activation ('none'|'relu'|'lrelu'): on the perf tier the
    custom VJP folds the activation mask into the norm backward so the
    pair saves no full-res residual beyond the producing conv's output.
    Parity tier (Precision.HIGHEST) composes the literal torch forms."""
    if _PRECISION != lax.Precision.HIGHEST and _IN_CUSTOM_VJP and x.ndim == 4:
        return _in_act(x, eps, act)
    y = instance_norm(x, eps=eps)
    if act == "relu":
        return relu(y)
    if act == "lrelu":
        return leaky_relu(y, 0.2)
    return y


def batch_norm_inference(x, mean, var, gamma, beta, *, eps=1e-5):
    """torch.nn.BatchNorm2d eval-mode (running stats), NHWC."""
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * gamma + beta


_REFLECT_ZERO = _os.environ.get("HIMAN_REFLECT_ZERO") == "1"


def reflect_pad(x, pad):
    """torch.nn.ReflectionPad2d(pad) on NHWC. On the perf tier the VJP is
    a fused Pallas fold (ops/pallas/reflect_pad.py) — identical math, one
    read+write instead of XLA's slice/rev/add chain.

    HIMAN_REFLECT_ZERO=1 is a PERF-DIAGNOSTIC ONLY knob: zero padding
    instead of reflect (XLA folds a constant lax.pad into the consumer
    conv, eliminating the materialized pad copy and its VJP fold) —
    CHANGES MODEL SEMANTICS; used to bound what a fused reflect-conv
    could save before building one."""
    if _REFLECT_ZERO:
        return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    if _PRECISION != lax.Precision.HIGHEST and x.ndim == 4:
        from .pallas import config as _pc

        if _pc.pad_bwd_enabled():
            from .pallas.reflect_pad import (
                reflect_pad_bwd_eligible,
                reflect_pad_fused_bwd,
            )

            if reflect_pad_bwd_eligible(x.shape, pad, x.dtype):
                return reflect_pad_fused_bwd(x, pad)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def batch_norm(x, scale=None, bias=None, *, eps=1e-5):
    """torch.nn.BatchNorm2d(affine=True) in TRAIN mode: per-channel
    standardize over (N,H,W), biased variance, eps inside the sqrt, then
    the learned affine. The reference's ``--norm batch`` maps to
    ``get_norm_layer('batch')`` = BatchNorm2d(affine=True) [L].

    Batch statistics are ALWAYS used: pix2pixHD never calls ``.eval()``
    (its test drivers run modules in train mode), so batch stats govern
    the reference's inference too — running averages are dead state there
    and deliberately not tracked here (documented divergence with zero
    observable effect through the reference's own drivers).

    Statistics accumulate in fp32 under the bf16 policy (same rationale
    as instance_norm: NHW-sized reductions exceed bf16 mantissa)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


# 3x3-s2 avgpool implementation: "slices" decomposes the overlapping
# window into strided slices + adds (fusable elementwise, fast emitter);
# "reduce_window" is the literal lowering. Motivation: XLA's overlapping-
# window reduce_window emitter runs the D cond/RGB pyramid pools at
# 71 GB/s effective (3.14 ms/step, TRACE_r03_baseline.txt). Measured
# END-TO-END (full GAN step 512x256 bs32 bf16, v5e, 2026-08-17):
# slices 91.08 img/s (x2 runs) vs reduce_window 92.34 — the strided
# slices/pads break the one-hot->pool producer fusion and cost more than
# the slow emitter they replace. Default OFF; fwd+grad parity vs the
# literal form is ulp-tight (tests/test_nnops_vs_torch.py).
_POOL_IMPL = _os.environ.get("HIMAN_POOL_IMPL", "reduce_window")


def _avg_pool_3x3s2_reduce_window(x):
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad)
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pad)
    return summed / counts


def _avg_pool_3x3s2_slices(x):
    """Overlapping k=3 s=2 p=1 window sums from non-overlapping strided
    slices: P[j] = x[2j-1] + x[2j] + x[2j+1] = ev[j] + od[j] + od[j-1]
    with ev = x[0::2], od = x[1::2] (od[-1] := 0). Separable over H then
    W; count_include_pad=False via a constant inverse-count map (edge
    windows have 2 taps per clipped axis, interior 3)."""
    n, h, w, c = x.shape
    ev = x[:, :, 0::2, :]
    od = x[:, :, 1::2, :]
    p = ev + od + jnp.pad(od[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    ev = p[:, 0::2]
    od = p[:, 1::2]
    s = ev + od + jnp.pad(od[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    h2, w2 = s.shape[1], s.shape[2]
    rows = jnp.full((h2,), 3.0, jnp.float32).at[0].set(2.0)
    cols = jnp.full((w2,), 3.0, jnp.float32).at[0].set(2.0)
    inv = (1.0 / (rows[:, None] * cols[None, :]))[None, :, :, None]
    return (s.astype(jnp.float32) * inv).astype(x.dtype)


def avg_pool_3x3s2(x):
    """torch.nn.AvgPool2d(kernel=3, stride=2, padding=1,
    count_include_pad=False) — the multiscale-D inter-scale downsampler
    (SURVEY.md §3.2 MultiscaleDiscriminator)."""
    h, w = x.shape[1], x.shape[2]
    if _POOL_IMPL == "slices" and h % 2 == 0 and w % 2 == 0:
        return _avg_pool_3x3s2_slices(x)
    return _avg_pool_3x3s2_reduce_window(x)


def _mp2_forward(x):
    n, h, w, c = x.shape
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(xr, axis=(2, 4))


@jax.custom_vjp
def _max_pool_2x2_masked(x):
    """torch.nn.MaxPool2d(2, 2) — used by VGG19 features.

    Forward is a reshape-max; backward routes the cotangent to the FIRST
    maximal element in torch's window scan order ((0,0),(0,1),(1,0),(1,1))
    as pure elementwise masks — replacing XLA's select-and-scatter lowering
    (measured ~5 ms/step of the 512x256 GAN step) with fusable selects.
    Tie-routing matches torch CPU (argmax = first max), which matters after
    ReLU where exact-zero ties are common.
    """
    return _mp2_forward(x)


def _mp2_fwd(x):
    # save ONLY x (already live as the next conv's input); the window max
    # is recomputed in bwd from the four slices — no extra residual tensor
    return _mp2_forward(x), x


def _mp2_bwd(x, g):
    n, h, w, c = x.shape
    x00 = x[:, 0::2, 0::2]
    x01 = x[:, 0::2, 1::2]
    x10 = x[:, 1::2, 0::2]
    x11 = x[:, 1::2, 1::2]
    y = jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))
    m00 = x00 == y
    m01 = (x01 == y) & ~m00
    m10 = (x10 == y) & ~(m00 | m01)
    m11 = ~(m00 | m01 | m10)
    z = jnp.zeros_like(g)
    row0 = jnp.stack([jnp.where(m00, g, z), jnp.where(m01, g, z)], axis=3)
    row1 = jnp.stack([jnp.where(m10, g, z), jnp.where(m11, g, z)], axis=3)
    dx = jnp.stack([row0, row1], axis=2)  # (n, h/2, 2, w/2, 2, c)
    return (dx.reshape(n, h, w, c),)


_max_pool_2x2_masked.defvjp(_mp2_fwd, _mp2_bwd)

_MAXPOOL_IMPL = _os.environ.get("HIMAN_MAXPOOL_IMPL", "sas")


def max_pool_2x2(x):
    """torch.nn.MaxPool2d(2, 2). Impl selected by HIMAN_MAXPOOL_IMPL:
    'masked' (custom VJP, elementwise first-max bwd) or 'sas'
    (reduce_window; XLA lowers the bwd to select-and-scatter).

    Measured END-TO-END (full GAN step 512x256 bs32 bf16, v5e,
    2026-08-16): sas 82.98 img/s, masked saving (x,y) 76.58, masked
    recomputing the max in bwd 75.79 — the strided-slice + interleave
    backward loses more than select-and-scatter's ~5 ms/step costs, so
    'sas' is the default. Both backwards route ties to the first max in
    torch's scan order (SelectAndScatter's GE-select picks the first
    match too), golden-tested vs torch CPU."""
    if _MAXPOOL_IMPL == "sas":
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return _max_pool_2x2_masked(x)


def upsample_nearest_2x(x):
    """torch.nn.Upsample(scale_factor=2, mode='nearest'), NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean_2d(feat, seg_ids, num_segments):
    """Instance-wise average pooling (pix2pixHD Encoder, SURVEY.md §3.2).

    feat: (N,H,W,C); seg_ids: (N,H,W) int32 in [0, num_segments). Returns
    (N,H,W,C) where every pixel holds the mean of its segment — the
    jit-able, static-shape equivalent of torch's loop over
    ``inst.unique()``. Callers map raw Cityscapes instance ids into the
    static segment range (see models/networks.py Encoder).
    """
    n, h, w, c = feat.shape
    flat_feat = feat.reshape(n, h * w, c)
    flat_ids = seg_ids.reshape(n, h * w)

    def per_image(f, ids):
        # accumulate in f32 regardless of compute dtype: a bf16 running
        # sum saturates at 256 (256+1 rounds back to 256), so counts for
        # any >256-px instance (road/sky/building are 10k-100k px) stall
        # and the means come out wrong by large factors
        f32 = f.astype(jnp.float32)
        sums = jax.ops.segment_sum(f32, ids, num_segments=num_segments)
        counts = jax.ops.segment_sum(
            jnp.ones((f.shape[0],), jnp.float32), ids, num_segments=num_segments
        )
        means = (sums / jnp.maximum(counts, 1.0)[:, None]).astype(f.dtype)
        return means[ids]

    out = jax.vmap(per_image)(flat_feat, flat_ids)
    return out.reshape(n, h, w, c)
