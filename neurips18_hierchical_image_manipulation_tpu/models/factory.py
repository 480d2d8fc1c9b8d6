"""Model factory — mirrors ``models/models.py::create_model`` (SURVEY C11).

Where the reference wraps in nn.DataParallel for multi-GPU, here the
parallelism lives in the train step (train/steps.py make_dp_train_step),
so create_model just dispatches on opt.model.
"""

from __future__ import annotations


def create_model(opt):
    from ..ops import nnops
    from ..ops.pallas import config as pallas_config

    pallas_config.set_enabled(not getattr(opt, "no_pallas", False))
    # Conv/MXU precision follows the config (--conv_precision, default
    # 'auto'): bf16 configs get the perf tier (Precision.DEFAULT — packed
    # stems, phasepack, lane padding, encode kernel, IN custom VJP gates
    # all key off it), fp32 configs keep the bit-parity tier
    # (Precision.HIGHEST vs the CPU-torch oracle). Before round 4 the CLI
    # drivers never set this and real --dtype bfloat16 training ran the
    # parity tier (~79 img/s in reports/dynamics_r03 vs 93.4 in bench.py).
    prec = getattr(opt, "conv_precision", "auto")
    if prec == "auto":
        prec = "default" if getattr(opt, "dtype", "float32") == "bfloat16" else "highest"
    if prec not in ("default", "highest"):
        raise ValueError(f"--conv_precision must be auto|default|highest, got {prec!r}")
    nnops.set_default_precision(prec)
    # Byte-diet IN custom VJP, keyed by config (measured v5e, 2026-08-19,
    # reports/bench_1024p_r04.jsonl + remat_sweep_r04.jsonl): the
    # bandwidth-bound LocalEnhancer family materializes its fp32 IN
    # converts and the custom backward wins +7.1% (10.40 -> 11.14 img/s
    # at 1024x512 bs4); the MXU-bound flagship GlobalGenerator loses 0.4%
    # (XLA auto-remat already keeps those bytes virtual). Explicit
    # HIMAN_IN_CUSTOM_VJP=0/1 overrides.
    nnops.set_in_custom_vjp(getattr(opt, "netG", "") == "local")
    # Fused reflect-pad conv (nnops.conv2d_reflect strip form), same
    # bandwidth-vs-MXU config keying. Measured END-TO-END (v5e, same
    # session, r5): flagship bs32 512x256 fused 86.93 vs literal 93.46
    # img/s — the fused form was the r4 93.5->86.9 headline regression
    # (landed in the end-of-round snapshot unbenchmarked). 1024p
    # LocalEnhancer A/B: see reports/bench_1024p_r05.jsonl.
    # HIMAN_CONV_REFLECT_FUSED=0/1 overrides.
    nnops.set_conv_reflect_fused(getattr(opt, "netG", "") == "local")
    if opt.model == "pix2pixHD":
        from .pix2pixhd import Pix2PixHDModel

        model = Pix2PixHDModel(opt)
    elif opt.model == "box2mask":
        from .box2mask import BoxToMaskModel

        model = BoxToMaskModel(opt)
    else:
        raise ValueError(f"unknown model: {opt.model}")
    # Record THIS model's resolved tier on the instance: the globals above
    # are process-wide, so a program composing two models created under
    # different tiers (two-step demo: fp32-parity b2m + bf16-perf m2i)
    # re-pins them per stage via nnops.precision_scope — without this,
    # whichever create_model ran last would silently re-tier the other
    # stage's trace.
    model.conv_precision_resolved = prec
    model.in_custom_vjp_resolved = nnops.get_in_custom_vjp()
    model.pallas_enabled_resolved = not getattr(opt, "no_pallas", False)
    model.conv_reflect_fused_resolved = nnops.get_conv_reflect_fused()
    return model
