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
    # Byte-diet IN custom VJP, keyed by config (measured v5e, 2026-08-19,
    # reports/bench_1024p_r04.jsonl + remat_sweep_r04.jsonl): the
    # bandwidth-bound LocalEnhancer family materializes its fp32 IN
    # converts and the custom backward wins +7.1% (10.40 -> 11.14 img/s
    # at 1024x512 bs4); the MXU-bound flagship GlobalGenerator loses 0.4%
    # (XLA auto-remat already keeps those bytes virtual). Explicit
    # HIMAN_IN_CUSTOM_VJP=0/1 overrides.
    nnops.set_in_custom_vjp(getattr(opt, "netG", "") == "local")
    if opt.model == "pix2pixHD":
        from .pix2pixhd import Pix2PixHDModel

        return Pix2PixHDModel(opt)
    if opt.model == "box2mask":
        from .box2mask import BoxToMaskModel

        return BoxToMaskModel(opt)
    raise ValueError(f"unknown model: {opt.model}")
