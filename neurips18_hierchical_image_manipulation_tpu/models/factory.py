"""Model factory — mirrors ``models/models.py::create_model`` (SURVEY C11).

Where the reference wraps in nn.DataParallel for multi-GPU, here the
parallelism lives in the train step (train/steps.py make_dp_train_step),
so create_model just dispatches on opt.model.
"""

from __future__ import annotations


def create_model(opt):
    from ..ops.pallas import config as pallas_config

    pallas_config.set_enabled(not getattr(opt, "no_pallas", False))
    if opt.model == "pix2pixHD":
        from .pix2pixhd import Pix2PixHDModel

        return Pix2PixHDModel(opt)
    if opt.model == "box2mask":
        from .box2mask import BoxToMaskModel

        return BoxToMaskModel(opt)
    raise ValueError(f"unknown model: {opt.model}")
