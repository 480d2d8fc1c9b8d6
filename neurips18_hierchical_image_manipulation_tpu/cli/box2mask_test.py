"""box2mask test/inference driver (SURVEY.md C25): predicted layout
galleries for --how_many object crops."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.options import BoxToMaskTestOptions, parse_cli
from ..data.loader import CreateDataLoader
from ..models.factory import create_model
from ..utils import html as html_mod
from ..utils.imaging import tensor2label
from ..utils.visualizer import Visualizer
from .mask2image_test import restore_params


def main(argv=None):
    opt = parse_cli(BoxToMaskTestOptions, argv)
    loader = CreateDataLoader(opt)
    model = create_model(opt)
    visualizer = Visualizer(opt)

    web_dir = os.path.join(opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}")
    webpage = html_mod.HTML(
        web_dir, f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.which_epoch}"
    )

    params = None
    fwd = jax.jit(lambda p, b: model.inference(p, b))
    done = 0
    for host_batch in loader:
        batch = {k: jnp.asarray(v) for k, v in host_batch.items() if not isinstance(v, list)}
        if params is None:
            params = restore_params(opt, model, batch)
        merged, _ = fwd(params, batch)
        merged = np.asarray(jax.device_get(merged))
        for i in range(merged.shape[0]):
            visuals = {
                "input_masked": tensor2label(
                    np.where(
                        host_batch["boxmask"][i, :, :, 0] > 0,
                        0,
                        host_batch["masked_layout"][i],
                    ),
                    opt.label_nc,
                ),
                "predicted_layout": tensor2label(merged[i], opt.label_nc),
                "gt_layout": tensor2label(host_batch["gt_layout"][i], opt.label_nc),
            }
            visualizer.save_images(webpage, visuals, host_batch["path"][i])
            done += 1
            if done >= opt.how_many:
                break
        if done >= opt.how_many:
            break
    webpage.save()
    print(f"wrote {done} results to {web_dir}")


if __name__ == "__main__":
    main()
