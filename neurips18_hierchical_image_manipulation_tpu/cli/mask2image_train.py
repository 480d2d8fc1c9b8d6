"""mask2image train driver (SURVEY.md C24, call stack §4.1).

Usage: python -m neurips18_hierchical_image_manipulation_tpu.cli.mask2image_train
           --name label2city --dataroot ./datasets/cityscapes --batchSize 4 ...
"""

from __future__ import annotations

import functools

from ..parallel import make_data_mesh
from ..configs.options import MaskToImageTrainOptions, parse_cli
from ..data.loader import CreateDataLoader
from ..models.factory import create_model
from ..train import loop


def main(argv=None):
    opt = parse_cli(MaskToImageTrainOptions, argv)
    loader = CreateDataLoader(opt)
    print(f"#training samples = {len(loader.dataset)}")
    model = create_model(opt)

    mesh = make_data_mesh(opt)
    if mesh is not None:
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    make_visuals = functools.partial(loop.mask2image_visuals, label_nc=opt.label_nc)
    loop.train(opt, model, loader, make_visuals=make_visuals, mesh=mesh)


if __name__ == "__main__":
    main()
