"""box2mask (structure generator) train driver (SURVEY.md C24, §4.2)."""

from __future__ import annotations

import functools

from ..parallel import make_data_mesh
from ..configs.options import BoxToMaskTrainOptions, parse_cli
from ..data.loader import CreateDataLoader
from ..models.factory import create_model
from ..train import loop


def main(argv=None):
    opt = parse_cli(BoxToMaskTrainOptions, argv)
    loader = CreateDataLoader(opt)
    print(f"#object crops = {len(loader.dataset)}")
    model = create_model(opt)

    mesh = make_data_mesh(opt)
    if mesh is not None:
        print(f"data-parallel mesh over {mesh.devices.size} devices")

    make_visuals = functools.partial(loop.box2mask_visuals, label_nc=opt.label_nc)
    loop.train(opt, model, loader, make_visuals=make_visuals, mesh=mesh)


if __name__ == "__main__":
    main()
