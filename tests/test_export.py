"""StableHLO inference export round-trip (the serving seam)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from neurips18_hierchical_image_manipulation_tpu.configs.options import (
    BoxToMaskTestOptions,
)
from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
    synthetic_box2mask_batch,
)
from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model


def test_export_and_rerun(rng, tmp_path):
    opt = BoxToMaskTestOptions(
        name="exp", checkpoints_dir=str(tmp_path), label_nc=8,
        ngf=8, n_downsample_global=2, n_blocks_global=1, fineSize=32,
    )
    model = create_model(opt)
    batch = synthetic_box2mask_batch(rng, 1, size=32, label_nc=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0), batch)

    fn = jax.jit(lambda p, b: model.inference(p, b))
    exported = jexport.export(fn)(params, batch)
    blob = exported.serialize()
    assert len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    out1 = fn(params, batch)
    out2 = reloaded.call(params, batch)
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-6
    )
