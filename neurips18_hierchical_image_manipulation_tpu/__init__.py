"""himan — TPU-native hierarchical semantic image manipulation.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
``xcyan/neurips18_hierchical_image_manipulation`` (NeurIPS'18,
arXiv:1808.07535): a bbox-conditioned *structure generator* that inpaints
semantic label maps, and a pix2pixHD-style *image generator* rendering
layouts to RGB against multiscale PatchGAN discriminators, composed into a
two-step object add / remove / swap manipulation pipeline.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere (channels on TPU lanes).
  * All per-sample preprocessing (one-hot labels, instance edges, bbox
    crop/resize/paste) is jnp math fused into the jitted graph — the host
    pipeline only decodes images (see ``data/``).
  * The GAN G-step + D-step is ONE pure jitted function using
    ``stop_gradient`` in place of ``.detach()`` / ``backward()`` ordering
    (see ``train/steps.py``).
  * Data parallelism is ``jax.shard_map`` over a 1-D device mesh with
    ``lax.psum`` gradient allreduce over ICI (see ``parallel/``).
  * Hot ops have hand-written Pallas TPU kernels under ``ops/pallas`` with
    lax fallbacks (``--no_pallas``).

The reference repo mount was empty at build time (see SURVEY.md §0); the
behavioral contract implemented here follows SURVEY.md §3.2 (pix2pixHD
lineage [L] + the paper [P]), with reference-path citations marked [R].
"""

__version__ = "0.1.0"
