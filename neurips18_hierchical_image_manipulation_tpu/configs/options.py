"""Config layer — dataclasses mirroring the reference's argparse flags 1:1.

Reference contract: SURVEY.md §3.3 (options/base_options.py ->
train_options.py / test_options.py [L], box2mask variant [R]). Flag names
are preserved verbatim so reference run commands translate mechanically;
``parse()`` builds the checkpoint dir and dumps ``opt.txt`` exactly like
``BaseOptions.parse`` does (observable behavior per SURVEY §3.3), plus a
machine-readable ``config.json``.

TPU-specific additions (documented divergences, all with safe defaults):
  --dtype {float32,bfloat16}   compute dtype for the training path
  --no_pallas                  disable Pallas kernels (lax fallback)
  --mesh_devices               #devices in the 1-D data mesh (0 = all)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class BaseOptions:
    # experiment
    name: str = "label2city"
    gpu_ids: str = "0"  # accepted for CLI compat; TPU mesh is used instead
    checkpoints_dir: str = "./checkpoints"
    model: str = "pix2pixHD"
    norm: str = "instance"
    use_dropout: bool = False
    data_type: int = 32
    verbose: bool = False

    # input/output sizes
    batchSize: int = 1
    loadSize: int = 1024
    fineSize: int = 512
    label_nc: int = 35
    input_nc: int = 3
    output_nc: int = 3

    # data
    dataroot: str = "./datasets/cityscapes/"
    resize_or_crop: str = "scale_width"
    serial_batches: bool = False
    no_flip: bool = False
    nThreads: int = 2
    max_dataset_size: int = 2**31 - 1
    # host-pipeline backend: "threads" (data/loader.py thread pool) or
    # "grain" (data/grain_pipeline.py — checkpointable iterators +
    # process-parallel decode via --grain_workers; SURVEY §4.5)
    data_backend: str = "threads"
    grain_workers: int = 0
    # decode-once .npy sidecar cache for the aligned reader (new vs the
    # reference: PNG inflate dominates weak TPU-host CPUs; see
    # data/cityscapes._open_cached and tools/bench_loop.py)
    decode_cache: bool = False
    # in-RAM decoded-array cache budget (MB, 0=off): skips even the .npy
    # sidecar read on repeat epochs — see AlignedDataset._open
    ram_cache_mb: int = 0
    # ship uint8 images / uint8 labels / uint16 inst ids to the device and
    # normalize there ((x/127.5)-1 fused into the step): 3.3x less
    # host->device traffic per batch (84 -> 25 MB at 512x256 bs32). New
    # capability vs the reference (which transfers fp32)
    uint8_transfer: bool = False
    # stage H2D transfer for batch N+1 on a worker thread while step N
    # runs (train/prefetch.py double buffer); 0 = synchronous. Default 0:
    # measured on the 1-core axon host the staging thread LOSES (57.1 ->
    # 54.7 img/s loop-level — GIL contention, and axon serializes H2D
    # against a busy device anyway); the lever exists for multi-core
    # hosts with true async transfer
    device_prefetch: int = 0
    # upload the WHOLE dataset to HBM once and gather/augment batches
    # on-device (data/device_resident.py) — per-step H2D is one index
    # vector. Right call whenever the resized dataset fits next to the
    # step's working set: Cityscapes pre-resized to 512x256 uint8 is
    # ~2.3 GB, but FULL-RES planes (2975 x 2048x1024 label+inst+RGB) are
    # ~37 GB and do NOT fit a 16 GB v5e — the loader projects the upload
    # against the device budget and refuses loudly with a streaming hint
    # (HIMAN_HBM_BUDGET_BYTES overrides the detected budget)
    device_resident_data: bool = False
    # with --device_resident_data: fold the on-device gather+crop+flip+
    # normalize INTO the donated train step — ONE jitted dispatch per
    # iteration, zero per-step H2D; sampling becomes a pure function of
    # (seed, state.step) so mid-epoch resume continues the stream exactly
    # (train/steps.make_resident_train_step). Applies on single-device
    # AND mesh runs (the DP form gathers each device's shard inside
    # shard_map — make_resident_dp_train_step); pool_size>0 ignores it
    # (the pool path is host-synchronous). Off switch kept for A/B
    # against the standalone-sampler path.
    fused_resident_step: bool = True

    # display
    display_winsize: int = 512
    tf_log: bool = False

    # generator
    netG: str = "global"
    ngf: int = 64
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    niter_fix_global: int = 0

    # instance-feature encoder
    no_instance: bool = False
    instance_feat: bool = False
    label_feat: bool = False
    feat_num: int = 3
    load_features: bool = False
    n_downsample_E: int = 4
    nef: int = 16
    n_clusters: int = 10

    # TPU-native extensions
    dtype: str = "float32"
    # conv/MXU precision for the jnp ops tier (ops/nnops.py):
    #   auto    -> 'default' under --dtype bfloat16 (the perf tier: packed
    #              stems, phasepack head conv, lane padding, Pallas encode
    #              kernel, IN custom VJP), 'highest' under fp32 (the
    #              bit-parity tier vs the CPU-torch oracle)
    #   default/highest -> forced either way
    # Round-4 fix: the CLI drivers previously never set this, so real
    # training ran the parity tier even under --dtype bfloat16 (the
    # committed r3 dynamics run's 79.2 img/s vs bench 93.4 was mostly
    # this, not loader overhead).
    conv_precision: str = "auto"
    # IN custom VJP (byte-diet backward for InstanceNorm+act) is keyed by
    # CONFIG in models/factory.py: auto-ON for --netG local (the
    # LocalEnhancer family is bandwidth-bound at full res — materialized
    # fp32 IN converts dominate, custom backward measured +7.1% at
    # 1024x512 bs4, reports/bench_1024p_r04.jsonl), auto-OFF otherwise
    # (the MXU-bound global flagship measured -0.4%: XLA auto-remat
    # already keeps those bytes virtual, remat_sweep_r04.jsonl). The
    # 'netG == local' key is a proxy for "bandwidth-bound" — a thin-
    # channel global config would be misclassified; override per-run with
    # HIMAN_IN_CUSTOM_VJP=0/1 (the env always wins).
    no_pallas: bool = False
    mesh_devices: int = 0  # 0 = use every local device
    seed: int = 0
    debug_nans: bool = False  # SURVEY §6.2: jax_debug_nans for CI runs
    remat: bool = False  # rematerialize resblocks (trade FLOPs for HBM)
    # resblock remat granularity (tools/remat_sweep.py, VERDICT r3 next#2):
    #   none     — no checkpoint (XLA's own remat only); remat=True alone
    #              means policy 'block'
    #   block    — jax.checkpoint each resblock, save only block I/O
    #   conv_out — checkpoint each resblock but SAVE the two conv outputs
    #              (jax.checkpoint_policies.save_only_these_names): backward
    #              re-runs only the cheap IN/ReLU/pad chains, never a conv
    remat_policy: str = "none"

    isTrain: bool = field(default=False, init=False)

    def parse(self, save=True):
        """Mirror BaseOptions.parse(): create {checkpoints_dir}/{name}, dump
        opt.txt (+config.json)."""
        # reference --data_type 16 requested half precision; map it onto
        # the TPU-native bf16 policy unless dtype was set explicitly
        if self.data_type == 16 and self.dtype == "float32":
            self.dtype = "bfloat16"
        expr_dir = os.path.join(self.checkpoints_dir, self.name)
        os.makedirs(expr_dir, exist_ok=True)
        if save:
            args = dataclasses.asdict(self)
            with open(os.path.join(expr_dir, "opt.txt"), "w") as f:
                f.write("------------ Options -------------\n")
                for k in sorted(args):
                    f.write(f"{k}: {args[k]}\n")
                f.write("-------------- End ----------------\n")
            with open(os.path.join(expr_dir, "config.json"), "w") as f:
                json.dump(args, f, indent=2, default=str)
        return self


@dataclass
class TrainOptions(BaseOptions):
    # frequencies
    display_freq: int = 100
    print_freq: int = 100
    save_latest_freq: int = 1000
    save_epoch_freq: int = 10
    no_html: bool = False
    debug: bool = False

    # resume
    continue_train: bool = False
    load_pretrain: str = ""
    which_epoch: str = "latest"
    phase: str = "train"

    # schedule (reference: constant lr for niter epochs then linear decay)
    niter: int = 100
    niter_decay: int = 100
    beta1: float = 0.5
    lr: float = 0.0002

    # profiling (SURVEY §6.1): one jax.profiler trace is captured around
    # step 20 when set; view with tensorboard-plugin-profile
    profile_dir: str = ""

    # losses
    lambda_feat: float = 10.0
    no_ganFeat_loss: bool = False
    no_vgg_loss: bool = False
    no_lsgan: bool = False

    # discriminators
    num_D: int = 2
    n_layers_D: int = 3
    ndf: int = 64
    pool_size: int = 0

    def __post_init__(self):
        self.isTrain = True


@dataclass
class TestOptions(BaseOptions):
    ntest: int = 2**31 - 1
    results_dir: str = "./results/"
    aspect_ratio: float = 1.0
    phase: str = "test"
    which_epoch: str = "latest"
    how_many: int = 50
    cluster_path: str = "features_clustered_010.npy"
    use_encoded_image: bool = False

    def __post_init__(self):
        self.isTrain = False
        # the reference test.py hardcodes these, so evaluation/galleries
        # walk the dataset in file order deterministically (ADVICE r1):
        self.serial_batches = True
        self.batchSize = 1
        self.nThreads = 1


@dataclass
class BoxToMaskTrainOptions(TrainOptions):
    """Structure-generator (box2mask) flags — repo-specific tier [R],
    behavior from the paper [P §3.2] (SURVEY.md C4): context-window and
    class-conditioning config for the bbox-conditioned layout inpainter."""

    model: str = "box2mask"
    netG: str = "twostream"
    # context-window crop fed to the structure generator (square, fixed —
    # the jit-static replacement for the reference's dynamic crops)
    fineSize: int = 128
    contextMargin: float = 2.0  # context window = margin x object box
    min_box_size: int = 16  # ignore smaller objects
    max_box_size: int = 10_000
    n_downsample_global: int = 3
    n_blocks_global: int = 4
    lambda_recon: float = 10.0  # per-pixel CE weight
    no_vgg_loss: bool = True  # layout stage has no VGG term
    no_instance: bool = True
    # Background-box augmentation: every ~1/p-th training sample places
    # the object's box on OBJECT-FREE ground instead (null class -1 ->
    # all-zeros one-hot, empty GT object mask, full-weight context CE
    # in-box). This is the supervision that makes remove-mode edits work:
    # it teaches (a) null class -> the object stream emits an empty mask,
    # and (b) the context stream inpaints the true background under a
    # box — exactly what eval/two_step.py's remove mode reads. Without
    # it, in-box context pixels are unsupervised (object pixels dominate
    # tight boxes) and the context stream free-runs toward repainting
    # the object (measured round 5: remove restore acc 0.11 -> gated
    # value in reports/two_step_r05/summary.json). 0 disables (default:
    # existing configs unchanged).
    bg_box_prob: float = 0.0
    # Negative-class context penalty: weight of -log(1 - p_own_class) on
    # the CONTEXT stream at object pixels. The occluded background is
    # unknown there, but it is certainly not the occluding object — this
    # is the only supervision that stops remove-mode edits from
    # repainting the removed object (see models/box2mask.py). 0 disables.
    lambda_ctx_neg: float = 0.0
    objReconLoss: str = "bce"  # object-mask stream loss (bce per paper)
    num_D: int = 1


@dataclass
class BoxToMaskTestOptions(TestOptions):
    model: str = "box2mask"
    netG: str = "twostream"
    fineSize: int = 128
    contextMargin: float = 2.0
    min_box_size: int = 16
    max_box_size: int = 10_000
    no_instance: bool = True


@dataclass
class MaskToImageTrainOptions(TrainOptions):
    """mask2image: pix2pixHD conditioned additionally on the masked RGB
    image so the generator inpaints the box region (SURVEY §1.2)."""

    model: str = "pix2pixHD"
    use_masked_image: bool = True
    # the fork trains the image generator on bbox context windows with the
    # box interior of the RGB masked out (SURVEY.md C8 "box2mask +
    # conditioned mask2image"); plain pix2pixHD full-scene training is
    # --no-use_masked_image + use_bbox_dataset False
    use_bbox_dataset: bool = True
    contextMargin: float = 2.0
    min_box_size: int = 16
    max_box_size: int = 10_000


@dataclass
class MaskToImageTestOptions(TestOptions):
    model: str = "pix2pixHD"
    use_masked_image: bool = True
    use_bbox_dataset: bool = True
    contextMargin: float = 2.0
    min_box_size: int = 16
    max_box_size: int = 10_000
    # >1: run the generator with W-sharded activations over that many
    # devices (parallel/spatial.py make_spatial_generator /
    # make_spatial_local_enhancer — the SURVEY §6.7 escape hatch for
    # resolutions exceeding one chip's HBM). netG=global or local, no
    # encoder features; per-shard W must be a multiple of
    # 2**n_downsample_global (global) or 2**(n_local_enhancers +
    # n_downsample_global) (local), with bottleneck width >= 2.
    spatial_shards: int = 0


def _add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if not f.init:
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.type in ("bool", bool) or isinstance(default, bool):
            group = parser.add_mutually_exclusive_group()
            group.add_argument(
                f"--{f.name}", dest=f.name, action="store_true", default=default
            )
            # negation so True-default booleans (e.g. use_masked_image)
            # stay reachable from the CLI
            group.add_argument(
                f"--no-{f.name}", dest=f.name, action="store_false"
            )
        else:
            typ = type(default) if default is not None else str
            parser.add_argument(f"--{f.name}", type=typ, default=default)


def _setup_jax_compile_cache():
    """Persistent XLA compile cache for the CLI drivers (round 4). Over
    the axon tunnel a cold flagship train-step compile is 8-18 min; the
    bench/tools tier always enabled the cache but the CLI drivers never
    did, so every real training run re-paid the full compile. Resolution
    order: $HIMAN_JAX_CACHE_DIR, else ``./.jax_cache`` when present
    (running from a repo checkout — shares the bench/tools cache), else
    ``~/.cache/himan_jax``."""
    import jax

    cache = os.environ.get("HIMAN_JAX_CACHE_DIR")
    if not cache:
        local = os.path.abspath(".jax_cache")
        cache = local if os.path.isdir(local) else os.path.expanduser(
            "~/.cache/himan_jax"
        )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def parse_cli(cls, argv: Optional[List[str]] = None):
    """argparse front-end over a dataclass config — gives the reference's
    ``python train.py --name x --batchSize 4 ...`` CLI surface."""
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    _add_dataclass_args(parser, cls)
    ns, _unknown = parser.parse_known_args(argv)
    opt = cls(**{k: v for k, v in vars(ns).items() if v is not None})
    _setup_jax_compile_cache()
    return opt.parse()
