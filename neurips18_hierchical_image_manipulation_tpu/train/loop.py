"""Training loop driver (SURVEY.md C24: the reference's *_train.py epoch /
iter loop semantics [L]): resume bookkeeping via iter.txt, jitted G+D step,
periodic console/HTML display, 'latest' + per-epoch checkpoints, LR decay
handled inside the optax schedule (train/schedule.py).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.checkpoint import CheckpointManager
from ..utils.imaging import tensor2im, tensor2label
from ..utils.visualizer import Visualizer
from .state import GANTrainState, make_optimizers
from . import steps as train_steps


def _device_batch(batch: Dict[str, np.ndarray]):
    return {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}


def train(opt, model, loader, make_visuals: Optional[Callable] = None, mesh=None):
    """Generic two-stage GAN training loop used by both CLI drivers."""
    if getattr(opt, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)  # SURVEY §6.2
    visualizer = Visualizer(opt)
    ckpt = CheckpointManager(opt)

    steps_per_epoch = max(len(loader), 1)
    tx_g, tx_d = make_optimizers(opt, steps_per_epoch)

    # synchronous init batch: does NOT spawn (and then abandon) a prefetch
    # worker or consume shuffle state the way next(iter(loader)) would
    first = _device_batch(
        loader.first_batch() if hasattr(loader, "first_batch") else next(iter(loader))
    )
    params = jax.jit(lambda r: model.init_params(r, first))(
        jax.random.PRNGKey(opt.seed)
    )
    if getattr(opt, "verbose", False):
        # reference --verbose prints the networks; here: param counts
        for net, tree in params.items():
            n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))
            print(f"[net {net}] {n / 1e6:.2f}M params")
    vgg_params = params.pop("VGG", None)
    state = GANTrainState.create(params, tx_g, tx_d, jax.random.PRNGKey(opt.seed + 1))

    if getattr(opt, "load_pretrain", ""):
        state = state.replace(
            params=CheckpointManager.load_pretrain_into(
                state.params, opt.load_pretrain, opt.which_epoch
            )
        )

    start_epoch, epoch_iter0 = 1, 0
    if opt.continue_train:
        if ckpt.exists(opt.which_epoch):
            state = ckpt.restore(opt.which_epoch, state)
            start_epoch, epoch_iter0 = ckpt.read_iter()
            print(f"resumed from {opt.which_epoch} at epoch {start_epoch}")
        else:
            print(
                f"WARNING: --continue_train set but no '{opt.which_epoch}' "
                "checkpoint found — training from scratch"
            )

    compute_dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else None
    pool = None
    if getattr(opt, "pool_size", 0) > 0 and mesh is not None:
        # the pooled split-step path is host-synchronous (fake replay
        # buffer round-trips every step) and plain-jit; silently taking it
        # would bypass the DP shard_map/psum step while _stage still
        # shards batches — fail loudly instead
        raise ValueError(
            "--pool_size > 0 is incompatible with multi-chip training "
            "(mesh): the image-pool replay is a host-side buffer. Use "
            "pool_size=0 on a mesh (the reference's pool is also "
            "single-process-only)."
        )
    if getattr(opt, "pool_size", 0) > 0 and hasattr(model, "d_losses"):
        # split G/D steps with a host-side fake replay buffer (C20)
        from ..utils.image_pool import ImagePool

        pool = ImagePool(opt.pool_size, seed=opt.seed)
        g_step, d_step = train_steps.make_pooled_train_steps(
            model, vgg_params=vgg_params, compute_dtype=compute_dtype
        )

        def step_fn(state, batch):
            state, metrics, fake = g_step(state, batch)
            pooled = jnp.asarray(pool.query(np.asarray(jax.device_get(fake))))
            state, d_metrics = d_step(state, batch, pooled)
            metrics = {**metrics, **d_metrics}
            return state, metrics, fake

    elif mesh is not None:
        step_fn = train_steps.make_dp_train_step(
            model, mesh, vgg_params=vgg_params, compute_dtype=compute_dtype
        )
        state = train_steps.replicate(state, mesh)
    else:
        step_fn = train_steps.make_train_step(
            model, vgg_params=vgg_params, compute_dtype=compute_dtype
        )

    # device-resident loaders: fuse sampling + augmentation INTO the
    # donated step — one dispatch per iteration, zero per-step H2D.
    # Sampling is a pure function of (seed, state.step), so resume
    # continues the stream exactly (VERDICT r3 next#1).
    fused = (
        pool is None
        and hasattr(loader, "fused_sampler")
        and getattr(opt, "fused_resident_step", True)
    )
    if fused and mesh is None:
        sample_fn, resident_data = loader.fused_sampler()
        fused_step, fused_step_wb = train_steps.make_resident_train_step(
            model,
            sample_fn,
            loader.n_samples,
            opt.batchSize,
            vgg_params=vgg_params,
            compute_dtype=compute_dtype,
            shuffle=not opt.serial_batches,
            seed=opt.seed,
        )
    elif fused:
        # multi-chip fused resident: planes replicated over the mesh, each
        # device gathers+augments its shard inside shard_map — zero
        # per-step H2D on every chip (train/steps.py
        # make_resident_dp_train_step)
        sample_fn, resident_data = loader.fused_sampler()
        resident_data = train_steps.replicate(resident_data, mesh)
        fused_step, fused_step_wb = train_steps.make_resident_dp_train_step(
            model,
            mesh,
            sample_fn,
            loader.n_samples,
            opt.batchSize,
            vgg_params=vgg_params,
            compute_dtype=compute_dtype,
            shuffle=not opt.serial_batches,
            seed=opt.seed,
        )

    from .profiler import ThroughputMeter, trace

    n_chips = mesh.devices.size if mesh is not None else 1
    meter = ThroughputMeter(opt.batchSize, n_chips, window=opt.print_freq)

    total_steps = int(state.step)
    profile_dir = getattr(opt, "profile_dir", "")

    from .prefetch import device_prefetch

    # default matches configs/options.py: 0 (synchronous) — threaded
    # staging measured SLOWER on the 1-core axon host (57.1 vs 54.7)
    prefetch_depth = getattr(opt, "device_prefetch", 0)

    def _stage(host_batch):
        b = _device_batch(host_batch)
        if mesh is not None:
            b = train_steps.shard_batch(b, mesh)
        return b

    def _fused_iter(epoch, skip):
        """One epoch of the FUSED resident path: no loader iteration at
        all — the donated step samples on device from state.step, so the
        host's per-iteration work is ONE dispatch with constant args.
        Display iterations swap in the step_with_batch program (compiled
        once) to fetch the input planes for the HTML gallery."""
        nonlocal state, total_steps
        n_batches = max(loader.n_samples // opt.batchSize, 1)
        for i in range(skip, n_batches):
            iter_start = time.time()
            want_batch = (
                make_visuals is not None
                and (total_steps + 1) % opt.display_freq == 0
            )
            with trace(profile_dir if total_steps == 20 else None):
                if want_batch:
                    state, metrics, fake, fbatch = fused_step_wb(
                        state, resident_data
                    )
                else:
                    state, metrics, fake = fused_step(state, resident_data)
            total_steps += 1
            ips = meter.tick()

            if total_steps % opt.print_freq == 0:
                errors = {k: float(v) for k, v in metrics.items()}
                if ips:
                    errors["img_per_s_per_chip"] = ips
                visualizer.print_current_errors(
                    epoch, i + 1, errors, time.time() - iter_start
                )
                visualizer.plot_current_errors(errors, total_steps)

            if want_batch and total_steps % opt.display_freq == 0:
                host_batch = {
                    k: np.asarray(v) for k, v in jax.device_get(fbatch).items()
                }
                visuals = make_visuals(host_batch, np.asarray(jax.device_get(fake)))
                if visuals:
                    visualizer.display_current_results(visuals, epoch, total_steps)

            if total_steps % opt.save_latest_freq == 0:
                ckpt.save("latest", state, epoch, i + 1)

    def _streamed_iter(epoch, skip):
        nonlocal state, total_steps
        for i, (batch, host_batch) in enumerate(
            device_prefetch(loader, _stage, prefetch_depth)
        ):
            if i < skip:
                continue
            iter_start = time.time()
            with trace(profile_dir if total_steps == 20 else None):
                state, metrics, fake = step_fn(state, batch)
            total_steps += 1
            ips = meter.tick()

            if total_steps % opt.print_freq == 0:
                errors = {k: float(v) for k, v in metrics.items()}
                if ips:
                    errors["img_per_s_per_chip"] = ips
                visualizer.print_current_errors(
                    epoch, i + 1, errors, time.time() - iter_start
                )
                visualizer.plot_current_errors(errors, total_steps)

            if total_steps % opt.display_freq == 0:
                visuals = (
                    make_visuals(host_batch, np.asarray(jax.device_get(fake)))
                    if make_visuals
                    else {}
                )
                if visuals:
                    visualizer.display_current_results(visuals, epoch, total_steps)

            if total_steps % opt.save_latest_freq == 0:
                ckpt.save("latest", state, epoch, i + 1)

    for epoch in range(start_epoch, opt.niter + opt.niter_decay + 1):
        epoch_start = time.time()
        # mid-epoch resume: iter.txt's second field counts completed
        # batches of start_epoch — skip them so resumed training doesn't
        # replay already-seen batches (and desync the optax step count
        # from the epoch bookkeeping). On the fused path sampling derives
        # from the checkpointed state.step, so the skip only aligns the
        # host epoch bookkeeping (the stream itself is exact either way).
        skip = epoch_iter0 if epoch == start_epoch else 0
        if fused:
            _fused_iter(epoch, skip)
        else:
            _streamed_iter(epoch, skip)

        if epoch % opt.save_epoch_freq == 0:
            ckpt.save(epoch, state, epoch + 1, 0)
            ckpt.save("latest", state, epoch + 1, 0)
        print(
            f"End of epoch {epoch} / {opt.niter + opt.niter_decay} \t"
            f" Time Taken: {time.time() - epoch_start:.0f} sec",
            flush=True,
        )
    # Always leave a resumable `latest` at the end of training, whatever
    # the periodic freqs were set to. Periodic saves pull the full state
    # over PCIe/tunnel (~minutes/epoch for the flagship on axon), so
    # short evidence runs crank save_latest_freq way up — this final save
    # keeps the run's checkpoint contract (stage hand-off, --continue_train)
    # intact at the cost of ONE pull.
    ckpt.save("latest", state, opt.niter + opt.niter_decay + 1, 0)
    return state


def mask2image_visuals(host_batch, fake, label_nc=35):
    vis = {
        "input_label": tensor2label(host_batch["label"], label_nc),
        "synthesized_image": tensor2im(fake),
    }
    if "image" in host_batch:
        vis["real_image"] = tensor2im(host_batch["image"])
    return vis


def box2mask_visuals(host_batch, merged, label_nc=35):
    return {
        "masked_layout": tensor2label(host_batch["masked_layout"], label_nc),
        "predicted_layout": tensor2label(merged, label_nc),
        "gt_layout": tensor2label(host_batch["gt_layout"], label_nc),
    }
