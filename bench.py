"""Headline benchmark: full GAN train step throughput, images/sec/chip.

Config = BASELINE.json #3/#5: mask2image at Cityscapes 512x256 — G
(GlobalGenerator ngf=64, 4 downs, 9 blocks) + 2-scale PatchGAN + LSGAN +
feature-matching + VGG19 perceptual losses, both optimizer updates, ONE
jitted step, bf16 compute / fp32 master params. The Pallas kernel tier is
OFF by default (ops/pallas/config.py): every fused kernel is golden-tested
but measured SLOWER than XLA's fusion end-to-end, so XLA runs the hot path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
operative baseline is the A100-PyTorch throughput of the same train step.
No CUDA device exists here, so the baseline is MEASURED-anchored
(SURVEY §7 "measured, not looked up", VERDICT r1 missing#4) via
tools/bench_torch_oracle.py (committed output: TORCH_BASELINE.json):
  * the reference-equivalent torch train step was timed on CPU
    (5.3-6.1 s/img at 256x128, eager fp32) against an instruction-count
    FLOP model of the same step: 1.179 TFLOP/image at 512x256 (MEASURED
    by layer walk, not estimated — the r1 estimate of 1.4 was 19% high),
  * A100 practical TF32 conv throughput ~35 TFLOP/s x 0.75 eager-mode
    utilization => 22.3 img/s.
A100_TORCH_IMG_PER_S = 22.3 (r1 used a hand-rounded 20.0; the measured
anchor is stricter). Target from BASELINE.json: >=5x => >=111.5 img/s.

Measured history (TPU v5e-1): bs8 fp32 54 img/s; bs8 bf16 70.9 (no VGG);
bs8 bf16+VGG 60.3; bs16 bf16+VGG 74.6.
"""

import json
import os
import time

import numpy as np


def _wait_for_backend(jax, sleep_s=60):
    """The axon TPU claim can transiently fail UNAVAILABLE (pool busy /
    stale grant from a killed process, ~20 min observed to clear). jax
    caches a failed backend init for the life of the process, so retry
    by RE-EXECING this script in a fresh process (bounded by
    HIMAN_BENCH_CLAIM_RETRIES, default 3) rather than looping in-process
    — a transient outage must not zero the round's bench artifact."""
    import sys

    try:
        return jax.devices()
    except RuntimeError as e:
        left = int(os.environ.get("HIMAN_BENCH_CLAIM_RETRIES", "3"))
        if left <= 0:
            raise
        print(f"[bench] backend unavailable ({e}); re-exec, "
              f"{left - 1} retries left", flush=True)
        time.sleep(sleep_s)
        os.environ["HIMAN_BENCH_CLAIM_RETRIES"] = str(left - 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import jax

    _wait_for_backend(jax)
    # persistent compile cache: the full-step XLA compile takes ~18 min
    # over the axon tunnel cold, ~3 min warm
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp
    import optax

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
    from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState

    # perf mode: MXU-native conv passes (parity tests pin HIGHEST instead)
    nnops.set_default_precision("default")

    batch_size = int(os.environ.get("HIMAN_BENCH_BS", "32"))
    opt = MaskToImageTrainOptions(
        name="bench",
        checkpoints_dir="/tmp/himan_bench",
        label_nc=35,
        ngf=64,
        ndf=64,
        n_downsample_global=4,
        n_blocks_global=9,
        num_D=2,
        n_layers_D=3,
        batchSize=batch_size,
        use_masked_image=True,
        dtype="bfloat16",
        remat=os.environ.get("HIMAN_BENCH_REMAT", "0") == "1",
        remat_policy=os.environ.get("HIMAN_BENCH_REMAT_POLICY", "none"),
    )
    model = create_model(opt)

    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, batch_size=batch_size, hw=(256, 512), label_nc=35)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
    vgg_params = params.pop("VGG", None)
    tx_g = optax.adam(2e-4, b1=0.5)
    tx_d = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx_g, tx_d, jax.random.PRNGKey(1))

    mode = os.environ.get("HIMAN_BENCH_MODE", "fused")
    if mode == "split":
        # G-step then D-step as two jitted programs (passthrough pool
        # semantics == fused step; halves the peak live set, which matters
        # when XLA auto-remats near the HBM limit)
        g_step, d_step = train_steps.make_pooled_train_steps(
            model, vgg_params=vgg_params, compute_dtype=jnp.bfloat16
        )

        def step(state, batch):
            state, m_g, fake = g_step(state, batch)
            state, m_d = d_step(state, batch, fake)
            return state, {**m_g, **m_d}, fake

    else:
        step = train_steps.make_train_step(
            model, vgg_params=vgg_params, compute_dtype=jnp.bfloat16
        )

    # warmup / compile; scalar fetch = hard sync (axon block_until_ready on
    # donated buffers does not synchronize)
    state, metrics, _ = step(state, batch)
    _ = float(metrics["D_real"])

    # Variance protocol (VERDICT r4 weak#1): the chip/pool state drifts
    # between sessions by up to ~8%, so ONE timing window cannot be
    # compared across sessions. Time >=3 disjoint windows, report the
    # MEDIAN window as the headline and carry the min/max spread so every
    # consumer sees the same-invocation band.
    iters = int(os.environ.get("HIMAN_BENCH_ITERS", "30"))
    n_windows = max(1, int(os.environ.get("HIMAN_BENCH_WINDOWS", "3")))
    window_rates = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics, _ = step(state, batch)
        _ = float(metrics["D_real"])  # hard sync closes the window
        dt = time.perf_counter() - t0
        window_rates.append(batch_size * iters / dt)

    img_per_s = float(np.median(window_rates))
    A100_TORCH_IMG_PER_S = 22.3  # measured-anchored, see module docstring
    TFLOP_PER_IMG = 1.179  # measured layer walk (TORCH_BASELINE.json)
    V5E_BF16_PEAK = 197.0
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_512x256",
                "value": round(img_per_s, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / A100_TORCH_IMG_PER_S, 3),
                "value_basis": f"median of {n_windows} disjoint "
                f"{iters}-iter windows (variance protocol, r5)",
                "windows_img_per_s": [round(r, 3) for r in window_rates],
                "spread_min": round(min(window_rates), 3),
                "spread_max": round(max(window_rates), 3),
                "achieved_tflops": round(img_per_s * TFLOP_PER_IMG, 1),
                "mfu": round(img_per_s * TFLOP_PER_IMG / V5E_BF16_PEAK, 3),
                "baseline_basis": "A100 est 22.3 img/s from measured 1.179"
                " TFLOP/img x 35 TF/s TF32 x 0.75 eager (TORCH_BASELINE.json)",
                "mfu_basis": "model FLOPs: 1.179 TFLOP/img (TORCH_BASELINE"
                " layer walk). Executed conv work on-chip is 1.254 TFLOP/img"
                " (ROOFLINE_step true-MAC ledger: + lane-padded channels +"
                " boundary-pad taps); MFU uses the model number, so it"
                " understates hardware utilization by ~6%.",
            }
        )
    )


if __name__ == "__main__":
    main()
