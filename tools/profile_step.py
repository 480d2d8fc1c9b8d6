"""Trace the full GAN train step with jax.profiler and print the top ops.

Writes the trace to /tmp/himan_prof and parses the perfetto trace.json.gz
for per-op device durations, aggregated by HLO op name prefix. This is the
ground-truth breakdown the ablation variants can only approximate.
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.join(_os_.path.dirname(_os_.path.abspath(__file__)), ".."))

import numpy as np


def run_traced_step():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import synthetic_batch
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.train import steps as train_steps
    from neurips18_hierchical_image_manipulation_tpu.train.state import GANTrainState

    nnops.set_default_precision("default")
    # HIMAN_PROF_CONFIG=1024p traces the coarse-to-fine LocalEnhancer
    # train step (bench_all.py's --with_1024p config) instead of the
    # flagship — VERDICT r3 next#6: give the 1024p config its anatomy.
    cfg = os.environ.get("HIMAN_PROF_CONFIG", "flagship")
    if cfg == "1024p":
        bs = int(os.environ.get("HIMAN_BENCH_BS", "4"))  # bench_all's bs1k
        opt = MaskToImageTrainOptions(
            name="prof1k", checkpoints_dir="/tmp/himan_prof_ckpt", label_nc=35,
            netG="local", ngf=32, n_downsample_global=4, n_blocks_global=9,
            n_blocks_local=3, num_D=3, n_layers_D=3, batchSize=bs,
            use_masked_image=True, dtype="bfloat16",
        )
        hw = (512, 1024)
    else:
        bs = int(os.environ.get("HIMAN_BENCH_BS", "32"))
        opt = MaskToImageTrainOptions(
            name="prof", checkpoints_dir="/tmp/himan_prof_ckpt", label_nc=35,
            ngf=64, ndf=64, n_downsample_global=4, n_blocks_global=9,
            num_D=2, n_layers_D=3, batchSize=bs, use_masked_image=True,
            dtype="bfloat16",
        )
        hw = (256, 512)
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, batch_size=bs, hw=hw, label_nc=35)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
    vgg_params = params.pop("VGG", None)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(
        model, vgg_params=vgg_params, compute_dtype=jnp.bfloat16
    )
    state, metrics, _ = step(state, batch)
    _ = float(metrics["D_real"])

    outdir = "/tmp/himan_prof"
    os.system(f"rm -rf {outdir}")
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, metrics, _ = step(state, batch)
    _ = float(metrics["D_real"])
    jax.profiler.stop_trace()
    return outdir


def parse_trace(outdir):
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print(json.dumps({"error": "no trace.json.gz found", "dir": outdir}))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side complete events: aggregate duration by op name
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "Axon" in n or "axon" in n or "/device" in n.lower()
    }
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        by_name[name] += dur
        total += dur
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    print(json.dumps({"pids": pid_names, "total_us": round(total, 0)}))
    for name, dur in top:
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:120]}")


if __name__ == "__main__":
    d = run_traced_step()
    time.sleep(1)
    parse_trace(d)
