"""Per-tensor byte ledger for the flagship train step (VERDICT r3 next#2).

ROOFLINE_step.json bounds the non-conv side of the step by bytes at the
measured stream rate (~56 GB/step -> 85.6 ms). That byte total is a
property of the CURRENT graph, not a physical floor — this tool
attributes it tensor-by-tensor so the remat-policy sweep
(tools/remat_sweep.py) attacks the right bytes and anything semantically
required is provable as such.

Two independent views:

``--saved`` (CPU, no device needed): walks jax's partial-eval boundary
  with ``jax._src.ad_checkpoint.saved_residuals`` over the EXACT flagship
  loss (bs32 512x256 bf16, VGG+FM on, masked-RGB conditioning — the
  bench.py config) and ledgers every residual the backward pass keeps
  alive: shape, dtype, MB, provenance (source line), classified
  argument vs activation. This is the semantic save-set BEFORE XLA's own
  remat; it upper-bounds what a jax.checkpoint policy can delete, and the
  dtype column is the fp32-straggler audit (every activation residual
  should be bf16 under the mixed-precision policy).

``--trace DIR`` (reads a committed profiler trace): groups the step's
  non-conv device time and bytes_accessed by fusion name — the XLA-level
  view of where the 56 GB actually moves (includes optimizer + grads
  traffic that saved_residuals does not cover).

Usage:
  python tools/byte_ledger.py --saved --out reports/byte_ledger_r04.json
  python tools/byte_ledger.py --trace /tmp/himan_prof --out ...
Both flags may be combined into one report.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _flagship(remat=False, remat_policy=None):
    """Model + abstract (params, batch) of the bench.py headline config."""
    import jax
    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    nnops.set_default_precision("default")
    opt = MaskToImageTrainOptions(
        name="ledger", checkpoints_dir="/tmp/ledger", label_nc=35, ngf=64,
        ndf=64, n_downsample_global=4, n_blocks_global=9, num_D=2,
        n_layers_D=3, batchSize=32, use_masked_image=True, dtype="bfloat16",
        remat=remat, remat_policy=remat_policy or "none",
    )
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype)
        for k, v in synthetic_batch(rng, 32, hw=(256, 512), label_nc=35).items()
    }
    shapes = jax.eval_shape(
        lambda r, b: model.init_params(r, b), jax.random.PRNGKey(0), batch
    )
    params = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    vgg = params.pop("VGG", None)
    return model, params, vgg, batch, jnp


def saved_ledger(remat=False, remat_policy=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src.ad_checkpoint import saved_residuals

    from neurips18_hierchical_image_manipulation_tpu.train import (
        steps as train_steps,
    )

    model, params, vgg, batch, jnp = _flagship(remat, remat_policy)

    def total_only(p, vgg_p, b):
        # vgg passed as a traced arg (SDS can't be closed over); the real
        # step closes over concrete vgg params — residual classification
        # ('argument') is the same either way
        loss_fn = train_steps._make_loss_fn(model, vgg_p, jnp.bfloat16)
        return loss_fn(p, b, jax.random.PRNGKey(0))[0]

    res = saved_residuals(total_only, params, vgg, batch)

    rows = {}
    for aval, src in res:
        nbytes = int(np.prod(aval.shape)) * aval.dtype.itemsize if aval.shape else aval.dtype.itemsize
        kind = "argument" if src.startswith("from the argument") else "activation"
        # collapse provenance to op + file:line (drop tmp paths/traceback noise)
        m = re.match(r"output of (\S+) from (\S+?):(\d+)", src)
        key = (
            f"{m.group(1)} @ {os.path.basename(m.group(2))}:{m.group(3)}"
            if m
            else ("argument" if kind == "argument" else src[:80])
        )
        r = rows.setdefault(
            (key, str(aval.dtype), kind),
            {"site": key, "dtype": str(aval.dtype), "kind": kind,
             "count": 0, "mb": 0.0, "example_shape": list(aval.shape)},
        )
        r["count"] += 1
        r["mb"] += nbytes / 1e6
    out = sorted(rows.values(), key=lambda r: -r["mb"])
    act = [r for r in out if r["kind"] == "activation"]
    total_act = sum(r["mb"] for r in act)
    f32_act = sum(r["mb"] for r in act if r["dtype"] == "float32")
    report = {
        "config": "bench.py flagship bs32 512x256 bf16 VGG+FM",
        "remat": bool(remat),
        "remat_policy": remat_policy or "none",
        "n_residuals": sum(r["count"] for r in out),
        "activation_mb_total": round(total_act, 1),
        "activation_mb_fp32": round(f32_act, 1),
        "argument_mb_total": round(sum(r["mb"] for r in out if r["kind"] == "argument"), 1),
        "note": "semantic save-set at jax's partial-eval boundary, BEFORE "
        "XLA remat; activation rows are what checkpoint policies can trade "
        "for recompute. fp32 activation rows are the dtype-audit targets.",
        "rows": [
            {**r, "mb": round(r["mb"], 1)}
            for r in out
            if r["mb"] > 1.0 or r["dtype"] == "float32"
        ],
    }
    return report


def trace_ledger(trace_dir):
    """Non-conv device-time + bytes per fusion from the newest trace."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    nsteps = 0
    groups = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args")
        if not a or "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name in ("1", "2"):
            nsteps += 1
            continue
        if name == "0" or name.startswith("jit_"):
            continue
        if "conv_general_dilated" in a.get("tf_op", ""):
            continue
        ms = float(a["device_duration_ps"]) / 1e9
        by = int(a.get("bytes_accessed", 0) or 0)
        # strip trailing instance digits so fusion.123 variants group
        key = re.sub(r"[.\d]+$", "", name) or name
        g = groups.setdefault(key, {"op": key, "count": 0, "ms": 0.0, "gb": 0.0})
        g["count"] += 1
        g["ms"] += ms
        g["gb"] += by / 1e9
    nsteps = max(nsteps + 1, 1)
    rows = sorted(groups.values(), key=lambda g: -g["gb"])
    for g in rows:
        g["ms"] = round(g["ms"] / nsteps, 2)
        g["gb"] = round(g["gb"] / nsteps, 2)
        g["count"] = g["count"] // nsteps
    return {
        "steps_in_trace": nsteps,
        "nonconv_gb_per_step": round(sum(g["gb"] for g in rows), 2),
        "nonconv_ms_per_step": round(sum(g["ms"] for g in rows), 1),
        "note": "XLA-level view: per-fusion bytes_accessed averaged over "
        "the trace's steps; includes optimizer/grad traffic invisible to "
        "the saved-residual ledger.",
        "rows": rows[:40],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--saved", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", default=None)
    p.add_argument("--trace", default=None)
    p.add_argument("--out", default="reports/byte_ledger_r04.json")
    args = p.parse_args()
    report = {}
    if args.saved:
        report["saved_residuals"] = saved_ledger(args.remat, args.remat_policy)
    if args.trace:
        report["trace_nonconv"] = trace_ledger(args.trace)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    for sec, rep in report.items():
        head = {k: v for k, v in rep.items() if k != "rows"}
        print(sec, json.dumps(head, indent=1))
        for r in rep["rows"][:15]:
            print("  ", r)


if __name__ == "__main__":
    main()
