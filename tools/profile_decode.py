"""Decode trace op names against the compiled HLO of the train step.

Re-lowers the bench train step (compile-cache hit), takes the optimized
HLO text, and prints (a) class aggregates from the last trace in
/tmp/himan_prof, (b) for the top-N trace ops, the HLO one-liner of the
root instruction of that computation (shapes + op kinds inside).
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.join(_os_.path.dirname(_os_.path.abspath(__file__)), ".."))

import numpy as np


def load_trace(outdir="/tmp/himan_prof"):
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") != 3:
            continue
        n = e.get("name", "?")
        if n.startswith("jit_") or n in ("0", "1", "2", "3", "4"):
            continue
        by_name[n] += float(e.get("dur", 0.0))
    return by_name


def main():
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
    bs = int(os.environ.get("HIMAN_BENCH_BS", "32"))
    opt = MaskToImageTrainOptions(
        name="prof", checkpoints_dir="/tmp/himan_prof_ckpt", label_nc=35,
        ngf=64, ndf=64, n_downsample_global=4, n_blocks_global=9,
        num_D=2, n_layers_D=3, batchSize=bs, use_masked_image=True,
        dtype="bfloat16",
    )
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, batch_size=bs, hw=(256, 512), label_nc=35)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
    vgg_params = params.pop("VGG", None)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(
        model, vgg_params=vgg_params, compute_dtype=jnp.bfloat16, donate=False
    )
    txt = jax.jit(step.__wrapped__).lower(state, batch).compile().as_text()

    # computation name -> body lines
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?([\w\.\-]+)\s.*\{$", line.strip())
        if line.strip().startswith(("%fused_", "fused_")) or re.match(
            r"^%?[\w\.\-]+ \(", line.strip()
        ):
            pass
        mm = re.match(r"^\s*%?([\w\.\-]+)\s*=?\s*\(?.*\{\s*(//.*)?$", line)
        if line.rstrip().endswith("{"):
            name = line.strip().split(" ")[0].lstrip("%")
            cur = name
            comps[cur] = []
        elif cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.strip())

    # instruction index: name -> defining line (in entry or any computation)
    instr = {}
    for body in comps.values():
        for line in body:
            m = re.match(r"^%?([\w\.\-]+)\s*=", line)
            if m:
                instr[m.group(1)] = line

    import argparse as _ap
    _args = _ap.ArgumentParser()
    _args.add_argument("--dump", default=None, help="print the full body of this fusion's called computation and exit")
    _a, _ = _args.parse_known_args()
    if _a.dump:
        line = instr.get(_a.dump, "")
        print(line)
        m = re.search(r"(?:calls|to_apply)=%?([\w\.\-]+)", line)
        if m and m.group(1) in comps:
            for bl in comps[m.group(1)]:
                print("   ", bl[:240])
        return

    by_name = load_trace()
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]

    # ---- region aggregation: trace op -> HLO metadata op_name bucket ----
    meta_of = {}
    for name, line in instr.items():
        m = re.search(r'op_name="([^"]*)"', line)
        if m:
            meta_of[name] = m.group(1)

    def region(op_name):
        if "Vgg19Features" in op_name:
            return "VGG bwd" if "transpose" in op_name else "VGG fwd"
        if "MultiscaleDiscriminator" in op_name:
            return "D bwd" if "transpose" in op_name else "D fwd"
        if "GlobalGenerator" in op_name or "LocalEnhancer" in op_name:
            g = "G bwd" if "transpose" in op_name else "G fwd"
            if "instance_norm" in op_name:
                g += " (IN)"
            return g
        if "adam" in op_name or "update" in op_name.lower():
            return "optimizer"
        return "other"

    reg = defaultdict(float)
    unattr = 0.0
    for n, d in by_name.items():
        base = n.split(".remat")[0]
        m = meta_of.get(n) or meta_of.get(base) or meta_of.get(n.split(".clone")[0])
        if m is None:
            unattr += d
            reg["(unattributed)"] += d
        else:
            reg[region(m)] += d
    print("== region aggregates (3 steps) ==")
    tot = sum(by_name.values())
    for n, d in sorted(reg.items(), key=lambda kv: -kv[1]):
        print(f"{d/1e3:10.2f} ms  {100*d/tot:5.1f}%  {n}")

    # class aggregates by stripping trailing .N / digits
    agg = defaultdict(float)
    for n, d in by_name.items():
        cls = re.sub(r"[\.\d]+$", "", n) or n
        agg[cls] += d
    total = sum(by_name.values())
    print("== class aggregates (3 steps) ==")
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d/1e3:10.2f} ms  {100*d/total:5.1f}%  {n}")

    print("\n== top ops decoded ==")
    for n, d in top:
        line = instr.get(n, "")
        if not line:
            # fusion names in trace match HLO instruction names
            line = instr.get(n.replace("fusion", "fusion"), "")
        # extract kind + shape + called computation hint
        kind = re.search(r"=\s*[\w\[\],\s]*?\s*(\w+)\(", line)
        shape = re.search(r"=\s*((?:\([^)]*\))|(?:[\w\[\],]+))\s", line)
        calls = re.search(r"(?:calls|to_apply)=%?([\w\.\-]+)", line)
        summary = line[:200] if line else "(not found in HLO)"
        print(f"{d/1e3:9.2f} ms  {n[:40]:40s} {summary}")
        if calls and calls.group(1) in comps:
            kinds = defaultdict(int)
            for bl in comps[calls.group(1)]:
                km = re.match(r"^%?[\w\.\-]+\s*=\s*[^=]*?(\w+)\(", bl)
                if km:
                    kinds[km.group(1)] += 1
            hot = ", ".join(f"{k}x{v}" for k, v in sorted(kinds.items(), key=lambda kv: -kv[1])[:6])
            print(f"              inside: {hot}")


if __name__ == "__main__":
    main()
