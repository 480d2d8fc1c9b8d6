"""Microbench the fused encode_input build (one-hot + edges + masked-RGB,
packed stem variant) — XLA vs the Pallas encode kernel.

The flagship train step materializes two conditioning tensors per step
(models/pix2pixhd.py encode_input, stem-pack path):
  * g_packed (B, (H+6)/2, (W+6)/2, 4*(label_nc+1+3))  — generator stem input
  * cond     (B, H, W, label_nc+1)                    — D conditioning
TRACE_r03_baseline.txt attributes ~11 ms/step to this build (select_n
6.78 ms @425 GB/s + broadcasts/eq ~4 ms) against a ~1.9 ms stream-bandwidth
bound for the ~640 MB written — no gradient flows through any of it
(label/inst/image are data), so it is a pure-bandwidth Pallas target.

Timing: lax.scan carry-dependent loop, two lengths K/2K, median of diffs
(cancels the ~8 ms axon dispatch constant — same method as
tools/roofline_step.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 512))
    ap.add_argument("--label_nc", type=int, default=35)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from neurips18_hierchical_image_manipulation_tpu.ops import (
        boxcomposite,
        nnops,
        onehot_edges,
    )

    b, (h, w), nc = args.bs, args.hw, args.label_nc
    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.randint(0, nc, size=(b, h, w)), jnp.int32)
    inst = jnp.asarray(rng.randint(0, 64, size=(b, h, w)), jnp.int32)
    image = jnp.asarray(rng.rand(b, h, w, 3) * 2 - 1, jnp.bfloat16)
    boxes = jnp.asarray(
        np.stack(
            [
                rng.randint(0, h // 2, size=b),
                rng.randint(0, w // 2, size=b),
                rng.randint(16, h // 2, size=b),
                rng.randint(16, w // 2, size=b),
            ],
            -1,
        ).astype(np.float32)
    )

    def xla_encode(label, inst, image, boxes):
        """The literal stem-pack encode composition from
        models/pix2pixhd.py encode_input (dtype bf16)."""
        dt = jnp.bfloat16
        masked = boxcomposite.mask_box(image, boxes, fill=0.0)
        ids_p = jnp.pad(label, ((0, 0), (3, 3), (3, 3)), mode="reflect")
        edge = onehot_edges.instance_edges(inst, jnp.bool_)
        edge_p = jnp.pad(edge, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        rgb_p = jnp.pad(masked, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        g_packed = onehot_edges.encode_input_rgb_packed(
            ids_p, edge_p, rgb_p, nc, dtype=dt
        )
        cond = onehot_edges.encode_input(label, inst, nc, dtype=dt)
        return g_packed, cond

    def pallas_encode(label, inst, image, boxes):
        from neurips18_hierchical_image_manipulation_tpu.ops.pallas import encode

        return encode.encode_stem_pack(label, inst, image, boxes, nc, jnp.bfloat16)

    def sync(y):
        np.asarray(jax.device_get(y[(0,) * y.ndim]))

    def timed_pair(f, k, reps=5):
        def loop(args_, length):
            lb, it, im, bx = args_

            def body(c, _):
                g, cond = f(lb + c, it, im, bx)
                # carry depends on both outputs so no iteration is DCE'd
                return c + g[0, 0, 0, 0].astype(jnp.int32) * 0 + cond[
                    0, 0, 0, 0
                ].astype(jnp.int32) * 0 + 1, ()

            return lax.scan(body, jnp.int32(0), None, length=length)[0]

        fk = jax.jit(lambda a: loop(a, k))
        f2k = jax.jit(lambda a: loop(a, 2 * k))
        arg = (label, inst, image, boxes)
        sync(fk(arg).reshape(1))
        sync(f2k(arg).reshape(1))
        ests = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fk(arg).reshape(1))
            t1 = time.perf_counter()
            sync(f2k(arg).reshape(1))
            t2 = time.perf_counter()
            ests.append(((t2 - t1) - (t1 - t0)) / k)
        return max(float(np.median(ests)), 1e-7)

    g, cond = jax.jit(xla_encode)(label, inst, image, boxes)
    out_gb = (g.size + cond.size) * 2 / 1e9
    in_gb = (label.size + inst.size) * 4 / 1e9 + image.size * 2 / 1e9
    print(f"outputs: g_packed {g.shape} cond {cond.shape}; "
          f"traffic >= {in_gb + out_gb:.3f} GB")

    results = {"traffic_gb": round(in_gb + out_gb, 4)}
    dt_xla = timed_pair(xla_encode, args.k)
    results["xla_ms"] = round(dt_xla * 1e3, 3)
    results["xla_gbs"] = round((in_gb + out_gb) / dt_xla, 1)
    print(f"XLA   : {dt_xla * 1e3:8.3f} ms  ({results['xla_gbs']} GB/s effective)")

    try:
        gp, condp = jax.jit(pallas_encode)(label, inst, image, boxes)
        err_g = float(jnp.max(jnp.abs(gp.astype(jnp.float32) - g.astype(jnp.float32))))
        err_c = float(
            jnp.max(jnp.abs(condp.astype(jnp.float32) - cond.astype(jnp.float32)))
        )
        print(f"pallas parity: max|dg|={err_g:.2e} max|dcond|={err_c:.2e}")
        dt_pl = timed_pair(pallas_encode, args.k)
        results["pallas_ms"] = round(dt_pl * 1e3, 3)
        results["pallas_gbs"] = round((in_gb + out_gb) / dt_pl, 1)
        results["parity_max_err"] = max(err_g, err_c)
        print(
            f"Pallas: {dt_pl * 1e3:8.3f} ms  ({results['pallas_gbs']} GB/s effective)"
        )
    except ImportError:
        print("pallas encode kernel not present yet; XLA-only run")

    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
