"""Systematic resblock remat-policy sweep (VERDICT r3 next#2).

Prior remat attempts were ad-hoc variants; this runs the POLICY grid the
verdict demanded, each leg end-to-end through bench.py in a fresh process
(the axon backend is per-process; fresh processes also isolate compile
caches and the pool-wedge retry logic bench.py already carries):

  legs = product(
    HIMAN_IN_CUSTOM_VJP in {1, 0}        # byte-diet IN backward (nnops)
    x remat_policy in {none, block, conv_out}   # resblock trunk save-set
  ) minus redundant combos, plus any --extra "ENV=V,ENV=V:tag" legs.

Writes one JSONL row per leg: {"tag", "env", "rc", "bench": {...}} to
--out (reports/remat_sweep_r04.jsonl). Run solo on the TPU — bench.py
legs are serialized; NEVER run two TPU processes at once.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEGS = [
    # The factory's config-keyed gate resolves OFF for bench.py's
    # netG='global' flagship, so the explicit on/off legs bracket it:
    # 'baseline' == 'in_vjp_off' there, and 'in_vjp_on' is the leg that
    # reproduces the 93.44-vs-93.04 native-vs-custom A/B cited in
    # ops/nnops.py and ROOFLINE_step.json.
    ("baseline", {}),
    ("in_vjp_on", {"HIMAN_IN_CUSTOM_VJP": "1"}),
    ("in_vjp_off", {"HIMAN_IN_CUSTOM_VJP": "0"}),
    ("remat_block", {"HIMAN_BENCH_REMAT_POLICY": "block"}),
    ("remat_conv_out", {"HIMAN_BENCH_REMAT_POLICY": "conv_out"}),
    (
        "remat_conv_out_vjp_off",
        {"HIMAN_BENCH_REMAT_POLICY": "conv_out", "HIMAN_IN_CUSTOM_VJP": "0"},
    ),
]


def run_leg(tag, env_over, out_path):
    env = dict(os.environ)
    env.update(env_over)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    bench = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "metric" in line:
            bench = json.loads(line)
    row = {"tag": tag, "env": env_over, "rc": p.returncode, "bench": bench}
    if p.returncode != 0 and not bench:
        row["stderr_tail"] = p.stderr[-500:]
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="reports/remat_sweep_r04.jsonl")
    ap.add_argument("--legs", default=None,
                    help="comma-separated tags to run (default: all)")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    want = set(args.legs.split(",")) if args.legs else None
    for tag, env_over in LEGS:
        if want and tag not in want:
            continue
        run_leg(tag, env_over, args.out)


if __name__ == "__main__":
    main()
