"""Attribute a jax.profiler perfetto trace to source sites.

Aggregates device-side events by their `source` (file:line) and prints
total device time, model FLOPs, achieved TFLOP/s and HBM GB/s per site —
the layer-level view profile_step.py's opaque fusion names can't give.

Usage: python tools/trace_attrib.py [trace_dir=/tmp/himan_prof] [top=40]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/himan_prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace found", "dir": outdir}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "Axon" in n or "axon" in n
    }
    by_site = defaultdict(lambda: [0.0, 0, 0, 0])  # dur_us, flops, bytes, count
    nsteps = 0
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (device_pids and e.get("pid") not in device_pids):
            continue
        a = e.get("args")
        if not a or "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name in ("1", "2"):  # umbrella per-step events; count steps via them
            nsteps += 1
            continue
        if name == "0" or name.startswith("jit_"):
            continue
        dur = float(a["device_duration_ps"]) / 1e6  # us
        src = a.get("source", "?")
        # strip the repo prefix for readability
        src = src.replace("/root/repo/neurips18_hierchical_image_manipulation_tpu/", "")
        tf = a.get("tf_op", "")
        # group convs by their op kind too so fwd/wgrad at one line split
        kind = tf.rsplit("/", 1)[-1].rstrip(":") if tf else ""
        key = f"{src} [{kind}]"
        s = by_site[key]
        s[0] += dur
        s[1] += int(a.get("model_flops", 0) or 0)
        s[2] += int(a.get("bytes_accessed", 0) or 0)
        s[3] += 1
        total += dur
    nsteps = max(nsteps + 1, 1)  # umbrella "0" skipped above
    rows = sorted(by_site.items(), key=lambda kv: -kv[1][0])[:top_n]
    print(f"steps={nsteps}  total_device={total/1e3/nsteps:.2f} ms/step")
    print(f"{'ms/step':>9} {'%':>5} {'TFLOP/s':>8} {'GB/s':>7} {'n':>4}  site")
    for key, (dur, fl, by, cnt) in rows:
        tf_s = fl / (dur * 1e-6) / 1e12 if dur else 0.0
        gb_s = by / (dur * 1e-6) / 1e9 if dur else 0.0
        print(
            f"{dur/1e3/nsteps:9.2f} {100*dur/total:5.1f} {tf_s:8.1f} {gb_s:7.0f} "
            f"{cnt//nsteps:4d}  {key[:110]}"
        )


if __name__ == "__main__":
    main()
