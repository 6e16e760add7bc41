"""Profile the full SIFT frontend program with jax.profiler and report the
top HLO ops by device time — honest per-op attribution (prefix deltas
reshuffle between programs; the trace does not).

Usage: python scripts/probe_trace_frontend.py [cap] [out_prefix]
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def summarize(logdir, top=30):
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace files under", logdir)
        return
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # Device lanes: pid names containing "TPU" / "/device:"; fall back to
    # lanes whose events carry HLO metadata.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device total {total:.2f} ms across {sum(cnt.values())} events "
          f"({files[-1].split('/')[-1]})")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:8.3f} ms  x{cnt[name]:<5d} {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features.api import SIFTParams, _compute_sift_jit
    from sara_tpu.features.dog import DoGParams
    from sara_tpu.utils import device_trace

    print("backend:", jax.default_backend(), "cap:", CAP, flush=True)
    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    a = jnp.asarray(np.asarray(img.convert("L").resize((640, 480)),
                               np.float32) / 255.0)
    params = SIFTParams(dog=DoGParams(capacity=CAP, refine_iters=2))

    t0 = time.perf_counter()
    kp = _compute_sift_jit(a, params)
    float(kp.xy.sum())
    print(f"compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    for _ in range(2):
        float(_compute_sift_jit(a, params).xy.sum())

    logdir = "/tmp/sift_trace"
    with device_trace(logdir):
        for _ in range(3):
            kp = _compute_sift_jit(a, params)
            float(kp.xy.sum())
    summarize(logdir)


if __name__ == "__main__":
    main()
