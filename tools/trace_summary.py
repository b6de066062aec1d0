"""Summarize a jax.profiler trace into a per-op device-time table.

Standalone kernel timings through the axon tunnel carry ~1.5 ms dispatch
overhead per call, so kernel A/Bs must compare *in-model* — capture a
profiler trace around the real step and read per-op costs from it:

    jax.profiler.start_trace("/tmp/my_trace")
    for _ in range(5): step(...)
    np.asarray(out.ravel()[0])          # real sync; block_until_ready no-ops
    jax.profiler.stop_trace()
    python tools/trace_summary.py /tmp/my_trace --steps 5

(Trainers can capture the same trace via training.profile_step — see
utils/profiling.py; the dump lands under outputs/<project>/profile.)
"""

import argparse
import collections
import glob
import gzip
import json


def summarize(trace_dir: str, steps: int = 1, top: int = 20, pid=None):
    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    data = json.load(gzip.open(paths[-1]))
    events = [
        e for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
    ]
    if pid is None:
        # the device-stream pid is the one whose events carry XLA op names
        # (host pids carry Python/runtime frames); pick the busiest pid that
        # contains fusion/copy/convolution events
        by_pid = collections.Counter()
        for e in events:
            n = e.get("name", "")
            if any(k in n for k in ("fusion", "copy", "convolution", "dot",
                                    "custom-call")):
                by_pid[e.get("pid")] += e["dur"]
        if not by_pid:
            raise SystemExit("no device-looking events; pass --pid explicitly")
        pid = by_pid.most_common(1)[0][0]
    agg = collections.Counter()
    for e in events:
        if e.get("pid") != pid:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue  # enclosing program spans double-count their ops
        tail = name.rsplit(".", 1)
        base = tail[0] if len(tail) == 2 and tail[1].isdigit() else name
        agg[base] += e["dur"]
    tot = sum(agg.values())
    print(f"device total {tot / steps / 1e3:.2f} ms/step (pid={pid})")
    for name, dur in agg.most_common(top):
        print(f"{dur / steps / 1e3:8.3f} ms {100 * dur / tot:5.1f}%  "
              f"{name[:90]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="timed iterations inside the trace window")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--pid", type=int, default=None,
                    help="trace pid of the device stream (auto-detected)")
    a = ap.parse_args()
    summarize(a.trace_dir, a.steps, a.top, a.pid)
