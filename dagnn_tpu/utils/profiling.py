"""Device profiling: trace capture + op-level aggregation.

The reference's only observability is wall-clock epoch timing parsed from
CSVs/tqdm logs (reference: dvae/time.py:6-44, ogbg-code/main_pyg.py:317-328
— reproduced by train/metrics.py). This module adds what a TPU framework
actually needs: capture a device trace around any callable and aggregate
per-op device time from the chrome-trace export, without TensorBoard.

    from dagnn_tpu.utils.profiling import profile_step, summarize_trace
    path = profile_step(lambda: step(params, state, batch), iters=3)
    for row in summarize_trace(path, top=20):
        print(row)

or from the CLI:

    python -m dagnn_tpu.utils.profiling trace.json.gz --top 30
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Callable, Dict, List, Optional


def profile_step(fn: Callable[[], object], iters: int = 3,
                 logdir: str = "/tmp/dagnn_tpu_prof") -> str:
    """Run `fn` under the JAX profiler; return the trace.json.gz path.

    `fn` should perform one already-compiled step (compile before calling
    — the first invocation here is still included in the trace window, so
    warm up outside for clean numbers).
    """
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    traces = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        raise RuntimeError(f"no trace written under {logdir}")
    return traces[-1]


def summarize_trace(path: str, top: int = 25,
                    iters: Optional[int] = None) -> List[Dict]:
    """Aggregate device-op durations from a chrome-trace export.

    Returns rows sorted by total device time:
    {name, total_us, count, mean_us, category, example} — divided by
    `iters` when given so numbers read per-step.
    """
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    meta: Dict[str, Dict] = {}
    for e in ev:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "GPU" not in pname:
            continue
        name = e["name"]
        dur[name] += e.get("dur", 0)
        cnt[name] += 1
        if name not in meta:
            args = e.get("args", {})
            meta[name] = {
                "category": args.get("hlo_category", ""),
                "example": args.get("long_name", "")[:160],
            }
    div = iters or 1
    rows = []
    for name, d in dur.most_common(top):
        rows.append({
            "name": name,
            "total_us": round(d / div, 1),
            "count": cnt[name] // div,
            "mean_us": round(d / max(cnt[name], 1), 2),
            **meta.get(name, {}),
        })
    return rows


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace", help="path to a *.trace.json.gz")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--iters", type=int, default=None,
                   help="divide totals by this (per-step numbers)")
    args = p.parse_args(argv)
    rows = summarize_trace(args.trace, top=args.top, iters=args.iters)
    w = max((len(r["name"]) for r in rows), default=10)
    for r in rows:
        print(f"{r['total_us']:>12.1f} us  x{r['count']:<6} "
              f"{r['name']:<{w}}  {r['category']}")


if __name__ == "__main__":
    main()
