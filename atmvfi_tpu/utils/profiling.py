"""Profiling helpers: capture + summarize jax.profiler device traces.

The reference has no tracing at all (SURVEY.md §5); this module gives
the framework first-class on-device attribution: run a function under
`capture()`, then `summarize()` groups XLA op time by HLO category and
by source line (the same breakdown used to drive the warp/conv
optimizations in this repo).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Callable, Dict, Optional, Tuple

import jax


def capture(fn: Callable, *args, trace_dir: str = "/tmp/atmvfi_trace"):
    """Run fn(*args) under the JAX profiler; returns (result, trace_dir)."""
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return out, trace_dir


def _latest_trace(trace_dir: str) -> Optional[str]:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    return paths[-1] if paths else None


def summarize(trace_dir: str, top: int = 20) -> Dict:
    """Aggregate device-op durations by HLO category and source line."""
    path = _latest_trace(trace_dir)
    if path is None:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    by_cat: collections.Counter = collections.Counter()
    by_src: collections.Counter = collections.Counter()
    total = 0
    for e in data.get("traceEvents", []):
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and "dur" in e and not e["name"].startswith("jit_")):
            args = e.get("args", {})
            if "hlo_category" not in args:
                continue
            by_cat[args.get("hlo_category", "?")] += e["dur"]
            by_src[args.get("source", "?")] += e["dur"]
            total += e["dur"]
    return {
        "total_ms": total / 1000,
        "by_category_ms": {k: v / 1000 for k, v in by_cat.most_common(top)},
        "by_source_ms": {k: v / 1000 for k, v in by_src.most_common(top)},
    }


def print_summary(summary: Dict) -> None:
    print(f"device total: {summary['total_ms']:.1f} ms")
    print("by category:")
    for k, v in summary["by_category_ms"].items():
        print(f"  {v:8.1f} ms  {k}")
    print("by source:")
    for k, v in summary["by_source_ms"].items():
        print(f"  {v:8.1f} ms  {k}")
