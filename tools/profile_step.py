"""Profile the training step on the TPU and report the hottest ops.

Runs the bench setup, captures a jax.profiler trace for a few steps, then
parses the trace events and prints cumulative device time per op category.

Usage: python tools/profile_step.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


def run_and_trace(trace_dir: str, large: bool = False, batch: int = 0):
    import jax

    from muvo_tpu.training.flagship import build_flagship_step

    # Shared harness — guarantees the traced step is the exact bench.py
    # configuration (batch size, remat scope, donation).
    fs = build_flagship_step(large=large, batch_override=batch)
    state, train_step, sharded, rng = fs.state, fs.train_step, fs.batch, fs.rng

    for _ in range(2):  # compile + warm
        state, metrics = train_step(state, sharded, rng)
    jax.block_until_ready(metrics["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = train_step(state, sharded, rng)
        jax.block_until_ready(metrics["loss"])
    print("trace written to", trace_dir)


def _device_events(trace_dir: str):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        return []
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    # hlo_category present <=> a real HLO op span (filters the whole-step
    # umbrella events, which would double-count the entire device time)
    return [ev for ev in trace.get("traceEvents", [])
            if ev.get("ph") == "X" and "hlo_category" in
            (ev.get("args") or {})]


def summarize(trace_dir: str, top: int = 40):
    durations = defaultdict(float)
    counts = defaultdict(int)
    for ev in _device_events(trace_dir):
        name = ev.get("name", "")
        durations[name] += ev.get("dur", 0) / 1e3  # ms
        counts[name] += 1

    total = sum(durations.values())
    print(f"\ntotal traced op time: {total:.1f} ms over {len(durations)} op names")
    for name, dur in sorted(durations.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:10.2f} ms  x{counts[name]:<5} {name[:110]}")


def summarize_by_scope(trace_dir: str, depth: int = 3, top: int = 40):
    """Aggregate device op time by the tf_op model scope (e.g.
    'MuvoWorldModel/voxel_decoder/...') truncated to ``depth`` segments.
    Events without a tf_op arg are bucketed by hlo_category — this is how
    step cost is attributed to model components (CLAUDE.md perf notes)
    instead of guessing from fusion numbers."""
    durations = defaultdict(float)
    counts = defaultdict(int)
    for ev in _device_events(trace_dir):
        args = ev.get("args") or {}
        scope = args.get("tf_op", "")
        if scope:
            key = "/".join(scope.split("/")[:depth])
        else:
            key = f"[{args.get('hlo_category', 'unattributed')}]"
        durations[key] += ev.get("dur", 0) / 1e3
        counts[key] += 1

    total = sum(durations.values())
    print(f"\ntotal traced device time: {total:.1f} ms "
          f"over {len(durations)} scopes (depth={depth})")
    for name, dur in sorted(durations.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:10.2f} ms  x{counts[name]:<5} {name[:140]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0] if args else "/tmp/muvo_trace"
    batch = 0
    depth = 3
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--depth="):
            depth = int(a.split("=")[1])
    if "--summarize-only" not in sys.argv:
        run_and_trace(trace_dir, large="--large" in sys.argv, batch=batch)
    if "--by-scope" in sys.argv:
        summarize_by_scope(trace_dir, depth=depth)
    else:
        summarize(trace_dir)
