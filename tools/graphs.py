"""Plot training/eval metrics from the JSONL logs.

Counterpart of reference vis/graphs.py (paper-figure plotting). Reads the
metrics.jsonl a MetricsLogger writes and renders per-metric curves.

Usage: python tools/graphs.py <run_dir> [--metrics loss val0_psnr ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_jsonl(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--metrics", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    jsonl = os.path.join(args.run_dir, "metrics.jsonl")
    records = load_jsonl(jsonl)
    if not records:
        print("no records in", jsonl)
        sys.exit(1)

    keys = args.metrics
    if keys is None:
        keys = sorted({k for r in records for k in r if k != "step"})

    n = len(keys)
    cols = min(3, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3 * rows),
                             squeeze=False)
    for i, key in enumerate(keys):
        ax = axes[i // cols][i % cols]
        xs = [r["step"] for r in records if key in r]
        ys = [r[key] for r in records if key in r]
        ax.plot(xs, ys, color="#00538a")
        ax.set_title(key, fontsize=9)
        ax.grid(alpha=0.3)
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    out = args.out or os.path.join(args.run_dir, "metrics.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
