"""Dump the optimized HLO of the flagship (or LARGE) train step to a file.

Usage: python tools/hlo_dump.py /tmp/flag.hlo [--large] [--batch=N]
Then grep '%conv.19 ' or '%fusion.9060 ' for metadata={op_name=...} to map
profiler op names back to model source.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


def main(out_path: str, large: bool, batch: int):
    from muvo_tpu.training.flagship import build_flagship_step

    # Shared harness — dumps the HLO of the exact bench.py configuration.
    # fast_init: lowering only needs shapes, not real parameter values.
    fs = build_flagship_step(large=large, batch_override=batch,
                             fast_init=True)
    txt = fs.train_step.jitted.lower(*fs.abstract).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {out_path}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/train_step.hlo"
    batch = 0
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    main(out, "--large" in sys.argv, batch)
