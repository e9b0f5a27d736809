"""Benchmark: world-model training-step throughput on the flagship config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Measures the full jitted SPMD training step (on-device preprocessing, model
forward, all losses, backward, optimizer) on the full-size muvo.yml graph
(320x832 RGB, 64x1024 range view, 192x192x64 voxels, RF=4 FH=2) with a
device-resident synthetic batch, so the number is pure device throughput.

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md).
The denominator is a FLOPs-based estimate of the reference PyTorch
implementation on A100: XLA cost analysis measures ~1.58 TFLOPs per frame
for the flagship train step (37.9 TFLOPs per 24-frame step; same
conv/matmul inventory as the reference at the same shapes). At BASELINE_FPS
= 10 frames/s the reference would be achieving 15.8 TFLOP/s on A100's 312
TFLOP/s bf16 peak, i.e. ~5% MFU — a fair (if anything generous) figure for
eager PyTorch with a python-loop RSSM, per-op kernel launches, and unfused
StyleGAN decoders, mostly in fp32 (the reference's 16-mixed is off in its
shipped configs).

Also reported: achieved MFU on this chip = model FLOPs (remat recompute
excluded via a no-remat compile of the same graph) / wall time / peak, and
the hardware-FLOPs counterpart of the executed (remat) step.
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import json
import sys
import time

BASELINE_FPS = 10.0

# bf16 peak TFLOP/s per chip by device kind substring
PEAK_TFLOPS = (
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 197.0),
    ("v6", 918.0), ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
)


def _peak_flops_per_chip() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, tflops in PEAK_TFLOPS:
        if key in kind:
            return tflops * 1e12
    return 0.0


def _flops_of(jitted, *abstract_args) -> float:
    """FLOPs per execution from XLA cost analysis (requires a compile; hits
    the persistent cache on re-runs)."""
    try:
        cost = jitted.lower(*abstract_args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
        return 0.0


def main(n_steps: int = 12, warmup: int = 3, large: bool = False,
         batch_override: int = 0, remat: str = ""):
    import jax

    from muvo_tpu.training.flagship import build_flagship_step

    # Shared harness (also used by tools/profile_step.py and
    # tools/hlo_dump.py so profiles/HLO match this benchmark exactly).
    try:
        fs = build_flagship_step(large=large, batch_override=batch_override,
                                 remat=remat)
    except ValueError as e:
        raise SystemExit(str(e))
    cfg, state, train_step, sharded, rng, abstract = (
        fs.cfg, fs.state, fs.train_step, fs.batch, fs.rng, fs.abstract)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON

    for _ in range(warmup):
        state, metrics = train_step(state, sharded, rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, sharded, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    frames = cfg.BATCHSIZE * seq * n_steps
    fps_per_chip = frames / dt / n_chips

    record = {
        "metric": ("train_step_frames_per_sec_per_chip_large" if large
                   else "train_step_frames_per_sec_per_chip"),
        "value": round(fps_per_chip, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / BASELINE_FPS, 3),
    }
    # achieved MFU: model FLOPs (no-remat compile, excludes remat recompute)
    # / wall / peak; falls back to hardware FLOPs of the executed (remat)
    # step if the extra compile fails
    import copy

    from muvo_tpu.training.trainer import WorldModelTrainer

    trainer = fs.trainer
    peak = _peak_flops_per_chip()
    if peak > 0:
        step_time = dt / n_steps
        no_remat_cfg = copy.deepcopy(cfg)
        no_remat_cfg.MODEL.REMAT = False
        no_remat_cfg.MODEL.REMAT_ENCODER = False
        flops_trainer = WorldModelTrainer(no_remat_cfg, mesh=trainer.mesh)
        flops_trainer._tx = trainer._tx
        model_flops = _flops_of(
            flops_trainer.make_train_step(donate=False).jitted, *abstract)
        if model_flops > 0:
            record["model_tflops_per_step"] = round(model_flops / 1e12, 2)
            record["mfu"] = round(
                model_flops / step_time / n_chips / peak, 4)
        hw_flops = _flops_of(train_step.jitted, *abstract)
        if hw_flops > 0:
            record["hw_tflops_per_step"] = round(hw_flops / 1e12, 2)
            record["hw_fu"] = round(hw_flops / step_time / n_chips / peak, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 12
    batch = 0
    remat = ""
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--remat="):
            remat = a.split("=")[1]
    main(steps, large="--large" in sys.argv, batch_override=batch,
         remat=remat)
