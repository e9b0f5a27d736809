"""Benchmark: world-model training-step throughput on the flagship config.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Measures the full jitted SPMD training step (on-device preprocessing, model
forward, all losses, backward, optimizer) on the full-size muvo.yml graph
(320x832 RGB, 64x1024 range view, 192x192x64 voxels, RF=4 FH=2) with a
device-resident synthetic batch, so the number is pure device throughput.

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md), so
the denominator is an estimate of the reference PyTorch implementation's
A100 training throughput: 6 frames per optimizer micro-step at ~0.6 s/step
=> ~10 frames/s. The north-star target is >= 2x that per chip.
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import json
import sys
import time

BASELINE_FPS = 10.0


def main(n_steps: int = 12, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    from muvo_tpu.config import get_cfg
    from muvo_tpu.data.synthetic import synthetic_batch
    from muvo_tpu.parallel.mesh import make_mesh, shard_batch
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg = get_cfg()
    cfg.merge_from_file("muvo_tpu/configs/muvo.yml")
    # 4 sequences per chip (24 frames): decoder + encoder remat trade FLOPs
    # for activation HBM, which fits batch 4 and beats batch 2 (33.4 vs 29.5
    # frames/s/chip on v5e).
    cfg.BATCHSIZE = 4 * max(1, len(jax.devices()))
    cfg.MODEL.REMAT = True
    cfg.MODEL.REMAT_ENCODER = True
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 1

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    batch = synthetic_batch(cfg, batch_size=cfg.BATCHSIZE, sequence_length=seq)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = trainer.init_state(batch)
    train_step = trainer.make_train_step(donate=True)
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(0)

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
    print(json.dumps({
        "metric": "train_step_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    main(steps)
