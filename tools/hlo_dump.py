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
    import jax
    import jax.numpy as jnp

    from muvo_tpu.config import get_cfg
    from muvo_tpu.data.synthetic import synthetic_batch
    from muvo_tpu.parallel.mesh import make_mesh, shard_batch
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "muvo_tpu/configs/muvo.yml"))
    cfg.BATCHSIZE = 4 * max(1, len(jax.devices()))
    cfg.MODEL.REMAT = True
    cfg.MODEL.REMAT_ENCODER = False
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 1
    if large:
        cfg.MODEL.TRANSFORMER.LARGE = True
        cfg.BATCHSIZE = 1 * max(1, len(jax.devices()))
    if batch:
        cfg.BATCHSIZE = batch * max(1, len(jax.devices()))

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    b = synthetic_batch(cfg, batch_size=cfg.BATCHSIZE, sequence_length=seq)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    state = trainer.init_state(b, fast=True)
    train_step = trainer.make_train_step(donate=True)
    sharded = shard_batch(b, mesh)
    rng = jax.random.PRNGKey(0)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (state, sharded, rng))
    txt = train_step.jitted.lower(*abstract).compile().as_text()
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
