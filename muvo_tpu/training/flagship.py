"""Shared flagship-benchmark harness for bench.py / tools/profile_step.py /
tools/hlo_dump.py.

One place defines "the flagship step": the full-size muvo.yml graph at the
benchmark batch size and remat configuration, a device-resident synthetic
batch, the initialised train state, and the donated jitted SPMD train step.
The three tools previously each hardcoded this block and had already begun
to diverge (bench.py grew a --remat override the others lacked), so a
profile or HLO dump could silently describe a different configuration than
the benchmark number it was meant to explain.
"""

from __future__ import annotations

import os
from typing import NamedTuple


class FlagshipStep(NamedTuple):
    cfg: object
    trainer: object
    state: object
    train_step: object
    batch: dict          # sharded, device-resident
    rng: object
    abstract: tuple      # ShapeDtypeStructs of (state, batch, rng)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def build_flagship_step(large: bool = False, batch_override: int = 0,
                        remat: str = "", fast_init: bool = False,
                        donate: bool = True) -> FlagshipStep:
    """Build the benchmark train step.

    large:          stride-8 features, 5,184 fusion tokens/frame through the
                    Pallas flash attention path (reference mile.py:31-32,
                    546-557); one or two sequences per chip fit HBM.
    batch_override: sequences per chip (default: 4 flagship / 1 LARGE).
    remat:          "off|voxel|all[,enc]" sweep override.
    fast_init:      materialise params from eval_shape instead of the jitted
                    init (use for HLO dumps / CPU-host lowering only — values
                    differ from flax initializers).
    """
    import jax
    import jax.numpy as jnp

    from muvo_tpu.config import get_cfg
    from muvo_tpu.data.synthetic import synthetic_batch
    from muvo_tpu.parallel.mesh import make_mesh, shard_batch
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(_repo_root(), "muvo_tpu/configs/muvo.yml"))
    # 4 sequences per chip (24 frames) with decoder remat only: the folded
    # voxel trunk freed enough HBM that encoder activations fit unremated;
    # bs6 OOMs under the round-3 fused kernels, bs8/enc-on is slower.
    cfg.BATCHSIZE = 4 * max(1, len(jax.devices()))
    cfg.MODEL.REMAT = True
    cfg.MODEL.REMAT_ENCODER = False
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 1
    if large:
        cfg.MODEL.TRANSFORMER.LARGE = True
        cfg.BATCHSIZE = 1 * max(1, len(jax.devices()))
    if batch_override:
        cfg.BATCHSIZE = batch_override * max(1, len(jax.devices()))
    if remat:
        opts = remat.split(",")
        if opts[0] not in ("off", "voxel", "all"):
            raise ValueError(f"remat scope must be off|voxel|all, "
                             f"got {opts[0]!r}")
        cfg.MODEL.REMAT = opts[0] != "off"
        cfg.MODEL.REMAT_SCOPE = opts[0] if opts[0] != "off" else "all"
        cfg.MODEL.REMAT_ENCODER = "enc" in opts

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    batch = synthetic_batch(cfg, batch_size=cfg.BATCHSIZE,
                            sequence_length=seq)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = trainer.init_state(batch, fast=fast_init)
    train_step = trainer.make_train_step(donate=donate)
    sharded = shard_batch(batch, mesh)
    # Nonce the rng per process: the axon tunnel keeps a PERSISTENT result
    # cache keyed on input values, so a fully deterministic bench run is
    # replayed from cache at RTT speed on its second invocation (observed:
    # "424 f/s/chip, MFU 6.06" for the LARGE step — 25x the real number;
    # same artifact tools/mxu_smallk_microbench.py documents). A fresh seed
    # makes step 1's outputs unique, which uniquifies the whole chained
    # timing loop. Shapes/dtypes are unchanged, so compile caches still hit.
    import time
    rng = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (state, sharded, rng))
    return FlagshipStep(cfg, trainer, state, train_step, sharded, rng,
                        abstract)
