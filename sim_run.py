"""Open-loop "simulated run" entry point.

TPU-native counterpart of the reference sim_run.py: iterates the test
dataloader through the stateful autoregressive inference API
(observe one frame per model stride, then imagine the remaining horizon),
collecting reconstruction and imagination artifacts. The latent state carry
stays on device across calls — no host round-trips in the rollout.
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from muvo_tpu.config import get_cfg, get_parser
from muvo_tpu.data.dataset import make_dataset
from muvo_tpu.data.loader import DataLoader
from muvo_tpu.inference import DeploymentSession
from muvo_tpu.parallel.mesh import make_mesh
from muvo_tpu.training.trainer import WorldModelTrainer


def main():
    args = get_parser().parse_args()
    cfg = get_cfg(args)

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)

    seq_len = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    ds = make_dataset(cfg, "train", seq_len)
    loader = DataLoader(ds, cfg.BATCHSIZE, shuffle=False,
                        sampler=range(0, len(ds), max(1, len(ds) // 100)))

    example = next(iter(DataLoader(ds, cfg.BATCHSIZE, shuffle=False)))
    state = trainer.init_state(example)

    if cfg.PRETRAINED.PATH and os.path.isdir(cfg.PRETRAINED.PATH):
        from muvo_tpu.training.checkpoint import CheckpointManager
        from muvo_tpu.training.trainer import TrainState

        restored = CheckpointManager(cfg.PRETRAINED.PATH).restore(template=state)
        if restored is not None:
            state = TrainState(**restored["state"])

    session = DeploymentSession(trainer, state)
    stats = []
    for i, batch in enumerate(loader):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        out, out_imagine = session.sim_forward(batch, is_dreaming=False)
        stats.append({
            "step": i,
            "throttle_brake": float(np.asarray(out["throttle_brake"]).mean()),
            "steering": float(np.asarray(out["steering"]).mean()),
        })
        if i % 20 == 0:
            print(json.dumps(stats[-1]))
    print(f"sim_run complete: {len(stats)} model steps")


if __name__ == "__main__":
    main()
