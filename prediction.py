"""Evaluation ("imagination") entry point.

TPU-native counterpart of the reference prediction.py: loads a checkpoint,
runs the test protocol (observe RF frames, imagine FH frames) over the three
strided test samplers, and reports reconstruction + imagination metrics.

Usage:
    python prediction.py --config-file muvo_tpu/configs/test_base_1d.yml \
        PRETRAINED.PATH <ckpt-dir-or-torch-ckpt>
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import json

import jax

from muvo_tpu.config import get_cfg, get_parser
from muvo_tpu.data.dataset import make_dataset
from muvo_tpu.data.datamodule import make_test_samplers
from muvo_tpu.data.loader import DataLoader
from muvo_tpu.parallel.mesh import make_mesh
from muvo_tpu.training.evaluator import Evaluator
from muvo_tpu.training.trainer import WorldModelTrainer


def main():
    args = get_parser().parse_args()
    cfg = get_cfg(args)

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)

    seq_len = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    test_ds = make_dataset(cfg, "train", seq_len)
    samplers = make_test_samplers(len(test_ds))

    example = next(iter(DataLoader(test_ds, cfg.BATCHSIZE, shuffle=False)))
    state = trainer.init_state(example)

    if cfg.PRETRAINED.PATH:
        path = cfg.PRETRAINED.PATH
        if path.endswith(".ckpt") or path.endswith(".pt") or path.endswith(".pth"):
            from muvo_tpu.training.weight_convert import load_reference_weights

            params = load_reference_weights(path, state.params, cfg)
            state = state._replace(params=params)
            print(f"Loaded converted torch weights from {path}")
        else:
            from muvo_tpu.training.checkpoint import CheckpointManager

            ckpt = CheckpointManager(path)
            restored = ckpt.restore(template=state)
            if restored is not None:
                from muvo_tpu.training.trainer import TrainState

                state = TrainState(**restored["state"])
                print(f"Restored checkpoint from {path}")

    evaluator = Evaluator(trainer)
    results = {}
    for idx, sampler in enumerate(samplers):
        loader = DataLoader(test_ds, cfg.BATCHSIZE, shuffle=False,
                            sampler=sampler)
        # Full test loader, no cap: the reference's prediction.py calls
        # trainer.test() with no test-batch limit (its limit_val_batches=1
        # is a Lightning FRACTION = 100%, and applies to val, not test).
        recon, imagine = evaluator.run(state, iter(loader),
                                       max_batches=None)
        results[f"test{idx}"] = recon
        results[f"test{idx}_imagine"] = imagine
        print(f"[test{idx}] recon: {recon}")
        print(f"[test{idx}] imagine: {imagine}")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
