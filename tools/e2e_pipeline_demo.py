"""End-to-end pipeline demo without CARLA:

1. collect episodes in the kinematic env with the PPO expert (DataWriter ->
   reference on-disk layout)
2. offline-voxelise the recorded depth+LiDAR frames (tools/generate_voxels)
3. train the world model on the recorded dataset for a few steps
4. run the eval protocol (observe RF / imagine FH) on it

Usage: python tools/e2e_pipeline_demo.py [workdir] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import numpy as np  # noqa: E402


def tiny_cfg():
    from muvo_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "muvo_tpu/configs/muvo.yml"))
    cfg.IMAGE.SIZE = (96, 160)
    cfg.IMAGE.CROP = [16, 16, 144, 80]
    cfg.ROUTE.SIZE = 32
    cfg.POINTS.CHANNELS = 64
    cfg.POINTS.HORIZON_RESOLUTION = 128
    cfg.VOXEL.SIZE = [64, 64, 64]
    cfg.MODEL.TRANSFORMER.CHANNELS = 64
    cfg.MODEL.EMBEDDING_DIM = 64
    cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM = 96
    cfg.MODEL.TRANSITION.STATE_DIM = 48
    cfg.MODEL.TRANSITION.ACTION_LATENT_DIM = 16
    cfg.VOXEL_SEG.DIMENSION = 16
    cfg.RECEPTIVE_FIELD = 2
    cfg.FUTURE_HORIZON = 1
    cfg.BATCHSIZE = 1
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 1
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = -1000.0
    return cfg


def collect(dataroot: str, n_episodes: int = 1, steps: int = 40):
    import jax
    import jax.numpy as jnp

    from muvo_tpu.rl.agent import RlBirdviewAgent, process_obs
    from muvo_tpu.rl.policy import PpoPolicy
    from muvo_tpu.sim.data_writer import DataWriter
    from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv

    env = KinematicDrivingEnv(seed=3, episode_steps=steps, image_hw=(96, 160))
    obs = env.reset()
    policy = PpoPolicy()
    pi = process_obs(obs["hero"], ["control", "vel_xy"], train=False)
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.asarray(pi["birdview"]), jnp.asarray(pi["state"]),
                         jax.random.PRNGKey(1))
    agent = RlBirdviewAgent(policy, params)

    for ep in range(n_episodes):
        run_dir = os.path.join(dataroot, "trainval", "train", "Town01",
                               f"{ep:04d}")
        writer = DataWriter(run_dir, "hero",
                            run_info={"town": "Town01", "episode": ep})
        obs = env.reset()
        done = False
        while not done:
            control = agent.run_step(obs["hero"], env.timestamp)
            obs, reward, done_d, info = env.step({"hero": control})
            writer.write(env.timestamp, obs,
                         {"hero": agent.supervision_dict}, reward)
            done = done_d["hero"]
        assert writer.close(info["hero"]["terminal_debug"],
                            remove_final_steps=False)
        print(f"collected episode {ep} -> {run_dir}")
    return dataroot


def voxelize(dataroot: str, cfg):
    from tools.generate_voxels import process_run, voxel_offset_from_cfg
    from glob import glob

    offset = voxel_offset_from_cfg(cfg.VOXEL)
    for run in sorted(glob(os.path.join(dataroot, "trainval", "train", "*",
                                        "*"))):
        process_run(run, fov=110, resolution=cfg.VOXEL.RESOLUTION,
                    size=list(cfg.VOXEL.SIZE), offset=offset, workers=1)


def train_and_eval(dataroot: str, cfg, n_steps: int):
    import jax
    import jax.numpy as jnp

    from muvo_tpu.data.dataset import CarlaDataset
    from muvo_tpu.data.loader import DataLoader
    from muvo_tpu.parallel.mesh import make_mesh, shard_batch
    from muvo_tpu.training.evaluator import Evaluator
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg.DATASET.DATAROOT = dataroot
    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    ds = CarlaDataset(cfg, mode="train", sequence_length=seq,
                      dataset_root=dataroot)
    print(f"dataset: {len(ds)} sequence pointers")
    loader = DataLoader(ds, cfg.BATCHSIZE, shuffle=True)

    example = next(iter(loader))
    state = trainer.init_state(example)
    step_fn = trainer.make_train_step(donate=False)
    rng = jax.random.PRNGKey(0)
    it = iter(loader)
    for i in range(n_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        sharded = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                              mesh)
        state, metrics = step_fn(state, sharded, rng)
        print(f"train step {i}: loss={float(metrics['loss']):.4f}")

    evaluator = Evaluator(trainer)
    recon, imagine = evaluator.run(
        state, iter(DataLoader(ds, cfg.BATCHSIZE, shuffle=False)),
        max_batches=2,
    )
    print("recon metrics:", {k: round(v, 4) for k, v in recon.items()})
    print("imagine metrics:", {k: round(v, 4) for k, v in imagine.items()})
    return recon, imagine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/muvo_e2e")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    cfg = tiny_cfg()
    os.makedirs(args.workdir, exist_ok=True)
    collect(args.workdir)
    voxelize(args.workdir, cfg)
    train_and_eval(args.workdir, cfg, args.steps)
    print("E2E PIPELINE OK")


if __name__ == "__main__":
    main()
