"""Round-4 training-health run: prove the framework LEARNS on structured data.

VERDICT r3 item #3: collect a few thousand frames from the CARLA-free
kinematic env (same on-disk layout the reference's data_collect produces,
reference dataset doc muvo/data/dataset.py:21-47), offline-voxelise them,
train the flagship world model a few thousand TPU steps, and report
held-out metrics clearly above the chance floor. The chance floor is
measured, not guessed: the SAME evaluator runs on the SAME held-out
episodes with the random-init model (step 0) and with the trained
checkpoint; the eval protocol mirrors the reference's test loop
(muvo/trainer.py:234-247 — encode once, imagine per sample).

Phases (subcommands, so each can run as its own background job):
    collect   N train episodes + M held-out val episodes (distinct seeds)
    voxelize  offline voxel generation over both splits
    evaluate  Evaluator (recon + imagine suites) on the val split for a
              checkpoint dir (or --random-init for the chance floor)

Training itself uses the standard train.py CLI (see SUMMARY.md for the
exact command) — the health run exercises the real entry points, not a
bespoke loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


def flagship_cfg(dataroot: str):
    from muvo_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "muvo_tpu/configs/muvo.yml"))
    cfg.DATASET.DATAROOT = dataroot
    # the PPO driver is untrained — keep every recorded frame
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = -1000.0
    return cfg


def _scripted_control(env, obs, rng, target_speed: float):
    """Route-following proportional driver (an untrained PPO expert sits
    below 1 m/s and trips ValeoTerminal's stuck detector at 100 steps —
    the health run needs episodes with real motion so imagination has
    dynamics to learn)."""
    import numpy as np

    _, lateral, heading_err, _ = env._route_tracking()
    speed = float(obs["speed"]["forward_speed"])
    steer = float(np.clip(1.2 * heading_err - 0.12 * lateral
                          + rng.normal(0.0, 0.01), -1.0, 1.0))
    accel = 0.4 * (target_speed - speed)
    throttle = float(np.clip(accel, 0.0, 0.75))
    brake = float(np.clip(-accel, 0.0, 0.6))
    return {"throttle": throttle, "steer": steer, "brake": brake}


def collect(dataroot: str, split: str, episodes: int, steps: int,
            seed0: int):
    import numpy as np

    from muvo_tpu.sim.data_writer import DataWriter
    from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv

    for ep in range(episodes):
        rng = np.random.default_rng(seed0 + ep)
        target_speed = float(rng.uniform(3.5, 6.5))
        env = KinematicDrivingEnv(seed=seed0 + ep, episode_steps=steps,
                                  image_hw=(600, 960), lidar_points=30000)
        obs = env.reset()
        run_dir = os.path.join(dataroot, "trainval", split, "Town01",
                               f"{seed0 + ep:04d}")
        writer = DataWriter(run_dir, "hero",
                            run_info={"town": "Town01", "episode": ep})
        done = False
        while not done:
            control = _scripted_control(env, obs["hero"], rng, target_speed)
            supervision = {
                "action": np.array([control["throttle"], control["steer"],
                                    control["brake"]], np.float32),
                "value": 0.0,
                "action_mu": np.array([control["throttle"] - control["brake"],
                                       control["steer"]], np.float32),
                "action_sigma": np.full(2, 0.1, np.float32),
                "speed": obs["hero"]["speed"]["forward_speed"],
            }
            obs, reward, done_d, info = env.step({"hero": control})
            writer.write(env.timestamp, obs, {"hero": supervision}, reward)
            done = done_d["hero"]
        assert writer.close(info["hero"]["terminal_debug"],
                            remove_final_steps=False)
        n = env.timestamp["step"]
        print(f"collected {split} episode {ep + 1}/{episodes} "
              f"({n} steps) -> {run_dir}", flush=True)


def voxelize(dataroot: str, cfg):
    from glob import glob

    from tools.generate_voxels import process_run, voxel_offset_from_cfg

    # same offset formula the e2e pipeline uses (matches the dataset's
    # voxel decode alignment)
    offset = voxel_offset_from_cfg(cfg.VOXEL)
    runs = sorted(glob(os.path.join(dataroot, "trainval", "*", "*", "*")))
    for i, run in enumerate(runs):
        process_run(run, fov=110, resolution=cfg.VOXEL.RESOLUTION,
                    size=list(cfg.VOXEL.SIZE), offset=offset, workers=1)
        print(f"voxelised run {i + 1}/{len(runs)}: {run}", flush=True)


def evaluate(dataroot: str, ckpt_dir: str, random_init: bool, batches: int,
             out_json: str, batch_size: int = 2, accum: int = 16,
             step: int = None):
    from muvo_tpu.data.dataset import CarlaDataset
    from muvo_tpu.data.loader import DataLoader
    from muvo_tpu.parallel.mesh import make_mesh
    from muvo_tpu.training.evaluator import Evaluator
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg = flagship_cfg(dataroot)
    cfg.BATCHSIZE = batch_size
    cfg.MODEL.REMAT = True
    cfg.MODEL.REMAT_ENCODER = False
    # the optimizer-state TEMPLATE must match how the checkpoint was
    # trained (MultiSteps wraps opt_state when accum > 1)
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = accum
    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    ds = CarlaDataset(cfg, mode="val", sequence_length=seq,
                      dataset_root=dataroot)
    print(f"val dataset: {len(ds)} sequence pointers", flush=True)
    loader = DataLoader(ds, cfg.BATCHSIZE, shuffle=False, num_workers=2)

    example = next(iter(loader))
    state = trainer.init_state(example)
    if not random_init:
        from muvo_tpu.training.checkpoint import CheckpointManager
        from muvo_tpu.training.trainer import TrainState

        restored = CheckpointManager(ckpt_dir).restore(step=step,
                                                       template=state)
        assert restored is not None, f"no checkpoint under {ckpt_dir}"
        state = TrainState(**restored["state"])
        print(f"restored checkpoint step {int(state.step)}", flush=True)
    evaluator = Evaluator(trainer)
    recon, imagine = evaluator.run(state, iter(loader), max_batches=batches)
    result = {"random_init": random_init,
              "step": int(state.step),
              "recon": {k: float(v) for k, v in recon.items()},
              "imagine": {k: float(v) for k, v in imagine.items()}}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="phase", required=True)

    c = sub.add_parser("collect")
    c.add_argument("dataroot")
    c.add_argument("--train-episodes", type=int, default=12)
    c.add_argument("--train-steps", type=int, default=300)
    c.add_argument("--val-episodes", type=int, default=3)
    c.add_argument("--val-steps", type=int, default=200)

    v = sub.add_parser("voxelize")
    v.add_argument("dataroot")

    e = sub.add_parser("evaluate")
    e.add_argument("dataroot")
    e.add_argument("--ckpt", default="")
    e.add_argument("--random-init", action="store_true")
    e.add_argument("--batches", type=int, default=16)
    e.add_argument("--batch-size", type=int, default=2)
    e.add_argument("--accum", type=int, default=16)
    e.add_argument("--step", type=int, default=None)
    e.add_argument("--out", default="eval.json")

    args = ap.parse_args()
    if args.phase == "collect":
        collect(args.dataroot, "train", args.train_episodes,
                args.train_steps, seed0=100)
        collect(args.dataroot, "val", args.val_episodes, args.val_steps,
                seed0=900)
    elif args.phase == "voxelize":
        voxelize(args.dataroot, flagship_cfg(args.dataroot))
    else:
        evaluate(args.dataroot, args.ckpt, args.random_init, args.batches,
                 args.out, args.batch_size, args.accum, args.step)


if __name__ == "__main__":
    main()
