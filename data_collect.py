"""Data-collection entry point: drive the expert in CARLA, record episodes.

Counterpart of reference data_collect.py: resumable episode loop stepping the
environment at 10 FPS with the PPO expert, writing each tick through the
DataWriter, with crash-recovery checkpoint files (port_*_checkpoint.txt) and
the exit-code-1 restart protocol per test-suite env (pair with a bash
until-loop like reference run/data_collect.sh).

Requires a running CARLA server + the carla package.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def run_single(run_name, env, driver, data_writer, max_steps=3000):
    from muvo_tpu.rl.agent import process_obs

    obs = env.reset()
    ev_id = list(obs.keys())[0]
    driver.reset("")
    total_reward = 0.0
    for step in range(max_steps):
        control = driver.run_step(obs[ev_id], env.timestamp)
        obs, reward, done, info = env.step({ev_id: control})
        data_writer.write(
            env.timestamp, obs, {ev_id: driver.supervision_dict}, reward
        )
        total_reward += reward[ev_id]
        if done[ev_id]:
            valid = data_writer.close(
                info[ev_id]["terminal_debug"], remove_final_steps=True
            )
            return valid, info[ev_id].get("episode_stat", {}), total_reward
    valid = data_writer.close(
        {"traffic_rule_violated": False, "blocked": False,
         "route_deviation": False},
        remove_final_steps=False,
    )
    return valid, {}, total_reward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-root", required=True)
    ap.add_argument("--carla-map", default="Town01")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=2000)
    ap.add_argument("--n-episodes", type=int, default=25)
    ap.add_argument("--num-zombie-vehicles", type=int, default=100)
    ap.add_argument("--num-zombie-walkers", type=int, default=100)
    ap.add_argument("--policy-ckpt", default="")
    ap.add_argument("--seed", type=int, default=2021)
    args = ap.parse_args()

    # crash-recovery checkpoint (reference data_collect.py:126-154)
    ckpt_file = f"port_{args.port}_checkpoint.txt"
    start_ep = 0
    if os.path.isfile(ckpt_file):
        with open(ckpt_file) as f:
            start_ep = int(f.read().strip() or 0)
        print(f"Resuming collection at episode {start_ep}")

    from muvo_tpu.rl.agent import RlBirdviewAgent
    from muvo_tpu.sim.data_writer import DataWriter
    from muvo_tpu.sim.env import CarlaMultiAgentEnv

    obs_configs = {
        "hero": {
            "central_rgb": {"module": "camera.rgb", "height": 600,
                            "width": 960, "fov": 100},
            "lidar_points_semantic": {"module": "lidar.ray_cast_semantic"},
        }
    }
    reward_configs = {
        "hero": {"entry_point": "muvo_tpu.sim.reward:ValeoActionReward"}
    }
    terminal_configs = {
        "hero": {"entry_point": "muvo_tpu.sim.reward:ValeoTerminal"}
    }
    tasks = [{
        "ego_vehicles": {"hero": {}},
        "num_zombie_vehicles": args.num_zombie_vehicles,
        "num_zombie_walkers": args.num_zombie_walkers,
        "weather": "dynamic_1.0",
    }]

    env = CarlaMultiAgentEnv(
        carla_map=args.carla_map, host=args.host, port=args.port,
        seed=args.seed, no_rendering=False, obs_configs=obs_configs,
        reward_configs=reward_configs, terminal_configs=terminal_configs,
        all_tasks=tasks,
    )

    driver = RlBirdviewAgent()
    if args.policy_ckpt:
        import pickle

        with open(args.policy_ckpt, "rb") as f:
            driver.params = pickle.load(f)

    stats = []
    for ep in range(start_ep, args.n_episodes):
        run_dir = os.path.join(args.dataset_root, "trainval", "train",
                               args.carla_map, f"{ep:04d}")
        writer = DataWriter(run_dir, "hero",
                            run_info={"town": args.carla_map, "episode": ep})
        valid, ep_stat, total_reward = run_single(
            f"ep{ep}", env, driver, writer
        )
        stats.append({"episode": ep, "valid": valid, "reward": total_reward,
                      **ep_stat})
        print(json.dumps(stats[-1]))
        with open(ckpt_file, "w") as f:
            f.write(str(ep + 1))

    env.close()
    os.remove(ckpt_file)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        sys.exit(1)
