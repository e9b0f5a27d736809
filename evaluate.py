"""Closed-loop evaluation entry point: drive the world model in CARLA.

Counterpart of the reference's evaluation flow (config/evaluate.yaml:
LeaderBoard test suites + the muvo agent + leaderboard reward/terminal):
each invocation handles ONE suite env (index in
port_<port>_eval_checkpoint.txt),
runs every task (route x weather) once with the MuvoAgent, records the
leaderboard episode statistics (route completion, infractions, driving
score), and exits 1 while suites remain — same restart contract as
data_collect.py.

Usage:
    python evaluate.py --dataset-root ignored --ckpt <orbax-dir-or-torch-ckpt>
        --config-file muvo_tpu/configs/muvo.yml [--test-suites lb_test]
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import argparse
import json
import os
import sys

import numpy as np

from data_collect import load_obs_configs, load_test_suites


def build_agent(cfg, ckpt: str, is_dreaming: bool):
    import jax

    from muvo_tpu.agents.muvo_agent import MuvoAgent
    from muvo_tpu.data.synthetic import synthetic_batch
    from muvo_tpu.parallel.mesh import make_mesh
    from muvo_tpu.training.trainer import WorldModelTrainer

    trainer = WorldModelTrainer(cfg, mesh=make_mesh())
    example = {k: np.asarray(v)
               for k, v in synthetic_batch(cfg, batch_size=1).items()}
    state = trainer.init_state(example)
    if ckpt:
        if os.path.isdir(ckpt):
            from muvo_tpu.training.checkpoint import CheckpointManager
            from muvo_tpu.training.trainer import TrainState

            restored = CheckpointManager(ckpt).restore(template=state)
            if restored is not None:
                state = TrainState(**restored["state"])
        elif ckpt.endswith((".ckpt", ".pt", ".pth")):
            from muvo_tpu.training.weight_convert import load_reference_weights

            params = load_reference_weights(ckpt, state.params, cfg)
            state = state._replace(params=params)
    return MuvoAgent(cfg, trainer, state, is_dreaming=is_dreaming)


def run_episode(env, agent, max_steps: int):
    obs = env.reset()
    ev_id = list(obs.keys())[0]
    agent.reset()
    for _ in range(max_steps):
        control = agent.run_step(obs[ev_id], env.timestamp)
        obs, reward, done, info = env.step({ev_id: control})
        if done[ev_id]:
            return info[ev_id].get("episode_stat", {}), \
                info[ev_id].get("episode_event", {})
    return {}, {}


def main():
    from muvo_tpu.config import get_cfg, get_parser

    ap = get_parser()
    ap.add_argument("--test-suites", default="lb_test")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=2000)
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--max-steps", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=2021)
    ap.add_argument("--work-dir", default=".")
    ap.add_argument("--dreaming", action="store_true",
                    help="drive from imagination between observation strides")
    args = ap.parse_args()
    cfg = get_cfg(args)

    from muvo_tpu.sim.envs import register_envs

    register_envs()
    import gymnasium as gym

    test_suites = load_test_suites(args.test_suites)
    obs_configs = load_obs_configs()
    reward_configs = {
        "hero": {"entry_point": "muvo_tpu.sim.reward:ValeoActionReward"}
    }
    terminal_configs = {
        "hero": {"entry_point": "muvo_tpu.sim.reward:LeaderboardTerminal"}
    }

    # Namespaced per tool: data_collect.py uses port_<port>_checkpoint.txt
    # in the same work dir, and a stale collection index must not be read
    # as evaluation progress (or vice versa).
    ckpt_file = os.path.join(args.work_dir,
                             f"port_{args.port}_eval_checkpoint.txt")
    env_idx = 0
    if os.path.isfile(ckpt_file):
        with open(ckpt_file) as f:
            env_idx = int(f.read().strip() or 0)
    if env_idx >= len(test_suites):
        print("Evaluation finished for all suite envs")
        return 0

    suite = test_suites[env_idx]
    env_cfg = dict(suite["env_configs"])
    carla_map = env_cfg.pop("carla_map")
    env = gym.make(
        suite["env_id"], obs_configs=obs_configs,
        reward_configs=reward_configs, terminal_configs=terminal_configs,
        carla_map=carla_map, host=args.host, port=args.port,
        seed=args.seed, no_rendering=False, **env_cfg,
    ).unwrapped

    agent = build_agent(cfg, args.ckpt, args.dreaming)

    results = []
    for task_idx in range(env.num_tasks):
        env.set_task_idx(task_idx)
        ep_stat, ep_event = run_episode(env, agent, args.max_steps)
        record = {"suite": env_idx, "task": task_idx,
                  "map": carla_map, **ep_stat}
        results.append(record)
        print(json.dumps(record, default=float))
    out_file = os.path.join(args.work_dir,
                            f"port_{args.port}_eval_{env_idx}.json")
    with open(out_file, "w") as f:
        json.dump(results, f, indent=2, default=float)
    env.close()

    with open(ckpt_file, "w") as f:
        f.write(str(env_idx + 1))
    if env_idx + 1 < len(test_suites):
        print(f"Suite env {env_idx} done — exiting 1 for the restart loop")
        sys.exit(1)
    print(f"Finished all {len(test_suites)} suite envs")
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
