"""PPO expert training entry point.

Trains the bird's-eye-view PPO driving expert (the data-collection driver)
with the JAX PPO stack. Works against any env exposing the
CarlaMultiAgentEnv step contract — the CARLA EndlessEnv for real training or
the built-in kinematic env for smoke runs (--env kinematic).

Counterpart of the reference's carla-roach training loop (the reference repo
ships only the trained expert; rl_birdview/models/ppo.py is its algorithm).
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import argparse
import json
import time

import numpy as np


def make_env(args):
    if args.env == "kinematic":
        from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv

        return KinematicDrivingEnv(seed=args.seed,
                                   episode_steps=args.episode_steps)
    from muvo_tpu.sim.envs import EndlessEnv

    obs_configs = {"hero": {
        "birdview": {"module": "birdview.chauffeurnet"},
        "speed": {"module": "actor_state.speed"},
        "control": {"module": "actor_state.control"},
        "velocity": {"module": "actor_state.velocity"},
    }}
    reward_configs = {"hero": {
        "entry_point": "muvo_tpu.sim.reward:ValeoActionReward"}}
    terminal_configs = {"hero": {
        "entry_point": "muvo_tpu.sim.reward:ValeoTerminal"}}
    return EndlessEnv(args.carla_map, args.host, args.port, args.seed,
                      no_rendering=True, obs_configs=obs_configs,
                      reward_configs=reward_configs,
                      terminal_configs=terminal_configs)


def main():
    import jax
    import jax.numpy as jnp

    from muvo_tpu.rl.agent import process_obs
    from muvo_tpu.rl.policy import PpoPolicy
    from muvo_tpu.rl.ppo import PPO, RolloutBuffer

    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="kinematic",
                    choices=["kinematic", "carla"])
    ap.add_argument("--carla-map", default="Town01")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--episode-steps", type=int, default=300)
    ap.add_argument("--total-timesteps", type=int, default=20000)
    ap.add_argument("--n-steps", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--n-epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--out", default="ppo_params.pkl")
    args = ap.parse_args()

    env = make_env(args)
    input_states = ["control", "vel_xy"]

    obs = env.reset()
    pi = process_obs(obs["hero"], input_states, train=False)
    policy = PpoPolicy()
    params = policy.init(jax.random.PRNGKey(args.seed),
                         jnp.asarray(pi["birdview"]), jnp.asarray(pi["state"]),
                         jax.random.PRNGKey(1))
    ppo = PPO(policy, params, learning_rate=args.lr,
              batch_size=args.batch_size, n_epochs=args.n_epochs)

    fwd = jax.jit(lambda p, bv, st, key: policy.apply(p, bv, st, key))

    bv_shape = pi["birdview"].shape[1:]
    st_shape = pi["state"].shape[1:]
    rng = jax.random.PRNGKey(args.seed + 1)
    num_timesteps = 0
    episode_rewards = []
    ep_reward = 0.0
    last_done = 0.0

    while num_timesteps < args.total_timesteps:
        buf = RolloutBuffer(args.n_steps,
                            {"birdview": bv_shape, "state": st_shape})
        t0 = time.time()
        for _ in range(args.n_steps):
            rng, key = jax.random.split(rng)
            pi = process_obs(obs["hero"], input_states, train=False)
            actions, values, log_probs, p1, p2 = fwd(
                ppo.params, jnp.asarray(pi["birdview"]),
                jnp.asarray(pi["state"]), key,
            )
            a = np.asarray(actions)[0]
            # Beta actions in [0,1] -> acc/steer in [-1,1]
            acc, steer = 2 * a - 1
            obs, reward, done_d, info = env.step(
                {"hero": {"throttle": max(acc, 0.0), "steer": steer,
                          "brake": max(-acc, 0.0)}}
            )
            ep_reward += reward["hero"]
            sug = info["hero"]["terminal_debug"].get("exploration_suggest",
                                                     {"acc": 0, "steer": 0})
            buf.add(
                {"birdview": pi["birdview"], "state": pi["state"]},
                np.asarray(actions), np.array([reward["hero"]]),
                np.array([last_done]), np.asarray(values),
                np.asarray(log_probs), np.asarray(p1), np.asarray(p2),
                np.array([sug["acc"]]), np.array([sug["steer"]]),
            )
            last_done = float(done_d["hero"])
            num_timesteps += 1
            if done_d["hero"]:
                episode_rewards.append(ep_reward)
                ep_reward = 0.0
                obs = env.reset()

        pi = process_obs(obs["hero"], input_states, train=False)
        last_values = np.asarray(policy.apply(
            ppo.params, jnp.asarray(pi["birdview"]), jnp.asarray(pi["state"]),
            method=policy.forward_value,
        ))
        buf.compute_returns_and_advantage(last_values,
                                          np.array([last_done]))
        summary = ppo.train(buf)
        summary.update({
            "timesteps": num_timesteps,
            "rollout_fps": args.n_steps / (time.time() - t0),
            "mean_ep_reward": float(np.mean(episode_rewards[-10:]))
            if episode_rewards else 0.0,
        })
        print(json.dumps({k: round(float(v), 4) for k, v in summary.items()}))

    import pickle

    with open(args.out, "wb") as f:
        pickle.dump(jax.device_get(ppo.params), f)
    print(f"saved policy params to {args.out}")


if __name__ == "__main__":
    main()
