"""End-to-end collection loop in the CARLA-free kinematic env: expert agent
drives, DataWriter records, CarlaDataset loads the result."""

import numpy as np
import pytest

from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv


def test_env_steps_and_terminates():
    env = KinematicDrivingEnv(seed=0, episode_steps=30)
    obs = env.reset()
    assert "hero" in obs and obs["hero"]["birdview"]["masks"].shape == (15, 192, 192)
    total = 0.0
    done = False
    for _ in range(40):
        obs, reward, done_d, info = env.step(
            {"hero": {"throttle": 0.6, "steer": 0.0, "brake": 0.0}}
        )
        total += reward["hero"]
        if done_d["hero"]:
            done = True
            break
    assert done, "episode should time out"
    assert np.isfinite(total)


def test_collection_loop_with_agent_and_writer(tmp_path):
    import jax
    import jax.numpy as jnp

    from muvo_tpu.rl.agent import RlBirdviewAgent, process_obs
    from muvo_tpu.rl.policy import PpoPolicy
    from muvo_tpu.sim.data_writer import DataWriter

    env = KinematicDrivingEnv(seed=1, episode_steps=12, image_hw=(96, 160))
    obs = env.reset()

    policy = PpoPolicy()
    pi = process_obs(obs["hero"], ["control", "vel_xy"], train=False)
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.asarray(pi["birdview"]), jnp.asarray(pi["state"]),
                         jax.random.PRNGKey(1))
    agent = RlBirdviewAgent(policy, params)

    run_dir = tmp_path / "trainval" / "train" / "Town01" / "0000"
    writer = DataWriter(str(run_dir), "hero", run_info={"town": "Town01"})

    done = False
    steps = 0
    while not done and steps < 20:
        control = agent.run_step(obs["hero"], env.timestamp)
        obs, reward, done_d, info = env.step({"hero": control})
        writer.write(env.timestamp, obs, {"hero": agent.supervision_dict},
                     reward)
        done = done_d["hero"]
        steps += 1
    assert done

    valid = writer.close(info["hero"]["terminal_debug"],
                         remove_final_steps=False)
    assert valid
    assert (run_dir / "pd_dataframe.pkl").exists()

    # and the training dataset can read it back
    from muvo_tpu.data.dataset import CarlaDataset
    from muvo_tpu.data.synthetic import tiny_test_cfg

    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False
    cfg.SEMANTIC_SEG.ENABLED = False
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = -100.0  # keep the low-reward random run
    ds = CarlaDataset(cfg, mode="train", sequence_length=2,
                      dataset_root=str(tmp_path))
    assert len(ds) > 0
    item = ds[0]
    assert item["image"].shape == (2, 96, 160, 3)
    assert item["range_view_pcd_xyzd"].shape == (2, 64, 128, 4)
