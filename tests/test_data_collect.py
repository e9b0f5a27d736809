"""data_collect entry point: the shipped obs suite must satisfy both the PPO
expert (process_obs) and the DataWriter, the test-suite configs must load,
and the LeaderBoard scenario data must be constructible into tasks —
everything short of a live CARLA server (exercised on the kinematic env)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_collect as dc
from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv


def test_obs_configs_cover_expert_and_writer():
    obs = dc.load_obs_configs()["hero"]
    # PPO expert needs (rl/agent.py process_obs with control+vel_xy states)
    for key in ("birdview", "speed", "control", "velocity"):
        assert key in obs, f"expert obs {key} missing"
    # DataWriter persistence needs (sim/data_writer.py save_files)
    for key in ("central_rgb", "depth_semantic", "gnss", "route_plan",
                "lidar_points_semantic", "birdview_label"):
        assert key in obs, f"writer obs {key} missing"
    # every module path resolves in the registry
    import importlib

    for key, c in obs.items():
        mod = importlib.import_module(
            f"muvo_tpu.sim.obs_managers.{c['module']}")
        assert hasattr(mod, "ObsManager"), c["module"]


def test_test_suites_load():
    lb_data = dc.load_test_suites("lb_data")
    assert len(lb_data) == 4
    assert all(s["env_id"] == "Endless-v0" for s in lb_data)
    assert lb_data[0]["env_configs"]["carla_map"] == "Town01"
    lb_test = dc.load_test_suites("lb_test")
    assert len(lb_test) == 6
    assert all(s["env_id"] == "LeaderBoard-v0" for s in lb_test)


def test_leaderboard_tasks_from_shipped_data():
    from muvo_tpu.sim.envs import LeaderboardEnv

    for town in ("Town01", "Town02"):
        tasks = LeaderboardEnv.build_all_tasks(town, "new")
        assert len(tasks) > 0
        task = tasks[0]
        hero = task["ego_vehicles"]["hero"]
        assert hero["model"] == "vehicle.lincoln.mkz_2017"
        assert len(hero["spawn_transform"]) == 6
        assert len(hero["targets"]) >= 1
        assert task["num_zombie_vehicles"] == \
            LeaderboardEnv.NUM_ZOMBIE_VEHICLES[town]
    # Town04 train/test split folders resolve
    assert LeaderboardEnv.build_all_tasks("Town04", "simple", "train")
    assert LeaderboardEnv.build_all_tasks("Town04", "simple", "test")


def test_kinematic_collection_full_obs_roundtrip(tmp_path):
    """Collection with the SHIPPED obs suite semantics: the expert consumes
    the obs, the writer persists them, and CarlaDataset reads back a batch
    including the gnss keys (VERDICT r1 item 5)."""
    import jax
    import jax.numpy as jnp

    from muvo_tpu.rl.agent import RlBirdviewAgent, process_obs
    from muvo_tpu.rl.policy import PpoPolicy
    from muvo_tpu.sim.data_writer import DataWriter

    env = KinematicDrivingEnv(seed=3, episode_steps=10, image_hw=(96, 160))
    obs = env.reset()

    policy = PpoPolicy()
    pi = process_obs(obs["hero"], ["control", "vel_xy"], train=False)
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.asarray(pi["birdview"]),
                         jnp.asarray(pi["state"]), jax.random.PRNGKey(1))
    agent = RlBirdviewAgent(policy, params)

    run_dir = tmp_path / "trainval" / "train" / "Town01" / "0000"
    writer = DataWriter(str(run_dir), "hero", run_info={"town": "Town01"})
    valid, ep_stat, total = dc.run_episode(env, agent, writer, max_steps=15)
    assert valid
    assert np.isfinite(total)

    import pandas as pd

    df = pd.read_pickle(run_dir / "pd_dataframe.pkl")
    for key in ("gnss", "target_gps", "imu", "command", "target_gps_next",
                "command_next"):
        assert key in df.columns, f"gnss key {key} not persisted"

    from muvo_tpu.data.dataset import CarlaDataset
    from muvo_tpu.data.synthetic import tiny_test_cfg

    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False
    cfg.SEMANTIC_SEG.ENABLED = False
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = -100.0
    ds = CarlaDataset(cfg, mode="train", sequence_length=2,
                      dataset_root=str(tmp_path))
    assert len(ds) > 0
    item = ds[0]
    assert item["image"].shape == (2, 96, 160, 3)


def test_restart_protocol_checkpointing(tmp_path, monkeypatch):
    """Suite-index checkpoint + exit-code-1 restart contract
    (reference data_collect.py:292-297), without CARLA: patch gym.make to a
    kinematic env and run main() through all 4 lb_data suites."""
    import gymnasium as gym

    calls = []

    class _KinEnvShim(KinematicDrivingEnv):
        num_tasks = 1
        task = {"weather": "ClearNoon", "num_zombie_vehicles": 0,
                "num_zombie_walkers": 0, "route_id": 0}

        def __init__(self):
            super().__init__(seed=0, episode_steps=8, image_hw=(96, 160))
            self.unwrapped = self

        def set_task_idx(self, i):
            pass

        def close(self):
            pass

    def fake_make(env_id, **kwargs):
        calls.append((env_id, kwargs.get("carla_map")))
        return _KinEnvShim()

    monkeypatch.setattr(gym, "make", fake_make)
    rc_seen = []
    for invocation in range(5):
        argv = ["data_collect.py",
                "--dataset-root", str(tmp_path / "ds"),
                "--n-episodes", "4", "--max-steps", "12",
                "--work-dir", str(tmp_path)]
        monkeypatch.setattr(sys, "argv", argv)
        try:
            rc = dc.main() or 0
        except SystemExit as e:
            rc = e.code
        rc_seen.append(rc)
        if rc == 0:
            break
    # 3 restarts (exit 1) then clean exit 0 on the final suite
    assert rc_seen == [1, 1, 1, 0]
    assert [c[1] for c in calls] == ["Town01", "Town03", "Town04", "Town06"]
    with open(tmp_path / "port_2000_checkpoint.txt") as f:
        assert f.read().strip() == "4"
