"""Closed-loop world-model agent: obs conversion + latent stepping on the
CARLA-free kinematic env (the same contract evaluate.py drives in CARLA)."""

import numpy as np

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.sim.kinematic_env import KinematicDrivingEnv


def test_muvo_agent_closed_loop():
    import jax.numpy as jnp

    from muvo_tpu.agents.muvo_agent import MuvoAgent
    from muvo_tpu.parallel.mesh import make_mesh
    from muvo_tpu.training.trainer import WorldModelTrainer

    cfg = tiny_test_cfg()
    cfg.PRECISION = "32"
    cfg.MODEL.TRANSFORMER.N_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.DECODER_BASE_CHANNELS = 32

    trainer = WorldModelTrainer(cfg, mesh=make_mesh(n_data=1))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1).items()}
    state = trainer.init_state(batch, fast=True)
    agent = MuvoAgent(cfg, trainer, state)

    env = KinematicDrivingEnv(seed=5, episode_steps=8, image_hw=(96, 160))
    obs = env.reset()
    agent.reset()
    controls = []
    for _ in range(6):
        control = agent.run_step(obs["hero"], env.timestamp)
        assert set(control) >= {"throttle", "steer", "brake"}
        assert 0.0 <= control["throttle"] <= 1.0
        assert 0.0 <= control["brake"] <= 1.0
        assert -1.0 <= control["steer"] <= 1.0
        controls.append(control)
        obs, reward, done, info = env.step({"hero": control})
    assert np.isfinite(agent.supervision_dict["action"]).all()
    # latent carry persisted across ticks (session stride counter moved)
    assert agent.session.carry is not None
