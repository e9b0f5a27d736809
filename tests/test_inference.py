"""Deployment session tests: stateful latent carry, stride caching,
imagination rollouts (the closed-loop inference API)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.inference import DeploymentSession
from muvo_tpu.parallel.mesh import make_mesh
from muvo_tpu.training.trainer import WorldModelTrainer


@pytest.fixture(scope="module")
def session():
    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False  # keep CPU decode cheap
    mesh = make_mesh(n_data=1)
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    batch = synthetic_batch(cfg, 1, cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init_state(batch)
    return cfg, DeploymentSession(trainer, state), batch


def test_deployment_stride_caching(session):
    cfg, sess, batch = session
    sess.reset()
    out1 = sess.deployment_forward(batch, is_dreaming=False)
    assert sess.count == 1  # CARLA 10 FPS, stride 0.2s -> act every 2 frames
    h1 = np.asarray(out1["hidden_state"])
    out2 = sess.deployment_forward(batch, is_dreaming=False)
    assert sess.count == 0
    # second tick reuses the cached latent
    np.testing.assert_array_equal(h1, np.asarray(out2["hidden_state"]))
    out3 = sess.deployment_forward(batch, is_dreaming=False)
    h3 = np.asarray(out3["hidden_state"])
    assert np.abs(h3 - h1).max() > 0  # state advanced on the next stride

    assert out1["throttle_brake"].shape == (1, 1, 1)
    assert out1["steering"].shape == (1, 1, 1)


def test_deployment_dreaming(session):
    cfg, sess, batch = session
    sess.reset()
    sess.deployment_forward(batch, is_dreaming=False)
    sess.count = 0  # force an update tick
    out = sess.deployment_forward(batch, is_dreaming=True)
    assert np.isfinite(np.asarray(out["hidden_state"])).all()


def test_sim_forward_rollout(session):
    cfg, sess, batch = session
    sess.reset()
    output, output_imagine = sess.sim_forward(batch, is_dreaming=False)
    fh = batch["image"].shape[1] - 1
    assert output_imagine["state"].shape[1] == fh
    assert output["rgb_1"].shape[1] == 1
    assert np.isfinite(np.asarray(output_imagine["rgb_1"])).all()
