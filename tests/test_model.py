"""End-to-end model tests on the tiny config: forward shapes, imagination,
preprocessing pyramids, loss computation, deterministic replay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muvo_tpu.config import as_static
from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.models.preprocess import PreProcess
from muvo_tpu.models.world_model import MuvoWorldModel
from muvo_tpu.training.objectives import compute_loss, reduce_loss


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_cfg()
    batch = synthetic_batch(cfg, 1, 3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)
    model = MuvoWorldModel(as_static(cfg))
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, pb, training=False,
        rng=jax.random.PRNGKey(1),
    )
    fwd = jax.jit(lambda v, b, r: model.apply(v, b, training=False, rng=r))
    out, state_dict = fwd(variables, pb, jax.random.PRNGKey(1))
    return cfg, model, variables, pb, out, state_dict


def test_forward_output_shapes(setup):
    cfg, model, variables, pb, out, state_dict = setup
    b, s = 1, 3
    assert out["throttle_brake"].shape == (b, s, 1)
    assert out["steering"].shape == (b, s, 1)
    assert out["rgb_1"].shape == (b, s, 64, 128, 3)
    assert out["rgb_2"].shape == (b, s, 32, 64, 3)
    assert out["lidar_reconstruction_1"].shape == (b, s, 64, 128, 4)
    assert out["voxel_1"].shape == (b, s, 64, 64, 64, 2)
    assert out["voxel_4"].shape == (b, s, 16, 16, 16, 2)
    hs = cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM
    sd = cfg.MODEL.TRANSITION.STATE_DIM
    assert out["posterior"]["hidden_state"].shape == (b, s, hs)
    assert out["prior"]["sample"].shape == (b, s, sd)


def test_losses_finite(setup):
    cfg, model, variables, pb, out, state_dict = setup
    losses = compute_loss(cfg, pb, out)
    assert len(losses) > 8
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"loss {k} is not finite"
    total = float(reduce_loss(losses))
    assert np.isfinite(total) and total > 0


def test_forward_deterministic(setup):
    cfg, model, variables, pb, out, _ = setup
    fwd = jax.jit(lambda v, b, r: model.apply(v, b, training=False, rng=r))
    out2, _ = fwd(variables, pb, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out["rgb_1"]),
                                  np.asarray(out2["rgb_1"]))
    np.testing.assert_array_equal(np.asarray(out["posterior"]["sample"]),
                                  np.asarray(out2["posterior"]["sample"]))


def test_imagine_rollout(setup):
    cfg, model, variables, pb, out, state_dict = setup
    fh = 4
    imagine_batch = {
        "hidden_state": state_dict["posterior"]["hidden_state"][:, -1],
        "sample": state_dict["posterior"]["sample"][:, -1],
        "throttle_brake": jnp.zeros((1, fh, 1)),
        "steering": jnp.zeros((1, fh, 1)),
    }
    rollout = jax.jit(
        lambda v, b, r: model.apply(v, b, False, fh, r, method=model.imagine)
    )(variables, imagine_batch, jax.random.PRNGKey(3))
    assert rollout["state"].shape == (1, fh, cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM
                                      + cfg.MODEL.TRANSITION.STATE_DIM)
    assert rollout["rgb_1"].shape == (1, fh, 64, 128, 3)
    assert rollout["voxel_1"].shape == (1, fh, 64, 64, 64, 2)
    # autoregressive rollout must not be constant over time
    states = np.asarray(rollout["state"])
    assert np.abs(states[:, 1:] - states[:, :-1]).max() > 1e-6


def test_preprocess_pyramids(setup):
    cfg, model, variables, pb, out, _ = setup
    assert pb["rgb_label_1"].shape == (1, 3, 64, 128, 3)
    assert pb["rgb_label_4"].shape == (1, 3, 16, 32, 3)
    assert pb["range_view_label_2"].shape == (1, 3, 32, 64, 4)
    assert pb["voxel_label_2"].shape == (1, 3, 32, 32, 32)
    # image is imagenet-normalised
    assert float(jnp.abs(pb["image"]).max()) < 10.0
    # range view scaled by LIDAR_RE.SCALE
    assert float(pb["range_view_pcd_xyzd"].max()) <= 50.0 / cfg.LIDAR_RE.SCALE + 1e-5


def test_remat_matches_plain_forward(setup):
    """nn.remat on decoders+encoders must be semantics-preserving."""
    cfg, model, variables, pb, out, _ = setup
    rcfg = tiny_test_cfg()
    rcfg.MODEL.REMAT = True
    rcfg.MODEL.REMAT_ENCODER = True
    rmodel = MuvoWorldModel(as_static(rcfg))
    rout, _ = jax.jit(
        lambda v, b, r: rmodel.apply(v, b, training=False, rng=r)
    )(variables, pb, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(rout["rgb_1"]),
                               np.asarray(out["rgb_1"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rout["voxel_1"]),
                               np.asarray(out["voxel_1"]), atol=1e-5)


def test_remat_scope_voxel_matches_plain_forward(setup):
    """REMAT_SCOPE='voxel' (remat only the voxel decoder, rgb/lidar/bev
    store activations) is semantics-preserving too."""
    cfg, model, variables, pb, out, _ = setup
    rcfg = tiny_test_cfg()
    rcfg.MODEL.REMAT = True
    rcfg.MODEL.REMAT_SCOPE = "voxel"
    rmodel = MuvoWorldModel(as_static(rcfg))
    rout, _ = jax.jit(
        lambda v, b, r: rmodel.apply(v, b, training=False, rng=r)
    )(variables, pb, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(rout["rgb_1"]),
                               np.asarray(out["rgb_1"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rout["voxel_1"]),
                               np.asarray(out["voxel_1"]), atol=1e-5)


def test_remat_scope_typo_raises(setup):
    """An unknown REMAT_SCOPE must error at init, not silently degrade to
    voxel-only remat (a batch-4 flagship run relying on scope='all' to fit
    HBM would OOM with nothing pointing at the config value)."""
    cfg, model, variables, pb, out, _ = setup
    rcfg = tiny_test_cfg()
    rcfg.MODEL.REMAT = True
    rcfg.MODEL.REMAT_SCOPE = "decoder"
    rmodel = MuvoWorldModel(as_static(rcfg))
    with pytest.raises(ValueError, match="REMAT_SCOPE"):
        rmodel.apply(variables, pb, training=False,
                     rng=jax.random.PRNGKey(1))
