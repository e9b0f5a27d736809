"""Checkpoint round-trip: orbax save/restore of the full TrainState."""

import jax
import jax.numpy as jnp
import numpy as np

from muvo_tpu.training.checkpoint import CheckpointManager
from muvo_tpu.training.trainer import TrainState


def _fake_state():
    params = {"dense": {"kernel": jnp.arange(12.0).reshape(3, 4),
                        "bias": jnp.ones(4)}}
    stats = {"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}
    opt_state = {"mu": jnp.zeros((3, 4))}
    return TrainState(jnp.asarray(7, jnp.int32), params, stats, opt_state)


def test_save_restore_roundtrip(tmp_path):
    state = _fake_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, jax.device_get(state), cfg_dict={"TAG": "test", "STEPS": 5})
    mgr.wait()
    assert mgr.latest_step() == 7

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr.restore(template=template)
    assert restored is not None
    rs = TrainState(**restored["state"])
    assert int(rs.step) == 7
    np.testing.assert_array_equal(
        np.asarray(rs.params["dense"]["kernel"]),
        np.arange(12.0).reshape(3, 4),
    )
    # config + git metadata sidecar
    assert restored["config"]["TAG"] == "test"
    assert "git_hash" in restored["metadata"]


def test_restore_empty_dir(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore() is None
