"""Multi-device SPMD semantics on the 8-virtual-CPU-device mesh.

The reference trains single-GPU through Lightning (reference train.py:93-112)
and gets DDP equivalence for free; here the SPMD train step over the
('data', 'model') mesh IS the distributed story, so these tests pin it down:

  * dp=8 runs a finite step and actually updates the params
  * dp=4 x tp=2 computes the same loss as dp=8 on the same batch
  * an 8-device step matches a 1-device step with identical rng (the
    DDP-equivalence property)

Everything runs in fp32 (PRECISION '32') so cross-mesh comparisons are tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.parallel.mesh import make_mesh, shard_batch
from muvo_tpu.training.trainer import WorldModelTrainer


def _spmd_cfg():
    # Exercises every sharded component (transformer fusion with constrain()
    # TP hints, RSSM, conv + voxel decoders with the SP hint) at the smallest
    # shapes that still shard over 'model'=2.
    cfg = tiny_test_cfg()
    cfg.PRECISION = "32"
    cfg.MODEL.TRANSFORMER.N_LAYERS = 1
    cfg.MODEL.TRANSFORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.DECODER_BASE_CHANNELS = 32
    cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 1
    return cfg


def _one_step(cfg, n_data, n_model, batch_np):
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])
    trainer = WorldModelTrainer(cfg, mesh=mesh)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = trainer.init_state(batch, seed=42)
    step = trainer.make_train_step(donate=False)
    sharded = shard_batch(batch, mesh)
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    return state, new_state, jax.device_get(metrics)


@pytest.fixture(scope="module")
def global_batch():
    cfg = _spmd_cfg()
    cfg.BATCHSIZE = 8
    return cfg, synthetic_batch(cfg, batch_size=8)


def test_dp8_step_finite_and_updates(global_batch):
    cfg, batch = global_batch
    state, new_state, metrics = _one_step(cfg, 8, 1, batch)
    assert np.isfinite(metrics["loss"])
    # params actually moved
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert int(jax.device_get(new_state.step)) == 1


def _worst_leaf_diff(params_a, params_b) -> float:
    # device_get first: the two trees live on different meshes and jnp ops
    # across committed devices are (rightly) rejected
    a = jax.tree_util.tree_leaves(jax.device_get(params_a))
    b = jax.tree_util.tree_leaves(jax.device_get(params_b))
    return max(float(np.max(np.abs(x - y))) for x, y in zip(a, b))


def test_dp4_tp2_matches_dp8(global_batch):
    cfg, batch = global_batch
    _, s_dp, m_dp = _one_step(cfg, 8, 1, batch)
    _, s_tp, m_tp = _one_step(cfg, 4, 2, batch)
    np.testing.assert_allclose(m_tp["loss"], m_dp["loss"], rtol=2e-4)
    # same update from the same data regardless of mesh layout
    worst = _worst_leaf_diff(s_dp.params, s_tp.params)
    assert worst < 5e-4, f"dp8 vs dp4x2 param drift {worst}"


def test_dp8_matches_single_device(global_batch):
    cfg, batch = global_batch
    _, s_multi, m_multi = _one_step(cfg, 8, 1, batch)
    _, s_single, m_single = _one_step(cfg, 1, 1, batch)
    np.testing.assert_allclose(m_multi["loss"], m_single["loss"], rtol=2e-4)
    worst = _worst_leaf_diff(s_multi.params, s_single.params)
    assert worst < 5e-4, f"dp8 vs single-device param drift {worst}"


def test_gradient_accumulation_applies_on_kth_microstep(global_batch):
    """OPTIMIZER.ACCUMULATE_GRAD_BATCHES=2 (optax.MultiSteps): the first
    micro-step must leave the params untouched (gradients only accumulate),
    the second must apply the averaged update. Pins the MultiSteps wiring
    (reference: Lightning accumulate_grad_batches, trainer config)."""
    cfg, batch = global_batch
    acc_cfg = _spmd_cfg()
    acc_cfg.BATCHSIZE = 8
    acc_cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES = 2
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices())
    trainer = WorldModelTrainer(acc_cfg, mesh=mesh)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init_state(jbatch, seed=42)
    step = trainer.make_train_step(donate=False)
    sharded = shard_batch(jbatch, mesh)

    mid, m1 = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(jax.device_get(m1["loss"]))
    assert _worst_leaf_diff(state.params, mid.params) == 0.0, \
        "params must not move mid-accumulation"

    done, m2 = step(mid, sharded, jax.random.PRNGKey(1))
    assert _worst_leaf_diff(mid.params, done.params) > 0.0, \
        "the k-th micro-step must apply the accumulated update"


def test_constrain_rejects_unknown_axis():
    from muvo_tpu.parallel.sharding import constrain

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices())

    def f(x):
        return constrain(x, ("data", "modell"))

    with jax.sharding.set_mesh(mesh):
        with pytest.raises(ValueError, match="modell"):
            jax.jit(f)(jnp.ones((4, 4)))


def test_constrain_noop_without_mesh():
    from muvo_tpu.parallel.sharding import constrain

    out = jax.jit(lambda x: constrain(x, ("data", "model")))(jnp.ones((4, 4)))
    np.testing.assert_allclose(np.asarray(out), 1.0)
