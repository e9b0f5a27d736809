"""Evaluator protocol: encode-once / imagine-many split.

The reference's test protocol encodes each batch once and only re-runs the
prior rollout per imagination sample (muvo/trainer.py:234-247). Asserts:

* reconstruction metrics are invariant to PREDICTION.N_SAMPLES (the recon
  forward must not depend on the imagination loop),
* imagination metrics are produced and finite,
* the per-sample imagination outputs actually differ (independent samples).
"""

import jax
import numpy as np

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.parallel.mesh import make_mesh
from muvo_tpu.training.evaluator import Evaluator
from muvo_tpu.training.trainer import WorldModelTrainer


def _small(cfg):
    cfg.VOXEL_SEG.ENABLED = False
    cfg.LIDAR_RE.ENABLED = True
    cfg.EVAL.RGB_SUPERVISION = False
    cfg.SEMANTIC_SEG.ENABLED = True
    cfg.FUTURE_HORIZON = 2
    return cfg


def _loader(cfg, n=2):
    seq = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    return [synthetic_batch(cfg, cfg.BATCHSIZE, seq, seed=100 + i)
            for i in range(n)]


def test_recon_metrics_invariant_to_n_samples():
    cfg = _small(tiny_test_cfg())
    trainer = WorldModelTrainer(cfg, mesh=make_mesh(n_data=1))
    state = trainer.init_state(_loader(cfg, 1)[0], fast=True)

    recon1, imagine1 = Evaluator(trainer, n_samples=1).run(
        state, iter(_loader(cfg)))
    recon3, imagine3 = Evaluator(trainer, n_samples=3).run(
        state, iter(_loader(cfg)))

    assert recon1.keys() == recon3.keys() and recon1
    for k in recon1:
        np.testing.assert_allclose(recon1[k], recon3[k], rtol=1e-6,
                                   err_msg=f"recon metric {k} depends on "
                                           f"the imagination sample count")
    assert imagine3, "imagination metrics missing"
    for k, v in imagine3.items():
        assert np.isfinite(v), (k, v)


def test_imagination_samples_are_independent():
    cfg = _small(tiny_test_cfg())
    trainer = WorldModelTrainer(cfg, mesh=make_mesh(n_data=1))
    batch = _loader(cfg, 1)[0]
    state = trainer.init_state(batch, fast=True)
    ev = Evaluator(trainer, n_samples=2)

    import jax.numpy as jnp
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    obs = ev.observe_step(state, jb, jax.random.PRNGKey(0))
    out_a = ev.imagine_step(state, obs["pb"], obs["hidden_state"],
                            obs["sample"], jax.random.PRNGKey(1))
    out_b = ev.imagine_step(state, obs["pb"], obs["hidden_state"],
                            obs["sample"], jax.random.PRNGKey(2))
    a = np.asarray(out_a["output_imagine"]["bev_segmentation_1"])
    b = np.asarray(out_b["output_imagine"]["bev_segmentation_1"])
    assert a.shape == b.shape
    assert not np.allclose(a, b), "prior rollout ignores its sample rng"
