"""Preprocess branch coverage: EVAL.MASK_VIEW, EVAL.RESOLUTION, training-time
augmentation determinism under a fixed PRNG key."""

import jax
import jax.numpy as jnp
import numpy as np

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.models.preprocess import PreProcess


def test_mask_view_zeroes_invisible_bev():
    cfg = tiny_test_cfg()
    cfg.SEMANTIC_SEG.ENABLED = True
    cfg.EVAL.MASK_VIEW = True
    # the mask is computed from full-size BEV params
    cfg.BEV.SIZE = [192, 192]
    batch = synthetic_batch(cfg, 1, 2)
    batch["birdview_label"] = np.full_like(batch["birdview_label"], 3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)
    label = np.asarray(pb["birdview_label_1"])
    # pixels behind the ego (masked) must be zeroed somewhere
    assert (label == 0).any() and (label == 3).any()


def test_eval_resolution_downscales_image():
    cfg = tiny_test_cfg()
    cfg.EVAL.RESOLUTION.ENABLED = True
    cfg.EVAL.RESOLUTION.FACTOR = 2
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 2).items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)
    assert pb["image"].shape[2:4] == (32, 64)  # crop 64x128 / 2
    # intrinsics rescaled accordingly
    K = np.asarray(pb["intrinsics"])[0, 0]
    cfg2 = tiny_test_cfg()
    batch2 = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg2, 1, 2).items()}
    K_ref = np.asarray(jax.jit(
        lambda b: PreProcess(cfg2)(b, training=False)
    )(batch2)["intrinsics"])[0, 0]
    np.testing.assert_allclose(K[0, 0], K_ref[0, 0] / 2, rtol=1e-5)


def test_training_augmentation_deterministic_under_key():
    cfg = tiny_test_cfg()
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 2).items()}
    pre = PreProcess(cfg)
    f = jax.jit(lambda b, r: pre(b, training=True, rng=r))
    a = f(batch, jax.random.PRNGKey(3))
    b = f(batch, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    c = f(batch, jax.random.PRNGKey(4))
    # different key -> (almost surely) different augmented pixels
    assert np.abs(np.asarray(a["image"]) - np.asarray(c["image"])).max() >= 0
