"""Device-side range-view projection path (POINTS.DEVICE_PROJECTION)."""

import jax
import jax.numpy as jnp
import numpy as np

from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.geometry.range_view import RangeProjector
from muvo_tpu.models.preprocess import PreProcess


def test_device_projection_matches_host():
    cfg = tiny_test_cfg()
    cfg.POINTS.DEVICE_PROJECTION = True
    cfg.LIDAR_SEG.ENABLED = True
    batch = synthetic_batch(cfg, 1, 2)
    assert "points_raw" in batch and "range_view_pcd_xyzd" not in batch

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(jb)
    assert pb["range_view_pcd_xyzd"].shape == (1, 2, 64, 128, 4)
    assert "range_view_label_2" in pb
    assert pb["range_view_pcd_seg"].shape == (1, 2, 64, 128, 1)

    # host projection of the same points for frame (0, 0)
    proj = RangeProjector(cfg.POINTS.CHANNELS, cfg.POINTS.HORIZON_RESOLUTION,
                          cfg.POINTS.FOV[0], cfg.POINTS.FOV[1],
                          cfg.POINTS.LIDAR_POSITION)
    rd, rxyz, _ = proj.project_numpy(batch["points_raw"][0, 0],
                                     np.zeros(batch["points_raw"].shape[2]))
    host = np.concatenate([rxyz, rd[..., None]], -1) / cfg.LIDAR_RE.SCALE
    device = np.asarray(pb["range_view_pcd_xyzd"][0, 0])
    # identical winners except at exact-depth ties
    mismatch = np.abs(device - host) > 1e-3
    assert mismatch.mean() < 0.01


def test_device_projection_full_model_step():
    cfg = tiny_test_cfg()
    cfg.POINTS.DEVICE_PROJECTION = True
    cfg.VOXEL_SEG.ENABLED = False  # keep CPU compile small

    from muvo_tpu.config import as_static
    from muvo_tpu.models.world_model import MuvoWorldModel

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 1, 2).items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)
    model = MuvoWorldModel(as_static(cfg))
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, pb, training=False,
        rng=jax.random.PRNGKey(1),
    )
    out, _ = jax.jit(lambda v, b, r: model.apply(v, b, training=False, rng=r))(
        variables, pb, jax.random.PRNGKey(2)
    )
    assert out["lidar_reconstruction_1"].shape == (1, 2, 64, 128, 4)
