"""Config-branch coverage: frustum-pooled BEV fusion, PointPillars LiDAR,
no-transition baseline, measurements, mobilevit backbone — each variant must
init and run a forward pass with correct shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muvo_tpu.config import as_static
from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.models.preprocess import PreProcess
from muvo_tpu.models.world_model import MuvoWorldModel


def _run(cfg, b=1, s=2):
    batch = synthetic_batch(cfg, b, s)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda x: pre(x, training=False))(batch)
    model = MuvoWorldModel(as_static(cfg))
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, pb, training=False,
        rng=jax.random.PRNGKey(1),
    )
    out, state = jax.jit(
        lambda v, x, r: model.apply(v, x, training=False, rng=r)
    )(variables, pb, jax.random.PRNGKey(2))
    return out, state


def _small(cfg):
    """Shrink decoders for CPU."""
    cfg.VOXEL_SEG.ENABLED = False
    cfg.LIDAR_RE.ENABLED = False
    cfg.LIDAR_SEG.ENABLED = False
    cfg.EVAL.RGB_SUPERVISION = False
    cfg.SEMANTIC_SEG.ENABLED = True
    return cfg


def test_transformer_bev_frustum_path():
    cfg = tiny_test_cfg()
    _small(cfg)
    cfg.MODEL.TRANSFORMER.BEV = True
    cfg.MODEL.TRANSFORMER.LARGE = False
    out, _ = _run(cfg)
    assert out["bev_segmentation_1"].shape == (1, 2, 64, 64, 8)
    assert np.isfinite(np.asarray(out["bev_segmentation_1"])).all()


def test_no_transformer_mile_path():
    """one_frame.yml style: frustum BEV + backbone_bev, no transition."""
    cfg = tiny_test_cfg()
    _small(cfg)
    cfg.MODEL.TRANSFORMER.ENABLED = False
    cfg.MODEL.TRANSITION.ENABLED = False
    out, state_dict = _run(cfg)
    assert state_dict == {}
    assert out["throttle_brake"].shape == (1, 2, 1)
    assert "bev_segmentation_1" in out


def test_point_pillars_path():
    cfg = tiny_test_cfg()
    _small(cfg)
    cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED = True
    cfg.POINTS.N_PER_SECOND = 20000  # 2000 points/frame
    out, _ = _run(cfg)
    assert "bev_segmentation_1" in out


def test_measurements_path():
    cfg = tiny_test_cfg()
    _small(cfg)
    cfg.MODEL.MEASUREMENTS.ENABLED = True
    out, _ = _run(cfg)
    assert "throttle_brake" in out


@pytest.mark.slow
def test_mobilevit_backbone():
    cfg = tiny_test_cfg()
    _small(cfg)
    cfg.MODEL.ENCODER.NAME = "mobilevitv2_100"
    cfg.MODEL.LIDAR.ENCODER = "mobilevitv2_100"
    out, _ = _run(cfg)
    assert "throttle_brake" in out
