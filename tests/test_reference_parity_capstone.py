"""Always-on reduced-size capstone: whole-graph converted-state_dict parity.

The same assertion as tests/test_reference_parity_fullmodel.py — the
reference's COMPLETE Mile vs our MuvoWorldModel with the entire converted
state_dict along the deterministic deployment path — kept fast enough for
the default suite by shrinking every cfg-derived channel dimension
(embedding 64, transformer 64, RSSM 96/48).

The reference hard-codes its decoder constant sizes (mile.py:308-397:
bev (3,3), rgb (5,13), lidar (1,16), voxel (3,3,1)) so decoder SPATIAL
sizes cannot shrink; the cfg below picks input sizes whose cfg-derived
constants (world_model.py) equal those, and disables the voxel decoder —
the single most expensive head, whole-graph-covered by the gated full-size
test and per-module by test_reference_parity_{decoders,triplane}.py.

Covers the flagship resnet18 graph and the test_mobilevit_2d.yml-style
mobilevitv2_100 graph (the reference's own mile.py:23-27 would NameError on
a non-resnet image encoder; see fullmodel_parity_common.EncName).
"""

import pytest

from fullmodel_parity_common import EncName, run_fullmodel_parity


def _capstone_cfg():
    from muvo_tpu.data.synthetic import tiny_test_cfg

    cfg = tiny_test_cfg()
    cfg.PRECISION = "32"
    cfg.FUTURE_HORIZON = 0
    cfg.POINTS.DEVICE_PROJECTION = False
    # input sizes whose derived decoder constants equal the reference's
    # hard-coded ones: rgb (5,13) <- 320x832 crop, lidar (1,16) <- 64x1024
    # range view, bev (3,3) <- 192x192
    cfg.IMAGE.SIZE = (336, 840)
    cfg.IMAGE.CROP = [4, 8, 836, 328]  # -> 320 x 832
    cfg.POINTS.CHANNELS = 64
    cfg.POINTS.HORIZON_RESOLUTION = 1024
    cfg.BEV.SIZE = [192, 192]
    cfg.SEMANTIC_SEG.ENABLED = True
    cfg.VOXEL_SEG.ENABLED = False
    cfg.LIDAR_RE.ENABLED = True
    cfg.EVAL.RGB_SUPERVISION = True
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["flagship", "mobilevit"])
def test_tiny_full_graph_matches_reference(variant):
    cfg = _capstone_cfg()
    ref_cfg = None
    if variant == "mobilevit":
        cfg.MODEL.ENCODER.NAME = "mobilevitv2_100"
        cfg.MODEL.LIDAR.ENCODER = "mobilevitv2_100"
        ref_cfg = cfg.clone()
        ref_cfg.MODEL.ENCODER.NAME = EncName("mobilevitv2_100")

    run_fullmodel_parity(cfg, ref_cfg=ref_cfg)
