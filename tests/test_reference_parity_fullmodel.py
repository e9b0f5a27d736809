"""FULL-MODEL parity: the reference's complete Mile (muvo/models/mile.py)
vs our MuvoWorldModel, end to end, with converted weights.

The reference model is instantiated with faithful timm stubs
(tests/reference_stubs.py: resnet18 + mobilevitv2_100) at the flagship
muvo.yml sizes, its entire state_dict is converted by
training/weight_convert.py, and both models run the deterministic
deployment path (use_sample=False) on the same preprocessed synthetic
batch. Asserted equal: the 512-d fusion embedding, the RSSM prior/posterior
moments over the sequence, the policy outputs and every decoder head at the
final step. The 'mobilevit' variant covers test_mobilevit_2d.yml
(TRANSFORMER.CHANNELS=384, mobilevitv2_100 image + range-view encoders).

Heavy (full-size CPU compile, ~15 min/variant): gated behind
MUVO_FULL_PARITY=1. An always-on tiny-shape version of the same assertion
lives in tests/test_reference_parity_capstone.py.
Run: MUVO_FULL_PARITY=1 python -m pytest tests/test_reference_parity_fullmodel.py -q
Last full run: see PARITY.md (Direct reference parity notes).
"""

import os

import pytest

from fullmodel_parity_common import EncName, run_fullmodel_parity

pytestmark = pytest.mark.skipif(
    os.environ.get("MUVO_FULL_PARITY") != "1",
    reason="full-size model compile; set MUVO_FULL_PARITY=1 to run",
)


@pytest.mark.parametrize("variant", ["flagship", "bev_frustum",
                                     "point_pillars", "mile_no_transformer",
                                     "mobilevit"])
def test_full_model_matches_reference(variant):
    from muvo_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file("muvo_tpu/configs/muvo.yml")
    cfg.PRECISION = "32"
    cfg.RECEPTIVE_FIELD = 2
    cfg.FUTURE_HORIZON = 0
    cfg.POINTS.DEVICE_PROJECTION = False
    ref_cfg = None
    if variant == "bev_frustum":
        # the frustum-pooled BEV token path (mile.py:36-59, 505-523)
        cfg.MODEL.TRANSFORMER.BEV = True
    elif variant == "point_pillars":
        # PointPillars LiDAR tokens (mile.py:62-78, 529-533) — exercises
        # the swapped-axis decoration + flipped-x canvas quirks end to end
        cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED = True
    elif variant == "mile_no_transformer":
        # the MILE-original path: frustum lifting + backbone_bev fusion
        # (mile.py:163-300, 616-682)
        cfg.MODEL.TRANSFORMER.ENABLED = False
    elif variant == "mobilevit":
        # test_mobilevit_2d.yml: mobilevitv2_100 image + range-view
        # encoders, 384-channel fusion transformer
        cfg.MODEL.TRANSFORMER.CHANNELS = 384
        cfg.MODEL.ENCODER.NAME = "mobilevitv2_100"
        cfg.MODEL.LIDAR.ENCODER = "mobilevitv2_100"
        ref_cfg = cfg.clone()
        ref_cfg.MODEL.ENCODER.NAME = EncName("mobilevitv2_100")

    run_fullmodel_parity(cfg, ref_cfg=ref_cfg)
