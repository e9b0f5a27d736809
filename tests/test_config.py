import os

import pytest

from muvo_tpu.config import get_cfg, get_parser, CfgNode, _find_extra_keys

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "muvo_tpu", "configs")


def test_defaults():
    cfg = get_cfg()
    assert cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM == 1024
    assert cfg.MODEL.TRANSITION.STATE_DIM == 512
    assert cfg.BEV.FRUSTUM_POOL.D_BOUND == [1.0, 38.0, 1.0]
    assert cfg.IMAGE.CROP == [64, 138, 896, 458]
    assert not cfg.is_frozen()


def test_yaml_base_inheritance_and_freeze():
    parser = get_parser()
    args = parser.parse_args(
        ["--config-file", os.path.join(CONFIG_DIR, "test_base_1d.yml")]
    )
    cfg = get_cfg(args)
    # from muvo.yml base
    assert cfg.MODEL.TRANSFORMER.CHANNELS == 384
    assert cfg.VOXEL_SEG.DIMENSION == 64
    assert cfg.VOXEL_SEG.N_CLASSES == 2
    # overridden by test_base_1d.yml
    assert cfg.RECEPTIVE_FIELD == 6
    assert cfg.FUTURE_HORIZON == 10
    assert cfg.is_frozen()
    with pytest.raises(AttributeError):
        cfg.STEPS = 1


def test_cli_overrides():
    parser = get_parser()
    args = parser.parse_args(
        ["--config-file", os.path.join(CONFIG_DIR, "muvo.yml"),
         "BATCHSIZE", "4", "OPTIMIZER.LR", "3e-4", "MODEL.LIDAR.ENABLED", "False"]
    )
    cfg = get_cfg(args)
    assert cfg.BATCHSIZE == 4
    assert cfg.OPTIMIZER.LR == 3e-4
    assert cfg.MODEL.LIDAR.ENABLED is False


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_cfg_dict_roundtrip():
    cfg = get_cfg()
    d = cfg.convert_to_dict()
    cfg2 = get_cfg(cfg_dict=d)
    assert cfg2.convert_to_dict() == d


def test_extra_keys_allowed_through_dict_path():
    d = {"BRAND_NEW_KEY": 1, "MODEL": {"NEW_SUB": {"X": 2}}}
    cfg = get_cfg(cfg_dict=d)
    assert cfg.BRAND_NEW_KEY == 1
    assert cfg.MODEL.NEW_SUB.X == 2


def test_find_extra_keys():
    base = {"A": 1, "B": {"C": 2}}
    other = {"A": 5, "B": {"C": 3, "D": 4}, "E": 6}
    assert _find_extra_keys(base, other) == ["B.D", "E"]


def test_reference_yaml_configs_all_load():
    parser = get_parser()
    for name in os.listdir(CONFIG_DIR):
        if name.endswith(".yml"):
            args = parser.parse_args(["--config-file", os.path.join(CONFIG_DIR, name)])
            cfg = get_cfg(args)
            assert isinstance(cfg, CfgNode)
