"""Per-section weight-converter checks with fabricated reference-named
tensors: every targeted leaf must be overwritten with correctly-transposed
values."""

import numpy as np

from muvo_tpu.config import get_cfg
from muvo_tpu.training.weight_convert import (
    _merge_into,
    convert_reference_state_dict,
)

rng = np.random.RandomState(0)


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file("muvo_tpu/configs/muvo.yml")
    return cfg


def test_resnet_trunk_conversion():
    state = {
        "encoder.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "encoder.bn1.weight": rng.randn(64).astype(np.float32),
        "encoder.bn1.bias": rng.randn(64).astype(np.float32),
        "encoder.bn1.running_mean": rng.randn(64).astype(np.float32),
        "encoder.bn1.running_var": rng.rand(64).astype(np.float32),
        "encoder.layer2.0.conv1.weight": rng.randn(128, 64, 3, 3).astype(np.float32),
        "encoder.layer2.0.downsample.0.weight":
            rng.randn(128, 64, 1, 1).astype(np.float32),
        "encoder.layer2.0.downsample.1.weight": rng.randn(128).astype(np.float32),
        "encoder.layer2.0.downsample.1.bias": rng.randn(128).astype(np.float32),
        "encoder.layer2.0.downsample.1.running_mean":
            rng.randn(128).astype(np.float32),
        "encoder.layer2.0.downsample.1.running_var":
            rng.rand(128).astype(np.float32),
    }
    params, stats = convert_reference_state_dict(state, _cfg())
    # conv OIHW -> HWIO
    np.testing.assert_array_equal(
        params["encoder"]["conv1"]["kernel"],
        state["encoder.conv1.weight"].transpose(2, 3, 1, 0),
    )
    assert params["encoder"]["layer2_0"]["downsample_conv"]["kernel"].shape \
        == (1, 1, 64, 128)
    np.testing.assert_array_equal(
        stats["encoder"]["bn1"]["mean"], state["encoder.bn1.running_mean"]
    )


def test_conv_decoder_conversion():
    state = {
        "rgb_decoder.linear.0.weight": rng.randn(512, 1536).astype(np.float32),
        "rgb_decoder.linear.0.bias": rng.randn(512).astype(np.float32),
        "rgb_decoder.pre_transpose_conv.0.weight":
            rng.randn(512, 512, 5, 13).astype(np.float32),
        "rgb_decoder.pre_transpose_conv.0.bias":
            rng.randn(512).astype(np.float32),
        "rgb_decoder.trans_conv1.0.weight":
            rng.randn(512, 256, 6, 6).astype(np.float32),
        "rgb_decoder.trans_conv1.0.bias": rng.randn(256).astype(np.float32),
        "rgb_decoder.head_4.rgb_head.0.weight":
            rng.randn(3, 256, 1, 1).astype(np.float32),
        "rgb_decoder.head_4.rgb_head.0.bias": rng.randn(3).astype(np.float32),
    }
    params, _ = convert_reference_state_dict(state, _cfg())
    dec = params["rgb_decoder"]
    assert dec["linear"]["kernel"].shape == (1536, 512)
    # deconv torch (I, O, kh, kw) -> flipped (kh, kw, I, O)
    w = state["rgb_decoder.pre_transpose_conv.0.weight"]
    np.testing.assert_array_equal(
        dec["pre0"]["kernel"],
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1),
    )
    assert dec["trans_conv1"]["kernel"].shape == (6, 6, 512, 256)
    assert dec["head_4"]["head"]["kernel"].shape == (1, 1, 256, 3)


def test_voxel_and_bev_decoder_conversion():
    state = {
        "voxel_decoder.constant_tensor": rng.randn(128, 3, 3, 1).astype(np.float32),
        "voxel_decoder.first_norm.latent_affine.weight":
            rng.randn(256, 1536).astype(np.float32),
        "voxel_decoder.first_norm.latent_affine.bias":
            rng.randn(256).astype(np.float32),
        "voxel_decoder.middle_conv.0.conv1.conv_act.0.weight":
            rng.randn(64, 64, 3, 3, 3).astype(np.float32),
        "voxel_decoder.middle_conv.0.conv1.conv_act.0.bias":
            rng.randn(64).astype(np.float32),
        "voxel_decoder.head_1.segmentation_head.0.weight":
            rng.randn(2, 8, 1, 1, 1).astype(np.float32),
        "voxel_decoder.head_1.segmentation_head.0.bias":
            rng.randn(2).astype(np.float32),
        "bev_decoder.constant_tensor": rng.randn(512, 3, 3).astype(np.float32),
        "bev_decoder.head_4.segmentation_head.0.weight":
            rng.randn(8, 256, 1, 1).astype(np.float32),
        "bev_decoder.head_4.segmentation_head.0.bias":
            rng.randn(8).astype(np.float32),
    }
    params, _ = convert_reference_state_dict(state, _cfg())
    vox = params["voxel_decoder"]
    # constant (C, X, Y, Z) -> (X, Y, Z, C)
    assert vox["constant_tensor"].shape == (3, 3, 1, 128)
    assert vox["middle_0"]["conv1"]["conv"]["kernel"].shape == (3, 3, 3, 64, 64)
    assert vox["head_1"]["head"]["kernel"].shape == (1, 1, 1, 8, 2)
    assert params["bev_decoder"]["constant_tensor"].shape == (3, 3, 512)
    assert params["bev_decoder"]["head_4"]["seg"]["kernel"].shape == (1, 1, 256, 8)


def test_feature_conv_and_misc_conversion():
    state = {
        "image_feature_conv.0.conv1.weight":
            rng.randn(512, 384, 3, 3).astype(np.float32),
        "image_feature_conv.0.downsample.0.weight":
            rng.randn(512, 384, 1, 1).astype(np.float32),
        "image_feature_conv.0.downsample.1.weight":
            rng.randn(512).astype(np.float32),
        "image_feature_conv.0.downsample.1.bias":
            rng.randn(512).astype(np.float32),
        "image_feature_conv.0.downsample.1.running_mean":
            rng.randn(512).astype(np.float32),
        "image_feature_conv.0.downsample.1.running_var":
            rng.rand(512).astype(np.float32),
        "speed_enc.0.weight": rng.randn(16, 1).astype(np.float32),
        "speed_enc.0.bias": rng.randn(16).astype(np.float32),
        "features_combine.weight": rng.randn(512, 1056).astype(np.float32),
        "features_combine.bias": rng.randn(512).astype(np.float32),
        "policy.fc.0.weight": rng.randn(1536, 1536).astype(np.float32),
        "policy.fc.0.bias": rng.randn(1536).astype(np.float32),
        "policy.fc.6.weight": rng.randn(2, 768).astype(np.float32),
        "policy.fc.6.bias": rng.randn(2).astype(np.float32),
        "type_embedding": rng.randn(1, 1, 384, 2).astype(np.float32),
    }
    params, stats = convert_reference_state_dict(state, _cfg())
    assert params["image_feature_conv"]["block1"]["conv1"]["kernel"].shape \
        == (3, 3, 384, 512)
    assert params["image_feature_conv"]["block1"]["ds_conv"]["kernel"].shape \
        == (1, 1, 384, 512)
    assert params["speed_enc"]["Dense_0"]["kernel"].shape == (1, 16)
    assert params["features_combine"]["kernel"].shape == (1056, 512)
    assert params["policy"]["Dense_0"]["kernel"].shape == (1536, 1536)
    assert params["policy"]["Dense_3"]["kernel"].shape == (768, 2)
    assert params["type_embedding"].shape == (1, 1, 384, 2)


def test_merge_into_shape_guard():
    template = {"a": np.zeros((2, 3))}
    converted = {"a": np.zeros((3, 2))}
    try:
        _merge_into(template, converted)
        assert False, "shape mismatch must raise"
    except AssertionError as e:
        assert "shape" in str(e)
