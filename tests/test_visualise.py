"""Visualisation panel generation on fake model outputs (pure numpy)."""

import numpy as np

from muvo_tpu.data.synthetic import tiny_test_cfg
from muvo_tpu.training.visualise import visualise_step
from muvo_tpu.visualisation import (
    convert_bev_to_image,
    draw_action_gauge,
    prepare_final_display_image,
    voxel_to_bev_image,
)


def test_visualise_step_panels():
    cfg = tiny_test_cfg()
    rng = np.random.RandomState(0)
    b, s, fh = 1, 2, 1
    h, w = 64, 128
    batch = {
        "rgb_label_1": rng.randn(b, s + fh, h, w, 3).astype(np.float32),
        "range_view_label_1": rng.rand(b, s + fh, 64, 128, 4).astype(np.float32),
        "voxel_label_1": rng.randint(0, 2, (b, s + fh, 64, 64, 64)),
        "throttle_brake": rng.uniform(-1, 1, (b, s + fh, 1)).astype(np.float32),
        "steering": rng.uniform(-1, 1, (b, s + fh, 1)).astype(np.float32),
        "route_map": rng.rand(b, s + fh, 32, 32, 3).astype(np.float32),
    }
    output = {
        "rgb_1": rng.rand(b, s, h, w, 3).astype(np.float32),
        "lidar_reconstruction_1": rng.rand(b, s, 64, 128, 4).astype(np.float32),
        "voxel_1": rng.randn(b, s, 64, 64, 64, 2).astype(np.float32),
    }
    imagine = {
        "rgb_1": rng.rand(b, fh, h, w, 3).astype(np.float32),
        "lidar_reconstruction_1": rng.rand(b, fh, 64, 128, 4).astype(np.float32),
        "voxel_1": rng.randn(b, fh, 64, 64, 64, 2).astype(np.float32),
    }
    panels = visualise_step(cfg, batch, output, imagine)
    # full reference panel set (muvo/trainer.py:569-966) for this config
    assert set(panels) == {
        "rgb", "flow", "range_view", "video/lidar", "pcd_xy", "trajectory",
        "voxel_topdown", "voxel_3d", "voxel_3d_imagine", "input_route_map",
    }
    for name, img in panels.items():
        assert img.dtype == np.uint8 and img.shape[-1] == 3
        assert img.ndim == (4 if name.startswith("video/") else 3)


def test_basic_helpers():
    bev = convert_bev_to_image(np.random.randint(0, 8, (16, 16)))
    assert bev.shape == (16, 16, 3)
    vox = voxel_to_bev_image(np.random.randint(0, 2, (8, 8, 4)))
    assert vox.shape == (8, 8, 3)
    gauge = draw_action_gauge(64, 0.5)
    assert gauge.shape == (16, 64, 3)
    composed = prepare_final_display_image(
        np.zeros((32, 32, 3), np.uint8), np.zeros((32, 32, 3), np.uint8),
        actions={"steer": -0.3},
    )
    assert composed.ndim == 3
