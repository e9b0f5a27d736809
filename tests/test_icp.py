"""ICP registration + flow/trajectory visualisation tests."""

import numpy as np

from muvo_tpu.geometry.icp import compute_pcd_transformation, icp_point_to_point
from muvo_tpu.visualisation import optical_flow_image, trajectory_plot

rng = np.random.RandomState(2)


def test_icp_recovers_known_transform():
    src = rng.uniform(-5, 5, (200, 3))
    angle = np.deg2rad(7.0)
    R = np.array([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1],
    ])
    t = np.array([0.3, -0.2, 0.1])
    dst = src @ R.T + t
    T = icp_point_to_point(src, dst, threshold=1.0)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


def test_icp_trajectory_accumulation():
    Rt = {"Rot": np.eye(3), "pos": np.zeros((3, 1))}
    src = rng.uniform(-5, 5, (150, 3))
    dst = src + np.array([1.0, 0.0, 0.0])
    _, Rt = compute_pcd_transformation(dst, src, Rt, threshold=1.0)
    np.testing.assert_allclose(Rt["pos"][:, 0], [1.0, 0.0, 0.0], atol=1e-2)


def test_icp_empty_inputs():
    T, Rt = compute_pcd_transformation(
        np.zeros((0, 3)), np.zeros((5, 3)),
        {"Rot": np.eye(3), "pos": np.zeros((3, 1))},
    )
    np.testing.assert_array_equal(T, np.eye(4))


def test_optical_flow_and_trajectory_images():
    img1 = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    img2 = np.roll(img1, 2, axis=1)
    flow = optical_flow_image(img1, img2)
    assert flow.shape == (32, 32, 3) and flow.dtype == np.uint8

    traj = trajectory_plot(np.cumsum(rng.randn(20, 2), axis=0))
    assert traj.shape == (256, 256, 3)
