"""Offline-preprocessing parity against the reference's OWN
data/data_preprocessing.py (pure numpy/cv2): depth->point-cloud
unprojection, camera/lidar frame conversion, and the voxel filter with
its RoadLines-priority labelling. (reference: data/data_preprocessing.py:
86-229)
"""

import sys

import numpy as np

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

sys.path.insert(0, "/root/reference/data")
import data_preprocessing as ref_dp  # noqa: E402

sys.path.remove("/root/reference/data")

from muvo_tpu.geometry import voxel as vx  # noqa: E402

rng = np.random.RandomState(91)


def test_depth2pcd_matches_reference():
    h, w = 24, 48
    depth = rng.uniform(1.0, 120.0, (h, w)).astype(np.float64)
    sem = rng.randint(0, 23, (h, w)).astype(np.uint8)
    ref_pcd, ref_sem = ref_dp.depth2pcd(depth.copy(), sem.copy(), fov=110)
    pcd, sem_out = vx.depth_to_pcd(depth.copy(), sem.copy(), fov=110)
    np.testing.assert_allclose(pcd, ref_pcd, rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(sem_out, ref_sem)


def test_coordinate_conversions_match_reference():
    pcd = rng.randn(100, 3) * 10
    cam_pos = (-1.5, 0.0, 2.0)
    np.testing.assert_allclose(
        vx.convert_coor_img(pcd.copy(), cam_pos),
        ref_dp.convert_coor_img(pcd.copy(), cam_pos), rtol=1e-7)
    lidar_pos = (1.0, 0.0, 2.0)
    np.testing.assert_allclose(
        vx.convert_coor_lidar(pcd.copy(), lidar_pos),
        ref_dp.convert_coor_lidar(pcd.copy(), lidar_pos), rtol=1e-7)


def test_voxel_filter_matches_reference():
    n = 4000
    pcd = rng.uniform(-18, 18, (n, 3))
    pcd[:, 2] = rng.uniform(-3, 5, n)
    # include the roadlines class so the priority branch is exercised
    road_idx = int(np.where(ref_dp.LABEL_CLASS == "roadlines")[0][0])
    sem = rng.randint(0, 23, n).astype(np.uint8)
    sem[rng.rand(n) < 0.05] = road_idx

    res, size, off = 0.5, (64, 64, 16), np.array([0.0, 0.0, 0.0])
    ref_vox, ref_sem = ref_dp.voxel_filter(
        pcd.copy(), sem.copy(), res, np.array(size), off.copy())
    vox, sem_out = vx.voxel_filter(
        pcd.copy(), sem.copy(), res, np.array(size), off.copy())

    # canonical order: sort both by flat voxel id
    def key(v):
        return v[:, 0].astype(np.int64) + v[:, 1].astype(np.int64) * size[0] \
            + v[:, 2].astype(np.int64) * size[0] * size[1]

    ro, go = np.argsort(key(ref_vox)), np.argsort(key(np.asarray(vox)))
    np.testing.assert_array_equal(np.asarray(vox)[go], ref_vox[ro])
    np.testing.assert_array_equal(np.asarray(sem_out)[go], ref_sem[ro])
