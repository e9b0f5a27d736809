"""Camera/BEV geometry parity against the reference's OWN geometry_utils:
intrinsics/extrinsics construction, BEV intrinsics + inverse, the
out-of-view mask and the three-plane LiDAR histograms.
(reference: muvo/utils/geometry_utils.py:8-163)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

from muvo.utils import geometry_utils as ref_geo  # noqa: E402

from muvo_tpu.config import get_cfg  # noqa: E402
from muvo_tpu.geometry import camera as cam  # noqa: E402
from muvo_tpu.geometry.voxel import (  # noqa: E402
    lidar_to_histogram_features,
)

rng = np.random.RandomState(81)


def test_camera_geometry_matches_reference():
    args = dict(image_fov=100.0, height=320, width=832,
                forward=-1.5, right=0.0, up=2.0,
                pitch=0.0, yaw=0.0, roll=0.0)
    K_ref, E_ref = ref_geo.calculate_geometry(**args)
    K, E = cam.calculate_geometry(**args)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-6)

    # the reference asserts pitch == yaw == roll == 0 (geometry_utils.py:80)
    E2_ref = ref_geo.get_extrinsics(1.0, 0.5, 2.0, 0.0, 0.0, 0.0)
    E2 = cam.get_extrinsics(1.0, 0.5, 2.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(E2), np.asarray(E2_ref),
                               rtol=1e-6, atol=1e-8)


def test_bev_intrinsics_match_reference():
    K_ref = ref_geo.bev_params_to_intrinsics((192, 192), 0.2, -64.0)
    K = cam.bev_params_to_intrinsics((192, 192), 0.2, -64.0)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), rtol=1e-6)

    Ks = rng.randn(4, 3, 3).astype(np.float32)
    Ks[:, 0, 1] = Ks[:, 1, 0] = Ks[:, 2, 0] = Ks[:, 2, 1] = 0
    Ks[:, 2, 2] = 1
    Ks[:, 0, 0] = np.abs(Ks[:, 0, 0]) + 1
    Ks[:, 1, 1] = np.abs(Ks[:, 1, 1]) + 1
    inv_ref = ref_geo.intrinsics_inverse(torch.from_numpy(Ks)).numpy()
    inv = np.asarray(cam.intrinsics_inverse(Ks))
    np.testing.assert_allclose(inv, inv_ref, rtol=1e-5, atol=1e-6)


def test_out_of_view_mask_matches_reference():
    cfg = get_cfg()  # flagship defaults carry all needed keys
    mask_ref = ref_geo.get_out_of_view_mask(cfg)
    mask = cam.get_out_of_view_mask(cfg)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))


def test_lidar_histograms_match_reference():
    cfg = get_cfg()
    pts = rng.uniform(-30, 30, (5000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 8, 5000)
    ref_xy, ref_xz, ref_yz = ref_geo.lidar_to_histogram_features(
        pts.copy(), cfg)
    xy, xz, yz = lidar_to_histogram_features(pts.copy(), cfg)
    np.testing.assert_allclose(xy, ref_xy, atol=1e-6)
    np.testing.assert_allclose(xz, ref_xz, atol=1e-6)
    np.testing.assert_allclose(yz, ref_yz, atol=1e-6)
