"""Range-view projection parity against the reference's OWN PointCloud
(muvo/utils/geometry_utils.py:166-244, importable with the open3d/carla
stubs). Covers the numpy path, the native C++ kernel path and the jitted
bitcast-z-buffer path, plus the inverse re-projection — the geometry core
that feeds every LiDAR branch.
"""

import numpy as np

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax.numpy as jnp  # noqa: E402

from muvo.utils.geometry_utils import PointCloud  # noqa: E402

from muvo_tpu.geometry.range_view import RangeProjector  # noqa: E402

rng = np.random.RandomState(71)


def _cloud(n):
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 6, n)
    sem = rng.randint(0, 23, n).astype(np.uint8)
    return pts, sem


def _tie_free(ref_depth, got_depth, atol=1e-4):
    """Compare depths; xyz/sem can differ only where two points share a
    pixel at (near-)equal depth, so assert on depth equality which is
    order-independent up to exact ties."""
    np.testing.assert_allclose(got_depth, ref_depth, rtol=1e-4, atol=atol)


def test_range_projection_matches_reference():
    pc = PointCloud(H=32, W=128, fov_down=-30, fov_up=10,
                    lidar_position=(1, 0, 2))
    ours = RangeProjector(h=32, w=128, fov_down=-30, fov_up=10,
                          lidar_position=(1, 0, 2))
    pts, sem = _cloud(4000)
    ref_d, ref_xyz, ref_s = pc.do_range_projection(pts.copy(), sem.copy())

    for name, fn in (("numpy", ours.project_numpy), ("auto", ours.project)):
        got_d, got_xyz, got_s = fn(pts.copy(), sem.copy())
        _tie_free(ref_d, np.asarray(got_d))
        # the same pixels must be empty
        np.testing.assert_array_equal(np.asarray(got_d) < 0, ref_d < 0,
                                      err_msg=name)
        # winner-point payloads agree wherever depths are unambiguous
        close = np.isclose(np.asarray(got_d), ref_d, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_xyz)[close],
                                   ref_xyz[close], rtol=1e-4, atol=1e-4,
                                   err_msg=name)
        np.testing.assert_array_equal(np.asarray(got_s)[close],
                                      ref_s[close], err_msg=name)


def test_range_projection_jax_matches_reference():
    pc = PointCloud(H=16, W=64, fov_down=-30, fov_up=10,
                    lidar_position=(1, 0, 2))
    ours = RangeProjector(h=16, w=64, fov_down=-30, fov_up=10,
                          lidar_position=(1, 0, 2))
    pts, sem = _cloud(1500)
    ref_d, ref_xyz, ref_s = pc.do_range_projection(pts.copy(), sem.copy())
    got_d, got_xyz, got_s = ours.project_jax(jnp.asarray(pts),
                                             jnp.asarray(sem))
    _tie_free(ref_d, np.asarray(got_d))
    close = np.isclose(np.asarray(got_d), ref_d, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_xyz)[close], ref_xyz[close],
                               rtol=1e-4, atol=1e-4)


def test_restore_matches_reference():
    pc = PointCloud(H=16, W=64)
    ours = RangeProjector(h=16, w=64)
    pts, sem = _cloud(1200)
    ref_d, _, _ = pc.do_range_projection(pts.copy(), sem.copy())
    # reference restore expects a (B, S, H, W) batch of depth maps
    ref_pcd = pc.restore_pcd_coor(ref_d[None, None])
    got = np.asarray(ours.restore(ref_d[None, None]))
    np.testing.assert_allclose(got, ref_pcd, rtol=1e-4, atol=1e-4)
