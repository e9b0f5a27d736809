"""Route obs manager: pure-geometry parity with reference
carla_gym/core/obs_manager/actor_state/route.py (no CARLA needed)."""

import numpy as np

from muvo_tpu.sim.obs_managers.actor_state.route import ObsManager


class _Loc:
    def __init__(self, x, y, z=0.0):
        self.x, self.y, self.z = x, y, z


class _Rot:
    def __init__(self, yaw):
        self.yaw = yaw


class _Transform:
    def __init__(self, x, y, yaw):
        self.location = _Loc(x, y)
        self.rotation = _Rot(yaw)


class _Vehicle:
    def __init__(self, x, y, yaw):
        self._tf = _Transform(x, y, yaw)

    def get_transform(self):
        return self._tf


class _Parent:
    def __init__(self, x, y, yaw, route_xy, idx=0, length=100.0,
                 completed=0.0):
        self.vehicle = _Vehicle(x, y, yaw)
        self._route = [(np.array([wx, wy, 0.0]), None) for wx, wy in route_xy]
        self._route_idx = idx
        self.route_length = length
        self.route_completed = completed


def _make(parent):
    om = ObsManager({})
    om.attach_ego_vehicle(parent)
    return om


def test_on_route_straight():
    # ego exactly on a straight +x route, aligned: everything ~0 except
    # route_locs' forward components
    route = [(float(i), 0.0) for i in range(10)]
    om = _make(_Parent(0.0, 0.0, 0.0, route))
    obs = om.get_observation()
    assert obs["lateral_dist"].shape == (1,)
    assert obs["route_locs"].shape == (10,)
    np.testing.assert_allclose(obs["lateral_dist"], [0.0], atol=1e-6)
    np.testing.assert_allclose(obs["angle_diff"], [0.0], atol=1e-6)
    # waypoints i=0..4 at (i, 0) in ego frame
    np.testing.assert_allclose(
        obs["route_locs"].reshape(5, 2),
        [[i, 0.0] for i in range(5)], atol=1e-6)
    np.testing.assert_allclose(obs["dist_remaining"], [0.1], atol=1e-6)


def test_lateral_offset_and_clip():
    route = [(float(i), 0.0) for i in range(10)]
    # 1.2 m to the left of the route
    om = _make(_Parent(0.0, 1.2, 0.0, route))
    obs = om.get_observation()
    np.testing.assert_allclose(obs["lateral_dist"], [1.2], atol=1e-6)
    # clipped at 2.0 (reference route.py:42)
    om = _make(_Parent(0.0, 7.0, 0.0, route))
    np.testing.assert_allclose(
        om.get_observation()["lateral_dist"], [2.0], atol=1e-6)


def test_angle_diff_wraps():
    route = [(float(i), 0.0) for i in range(10)]
    om = _make(_Parent(0.0, 0.0, 350.0, route))  # wraps to -10 deg
    obs = om.get_observation()
    np.testing.assert_allclose(
        obs["angle_diff"], [np.deg2rad(10.0)], atol=1e-6)


def test_route_locs_clamp_at_end():
    # only two waypoints left: steps 2..4 clamp to the last one
    route = [(0.0, 0.0), (1.0, 0.0)]
    om = _make(_Parent(0.0, 0.0, 0.0, route))
    locs = om.get_observation()["route_locs"].reshape(5, 2)
    np.testing.assert_allclose(locs[1:], [[1.0, 0.0]] * 4, atol=1e-6)


def test_route_idx_consumes_plan():
    # _route_idx=3: plan starts at waypoint 3
    route = [(float(i), 0.0) for i in range(10)]
    om = _make(_Parent(3.0, 0.0, 0.0, route, idx=3))
    locs = om.get_observation()["route_locs"].reshape(5, 2)
    np.testing.assert_allclose(locs[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(locs[4], [4.0, 0.0], atol=1e-6)


def test_ego_frame_rotation():
    # route heading +y, ego facing +y: forward waypoint is +x in ego frame
    route = [(0.0, float(i)) for i in range(10)]
    om = _make(_Parent(0.0, 0.0, 90.0, route))
    obs = om.get_observation()
    np.testing.assert_allclose(obs["angle_diff"], [0.0], atol=1e-6)
    np.testing.assert_allclose(
        obs["route_locs"].reshape(5, 2),
        [[i, 0.0] for i in range(5)], atol=1e-5)


def test_empty_route_is_zero():
    om = _make(_Parent(0.0, 0.0, 0.0, []))
    obs = om.get_observation()
    for k in ("lateral_dist", "angle_diff", "dist_remaining"):
        np.testing.assert_allclose(obs[k], [0.0])
    np.testing.assert_allclose(obs["route_locs"], np.zeros(10))
