"""Simulator-agnostic sim-layer tests: reward shaping, terminal logic,
hazard detection, route planning."""

import numpy as np

from muvo_tpu.sim.hazard import lbc_hazard_vehicle, lbc_hazard_walker
from muvo_tpu.sim.reward import (
    LIGHT_RED,
    RewardInput,
    TerminalInput,
    ValeoActionReward,
    ValeoTerminal,
    desired_speed_from_hazard,
)
from muvo_tpu.sim.route_planner import (
    GlobalRoutePlanner,
    RoadOption,
    RoadSegment,
    downsample_route,
)


def test_desired_speed_shaping():
    # no hazard -> max speed
    assert desired_speed_from_hazard(None, 8.0) == 6.0
    # hazard at clearance distance -> zero desired speed
    assert desired_speed_from_hazard(np.array([8.0, 0.0]), 8.0) == 0.0
    # hazard at clearance + 2.5m -> half speed
    np.testing.assert_allclose(
        desired_speed_from_hazard(np.array([10.5, 0.0]), 8.0), 3.0
    )


def test_reward_free_road_at_speed():
    r = ValeoActionReward()
    reward, debug = r(RewardInput(speed=6.0, steer=0.0))
    np.testing.assert_allclose(reward, 1.0)  # perfect speed, on route


def test_reward_red_light_penalises_speed():
    r = ValeoActionReward()
    reward, debug = r(RewardInput(
        speed=6.0, steer=0.0, light_state=LIGHT_RED,
        light_loc=np.array([5.0, 0.0]),
    ))
    assert debug["desired_speed"] == 0.0
    np.testing.assert_allclose(debug["reward_speed"], 0.0)


def test_reward_oscillation_penalty():
    r = ValeoActionReward()
    r(RewardInput(speed=6.0, steer=0.0))
    reward, debug = r(RewardInput(speed=6.0, steer=0.5))
    np.testing.assert_allclose(debug["reward_oscillation"], -0.1)


def test_terminal_stuck_detection():
    t = ValeoTerminal(stuck_steps=5)
    done = False
    for _ in range(20):
        done, rew, dbg = t(TerminalInput(speed=0.0, is_free_road=True,
                                         lateral_distance=0.0))
        if done:
            break
    assert done and dbg["blocked"]
    assert dbg["exploration_suggest"]["acc"] == 2  # "go"


def test_terminal_collision():
    t = ValeoTerminal()
    done, rew, dbg = t(TerminalInput(speed=5.0, is_free_road=False,
                                     lateral_distance=0.0, collision=True))
    assert done
    assert rew == -1.0 - 5.0  # -1 plus speed penalty
    assert dbg["traffic_rule_violated"]


def test_terminal_lateral_distance():
    # Gradual drift past the 3.5 m threshold terminates (sudden jumps get a
    # one-tick grace where the threshold is raised, reference valeo.py:70-76).
    t = ValeoTerminal()
    done, _, dbg = t(TerminalInput(speed=5.0, is_free_road=False,
                                   lateral_distance=3.6))
    assert not done  # jump from 0 -> 3.6 raises the threshold
    done, _, dbg = t(TerminalInput(speed=5.0, is_free_road=False,
                                   lateral_distance=3.8))
    assert done and dbg["route_deviation"]


def test_hazard_vehicle_detection():
    obs = {
        "binary_mask": [1, 1],
        "location": [np.array([20.0, 0.0, 0.0]), np.array([5.0, 1.0, 0.0])],
        "rotation": [np.array([0.0, 0.0, 10.0]), np.array([0.0, 0.0, 20.0])],
    }
    loc = lbc_hazard_vehicle(obs)
    np.testing.assert_array_equal(loc, obs["location"][1])  # the near one

    # oncoming (yaw 180) is ignored
    obs["rotation"][1][2] = 180.0
    obs["binary_mask"] = [0, 1]
    assert lbc_hazard_vehicle(obs) is None


def test_hazard_walker_sidewalk_ignored():
    obs = {
        "binary_mask": [1],
        "location": [np.array([4.0, 0.0, 0.0])],
        "on_sidewalk": [1],
    }
    assert lbc_hazard_walker(obs) is None
    obs["on_sidewalk"] = [0]
    assert lbc_hazard_walker(obs) is not None


def _grid_segments():
    """A T junction: straight road A->B->C plus a right turn B->D."""
    def straight(x0, x1, y):
        pts = [(float(x), float(y), 0.0) for x in range(x0, x1 + 1)]
        return pts

    segs = [
        RoadSegment(entry=(0, 0, 0), exit=(10, 0, 0), path=straight(0, 10, 0)),
        RoadSegment(entry=(10, 0, 0), exit=(20, 0, 0),
                    path=straight(10, 20, 0), intersection=True),
        RoadSegment(entry=(10, 0, 0), exit=(10, 10, 0),
                    path=[(10, float(y), 0.0) for y in range(0, 11)],
                    intersection=True),
        RoadSegment(entry=(10, 10, 0), exit=(10, 20, 0),
                    path=[(10, float(y), 0.0) for y in range(10, 21)]),
    ]
    return segs


def test_route_planner_straight():
    planner = GlobalRoutePlanner(_grid_segments())
    route = planner.trace_route((0, 0, 0), (20, 0, 0))
    assert len(route) > 10
    # ends near the destination
    assert np.linalg.norm(np.asarray(route[-1][0]) - np.asarray((20, 0, 0))) < 11
    options = {opt for _, opt in route}
    assert RoadOption.LANEFOLLOW in options or RoadOption.STRAIGHT in options


def test_route_planner_turn():
    planner = GlobalRoutePlanner(_grid_segments())
    route = planner.trace_route((0, 0, 0), (10, 20, 0))
    # passes through the junction, turning
    options = [opt for _, opt in route]
    assert any(o in (RoadOption.LEFT, RoadOption.RIGHT) for o in options)


def test_downsample_route():
    route = [((float(i), 0.0, 0.0), RoadOption.LANEFOLLOW) for i in range(100)]
    ids = downsample_route(route, sample_factor=10)
    assert ids[0] == 0 and ids[-1] == 99
    assert 5 < len(ids) < 20
