"""Birdview renderer tests (pure, no CARLA)."""

import numpy as np

from muvo_tpu.sim.birdview import ActorBox, BirdviewRenderer, StaticMap
from muvo_tpu.data.dataset_utils import preprocess_birdview_and_routemap


def _static_map():
    road = np.zeros((400, 400), np.uint8)
    road[180:220, :] = 255  # horizontal road band through y ~ [36, 44] m
    lanes = np.zeros_like(road)
    lanes[199:201, :] = 255
    return StaticMap(road=road, lane_marking=lanes, pixels_per_meter=5.0,
                     world_offset=(0.0, 0.0))


def test_render_shapes_and_ego_up():
    r = BirdviewRenderer(_static_map(), width_px=192, pixels_per_meter=5.0)
    out = r.render(
        ev_x=40.0, ev_y=40.0, ev_yaw_deg=0.0,
        vehicles=[ActorBox(45.0, 40.0, 0.0, 2.4, 1.0)],
        walkers=[], route_xy=np.array([[40.0, 40.0], [60.0, 40.0]]),
    )
    masks, rendered = out["masks"], out["rendered"]
    assert masks.shape == (15, 192, 192)
    assert rendered.shape == (192, 192, 3)
    # ego drives along +x; facing up means road ahead occupies upper rows
    road = masks[0]
    assert road.sum() > 0
    # vehicle 5m ahead should appear above the ego anchor row (192-40=152)
    veh = masks[3 + 3]  # newest vehicle history channel
    ys, xs = np.nonzero(veh)
    assert len(ys) > 0
    assert ys.mean() < 152
    # route polyline rendered
    assert masks[1].sum() > 0


def test_render_feeds_collection_pipeline():
    r = BirdviewRenderer(_static_map(), width_px=192)
    out = r.render(40.0, 40.0, 0.0, [], [], np.zeros((0, 2)))
    processed, route_map = preprocess_birdview_and_routemap(out["masks"])
    assert processed.shape == (8, 192, 192)
    assert route_map.shape == (192, 192)


def test_history_accumulates():
    r = BirdviewRenderer(_static_map(), width_px=64, history_len=3)
    for i in range(5):
        out = r.render(40.0 + i, 40.0, 0.0,
                       [ActorBox(50.0, 40.0, 0.0, 2.0, 1.0)], [],
                       np.zeros((0, 2)))
    assert len(r._vehicle_history) == 3
