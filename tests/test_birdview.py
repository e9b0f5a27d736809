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


def test_history_queue_accumulates():
    r = BirdviewRenderer(_static_map(), width_px=64)
    for i in range(25):
        r.render(40.0 + i, 40.0, 0.0,
                 [ActorBox(50.0, 40.0, 0.0, 2.0, 1.0)], [],
                 np.zeros((0, 2)))
    assert len(r._history_queue) == 20  # maxlen-20 deque (reference :50)


def test_history_idx_spacing():
    """History channels sample the queue at history_idx offsets, not the
    last consecutive ticks (reference chauffeurnet.py:216-221)."""
    r = BirdviewRenderer(_static_map(), width_px=96,
                         history_idx=[-16, -11, -6, -1])
    out = None
    # vehicle present only on ticks 0..3, then absent for 16 more ticks
    for i in range(20):
        veh = [ActorBox(50.0, 40.0, 0.0, 2.0, 1.0)] if i < 4 else []
        out = r.render(40.0, 40.0, 0.0, veh, [], np.zeros((0, 2)))
    masks = out["masks"]
    # queue holds ticks 0..19; idx -16 -> tick 4 (absent), -1 -> tick 19
    # (absent): every sampled channel is empty even though ticks 0-3 had
    # the vehicle — consecutive-tick sampling would also be empty here, so
    # check the converse case too.
    assert all(masks[3 + k].sum() == 0 for k in range(4))
    r.reset()
    # vehicle present ONLY on tick 3; after 19 ticks idx -16 == tick 3
    for i in range(19):
        veh = [ActorBox(50.0, 40.0, 0.0, 2.0, 1.0)] if i == 3 else []
        out = r.render(40.0, 40.0, 0.0, veh, [], np.zeros((0, 2)))
    masks = out["masks"]
    assert masks[3].sum() > 0        # oldest channel sees tick 3
    assert masks[3 + 1].sum() == 0   # -11 -> tick 8: empty
    assert masks[3 + 3].sum() == 0   # newest -> tick 18: empty


def test_history_clamps_while_filling():
    """While the queue is short every idx clamps to the oldest entry."""
    r = BirdviewRenderer(_static_map(), width_px=96)
    out = r.render(40.0, 40.0, 0.0,
                   [ActorBox(50.0, 40.0, 0.0, 2.0, 1.0)], [],
                   np.zeros((0, 2)))
    masks = out["masks"]
    for k in range(4):  # all four vehicle channels show the single tick
        assert masks[3 + k].sum() > 0
