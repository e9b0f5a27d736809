"""Offline town-map rendering: CARLA map -> h5 static layers.

Counterpart of reference carla_gym/utils/birdview_map.py: rasterises the road
polygons and lane markings of each town into (H, W) uint8 layers saved as
maps/TownXX.h5 with pixels_per_meter + world offset attrs, for the birdview
observation manager.

Requires a running CARLA server.

Usage: python tools/render_town_maps.py --host localhost --port 2000 \
    --towns Town01 Town02 --out maps/ --ppm 10
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_map(world, ppm: float):
    import cv2

    carla_map = world.get_map()
    topology = carla_map.get_topology()

    # world bounds from all waypoints
    waypoints = carla_map.generate_waypoints(2.0)
    xs = [wp.transform.location.x for wp in waypoints]
    ys = [wp.transform.location.y for wp in waypoints]
    margin = 50.0
    min_x, min_y = min(xs) - margin, min(ys) - margin
    max_x, max_y = max(xs) + margin, max(ys) + margin
    width = int((max_x - min_x) * ppm)
    height = int((max_y - min_y) * ppm)

    road = np.zeros((height, width), np.uint8)
    lane_marking = np.zeros((height, width), np.uint8)
    lane_broken = np.zeros((height, width), np.uint8)

    def to_px(loc):
        return (int((loc.x - min_x) * ppm), int((loc.y - min_y) * ppm))

    def is_broken(marking):
        try:
            import carla

            return marking.type in (
                carla.LaneMarkingType.Broken,
                carla.LaneMarkingType.BrokenBroken,
                carla.LaneMarkingType.SolidBroken,
                carla.LaneMarkingType.BrokenSolid,
            )
        except Exception:
            return False

    for entry_wp, _ in topology:
        wps = [entry_wp]
        wp = entry_wp
        for _ in range(10000):
            nxt = wp.next(1.0)
            if not nxt or nxt[0].road_id != entry_wp.road_id:
                break
            wp = nxt[0]
            wps.append(wp)
        # road polygon from lane edges; lane markings along both edges with
        # the white-broken subset in its own layer (reference
        # birdview_map.py draws per-type/per-colour markings)
        left = []
        right = []
        for wp in wps:
            tf = wp.transform
            half_w = wp.lane_width / 2.0
            right_vec = tf.get_right_vector()
            left.append(to_px(tf.location - right_vec * half_w))
            right.append(to_px(tf.location + right_vec * half_w))
        if len(left) >= 2:
            poly = np.array(left + right[::-1], np.int32)
            cv2.fillPoly(road, [poly], 255)
            for side, attr in ((left, "left_lane_marking"),
                               (right, "right_lane_marking")):
                pts = np.array(side, np.int32)
                cv2.polylines(lane_marking, [pts], False, 255, thickness=1)
                if is_broken(getattr(wps[len(wps) // 2], attr)):
                    cv2.polylines(lane_broken, [pts], False, 255, thickness=1)

    return road, lane_marking, lane_broken, (min_x, min_y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=2000)
    ap.add_argument("--towns", nargs="+", default=["Town01"])
    ap.add_argument("--out", default="maps")
    ap.add_argument("--ppm", type=float, default=10.0)
    args = ap.parse_args()

    import carla
    import h5py

    client = carla.Client(args.host, args.port)
    client.set_timeout(60.0)
    os.makedirs(args.out, exist_ok=True)

    for town in args.towns:
        world = client.load_world(town)
        road, lane, broken, offset = render_map(world, args.ppm)
        path = os.path.join(args.out, f"{town}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("road", data=road, compression="gzip")
            f.create_dataset("lane_marking_all", data=lane,
                             compression="gzip")
            f.create_dataset("lane_marking_white_broken", data=broken,
                             compression="gzip")
            f.attrs["pixels_per_meter"] = args.ppm
            f.attrs["world_offset_in_meters"] = np.asarray(offset)
        print(f"wrote {path} ({road.shape})")


if __name__ == "__main__":
    main()
