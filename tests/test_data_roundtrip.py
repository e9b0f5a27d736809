"""Integration: DataWriter -> on-disk layout -> CarlaDataset load.

Synthesises CARLA-like per-tick observations, writes an episode through the
DataWriter, then reads it back through CarlaDataset and checks content.
"""

import os

import numpy as np
import pytest

from muvo_tpu.data.dataset import CarlaDataset
from muvo_tpu.data.synthetic import tiny_test_cfg
from muvo_tpu.sim.data_writer import DataWriter, MIN_VALID_STEPS

rng = np.random.RandomState(11)


def make_obs(h=96, w=160):
    masks = np.zeros((15, 64, 64), np.uint8)
    masks[0] = 255  # road everywhere
    masks[1, 20:40, 30:34] = 255  # route
    masks[-1, 10, 10] = 80  # green light
    n_pts = 500
    return {
        "ego": {
            "central_rgb": {"data": rng.randint(0, 255, (h, w, 3), dtype=np.uint8)},
            "depth_semantic": {
                "data": rng.randint(0, 255, (h, w, 4), dtype=np.uint8)
            },
            "gnss": {
                "gnss": np.zeros(3), "target_gps": np.zeros(3),
                "imu": np.zeros(7), "command": np.array([4]),
                "target_gps_next": np.zeros(3), "command_next": np.array([4]),
            },
            "speed": {"forward_speed": np.array([5.0])},
            "route_plan": None,
            "birdview": {"masks": masks},
            "lidar_points_semantic": {
                "data": {
                    "points_xyz": rng.uniform(-30, 30, (n_pts, 3)).astype(np.float32),
                    "ObjTag": rng.randint(0, 22, n_pts).astype(np.uint8),
                    "ObjIdx": np.zeros(n_pts, np.uint32),
                    "CosAngle": np.ones(n_pts, np.float32),
                }
            },
        }
    }


def write_episode(run_dir, n_steps):
    writer = DataWriter(run_dir, "ego", run_info={"town": "Town01"})
    for t in range(n_steps):
        sup = {
            "ego": {
                "action": np.array([0.5, 0.1, 0.0], np.float32),
                "action_mu": np.zeros(2, np.float32),
                "action_sigma": np.ones(2, np.float32),
                "value": np.array([0.3], np.float32),
                "features": np.zeros(4, np.float32),
                "speed": np.array([5.0], np.float32),
            }
        }
        writer.write({"step": t}, make_obs(), sup, {"ego": 1.0})
    return writer


def test_roundtrip(tmp_path):
    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False  # voxels come from the offline tool
    cfg.SEMANTIC_SEG.ENABLED = False
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = 0.6

    run_dir = tmp_path / "trainval" / "train" / "Town01" / "0000"
    writer = write_episode(str(run_dir), 8)
    valid = writer.close({"traffic_rule_violated": False, "blocked": False,
                          "route_deviation": False}, remove_final_steps=True)
    assert valid
    assert (run_dir / "pd_dataframe.pkl").exists()
    assert (run_dir / "image" / "image_000000000.png").exists()
    assert (run_dir / "points_semantic").exists()

    # The DataWriter stores the episode-level semantic cloud per frame as the
    # raw dict; the dataset loader expects the per-frame layout directly.
    ds = CarlaDataset(cfg, mode="train", sequence_length=2,
                      dataset_root=str(tmp_path))
    assert len(ds) > 0
    item = ds[0]
    assert item["image"].shape == (2, 96, 160, 3)
    assert item["route_map"].shape[0] == 2
    assert item["range_view_pcd_xyzd"].shape == (2, 64, 128, 4)
    assert item["throttle_brake"].shape == (2, 1)
    assert np.isclose(item["throttle_brake"][0, 0], 0.5)
    assert np.isclose(item["steering"][0, 0], 0.1)


def test_frame_cache_roundtrip(tmp_path):
    """CachedCarlaDataset serves byte-identical items to the decode path,
    builds once, and rebuilds when the decode fingerprint changes."""
    import muvo_tpu.data.frame_cache as fc

    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False
    cfg.SEMANTIC_SEG.ENABLED = False
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = 0.6

    run_dir = tmp_path / "trainval" / "train" / "Town01" / "0000"
    writer = write_episode(str(run_dir), 8)
    assert writer.close({"traffic_rule_violated": False, "blocked": False,
                         "route_deviation": False}, remove_final_steps=True)

    plain = CarlaDataset(cfg, mode="train", sequence_length=2,
                         dataset_root=str(tmp_path))
    cache_dir = str(tmp_path / "cache")
    cached = fc.CachedCarlaDataset(cfg, mode="train", sequence_length=2,
                                   dataset_root=str(tmp_path),
                                   cache_dir=cache_dir)
    assert len(cached) == len(plain)
    for i in (0, len(plain) - 1):
        a, b = plain[i], cached[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            assert a[k].dtype == b[k].dtype, k

    # second construction must NOT rebuild (meta fingerprint matches)
    def _boom(*a, **k):
        raise AssertionError("cache rebuilt despite matching fingerprint")

    orig_build = fc.build_run_cache
    fc.build_run_cache = _boom
    try:
        again = fc.CachedCarlaDataset(cfg, mode="train", sequence_length=2,
                                      dataset_root=str(tmp_path),
                                      cache_dir=cache_dir)
        np.testing.assert_array_equal(again[0]["image"], plain[0]["image"])
    finally:
        fc.build_run_cache = orig_build

    # a decode-relevant config change must invalidate the cache
    cfg2 = tiny_test_cfg()
    cfg2.VOXEL_SEG.ENABLED = False
    cfg2.SEMANTIC_SEG.ENABLED = False
    cfg2.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg2.DATASET.FILTER_NORM_REWARD = 0.6
    cfg2.LOSSES.RGB_INSTANCE = not cfg.LOSSES.RGB_INSTANCE
    rebuilt = []
    fc.build_run_cache = lambda *a, **k: (rebuilt.append(1),
                                          orig_build(*a, **k))[1]
    try:
        fc.CachedCarlaDataset(cfg2, mode="train", sequence_length=2,
                              dataset_root=str(tmp_path),
                              cache_dir=cache_dir)
    finally:
        fc.build_run_cache = orig_build
    assert rebuilt


def test_invalid_episode_trimming(tmp_path):
    run_dir = tmp_path / "run"
    writer = write_episode(str(run_dir), 5)
    # traffic violation with < MIN_VALID_STEPS left: invalid, nothing saved
    valid = writer.close({"traffic_rule_violated": True, "blocked": False,
                          "route_deviation": False}, remove_final_steps=True)
    assert not valid
    assert not (run_dir / "pd_dataframe.pkl").exists()


def test_route_deviation_invalidates(tmp_path):
    run_dir = tmp_path / "run"
    writer = write_episode(str(run_dir), 4)
    valid = writer.close({"traffic_rule_violated": False, "blocked": False,
                          "route_deviation": True}, remove_final_steps=False)
    assert not valid


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.array([i], np.int32)}


def _order(batches):
    return [int(v) for b in batches for v in b["x"].ravel()]


def test_loader_epoch_deterministic_and_resumable():
    from muvo_tpu.data.loader import DataLoader

    ds = _ArrayDataset(17)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    loader.set_epoch(1)
    first = _order(loader)
    again = _order(loader)
    assert first == again  # same (seed, epoch) -> same order
    loader.set_epoch(2)
    assert _order(loader) != first  # epoch reshuffles

    # iter_from(k) is the tail of the full epoch, incl. threaded decode
    loader.set_epoch(1)
    tail = _order(loader.iter_from(2))
    assert _order(iter(loader))[2 * 4:] == tail
    threaded = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                          num_workers=2)
    threaded.set_epoch(1)
    assert _order(threaded.iter_from(2)) == tail


def test_corrupt_frame_resamples_full_shape(tmp_path):
    """A corrupt frame must not shrink the sequence (VERDICT r1 item 10):
    the loader falls back to a neighbouring pointer and every batch keeps
    the full (seq, ...) shape the jitted step was compiled for."""
    cfg = tiny_test_cfg()
    cfg.VOXEL_SEG.ENABLED = False
    cfg.SEMANTIC_SEG.ENABLED = False
    cfg.DATASET.FILTER_BEGINNING_OF_RUN_SEC = 0.0
    cfg.DATASET.FILTER_NORM_REWARD = 0.6

    run_dir = tmp_path / "trainval" / "train" / "Town01" / "0000"
    writer = write_episode(str(run_dir), 8)
    assert writer.close({"traffic_rule_violated": False, "blocked": False,
                         "route_deviation": False}, remove_final_steps=True)

    ds = CarlaDataset(cfg, mode="train", sequence_length=2,
                      dataset_root=str(tmp_path))
    assert len(ds) > 1
    # corrupt the frame used by pointer 0's first index
    run_id, indices = ds.data_pointers[0]
    row = ds.data[run_id].iloc[indices[0]]
    victim = os.path.join(str(tmp_path), "trainval", "train", run_id,
                          row["image_path"])
    with open(victim, "wb") as f:
        f.write(b"not a png")

    item = ds[0]  # falls through to pointer 1
    assert item["image"].shape == (2, 96, 160, 3)
    assert item["range_view_pcd_xyzd"].shape == (2, 64, 128, 4)
