"""Decoded-tensor frame cache: decode every frame ONCE, then stream memmaps.

The slot the reference fills with a multiprocess DataLoader worker pool
(reference train.py:70-76, muvo/data/dataset.py:212-369 — N CPU workers
PNG-decode in parallel): this host has ONE weak core, so parallel decode
cannot close the input gap (measured r4: 5.9 frames/s/chip live-loader vs
53 on a device-resident batch). Instead, the first epoch's decode work is
done once, per run, into per-key memory-mapped ``.npy`` files; every later
read is a page-cache memcpy (~ms per sequence instead of ~400 ms of PNG
inflate + projection), so the TPU step — not the host — sets throughput.

Layout (one directory per run):
    <cache_dir>/<run_id>/
        _meta.json          {fingerprint, n_frames, keys: {name: {dtype,
                             shape}}}  — written LAST: its presence marks a
                             complete, readable cache
        _valid.npy          (T,) bool — frames whose decode raised are
                             invalid; reads re-raise so CarlaDataset's
                             neighbouring-sample fallback still applies
        <key>.npy           (T, *shape) memmap per decoded output key

Space savers vs caching `_load_frame`'s dict verbatim:
  * ``route_map`` is stored single-channel (the decoder output is a
    broadcast-to-3 of a grayscale PNG) and re-broadcast at read;
  * ``intrinsics``/``extrinsics`` are per-dataset constants and are not
    stored at all.

The cache key is a fingerprint of every config field that shapes decode
output (enabled heads, point-cloud geometry, voxel grid, remap table), so a
config change transparently rebuilds instead of serving stale tensors.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

import numpy as np

from muvo_tpu.data.dataset import CarlaDataset

_META = "_meta.json"
_VALID = "_valid.npy"


def decode_fingerprint(dataset: CarlaDataset) -> str:
    """Hash of everything that affects `_load_frame` output values/shapes."""
    cfg = dataset.cfg
    spec = {
        "semantic_seg": cfg.SEMANTIC_SEG.ENABLED,
        "lidar_enabled": cfg.MODEL.LIDAR.ENABLED,
        "lidar_seg": cfg.LIDAR_SEG.ENABLED,
        "point_pillar": cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED,
        "voxel_seg": cfg.VOXEL_SEG.ENABLED,
        "voxel_size": list(cfg.VOXEL.SIZE),
        "semantic_image": cfg.SEMANTIC_IMAGE.ENABLED,
        "depth": cfg.DEPTH.ENABLED,
        "rgb_instance": cfg.LOSSES.RGB_INSTANCE,
        "device_projection": cfg.POINTS.DEVICE_PROJECTION,
        "points": [cfg.POINTS.CHANNELS, cfg.POINTS.HORIZON_RESOLUTION,
                   list(cfg.POINTS.FOV), list(cfg.POINTS.LIDAR_POSITION),
                   cfg.POINTS.N_PER_SECOND],
        "remap": hashlib.sha1(np.ascontiguousarray(
            dataset.remap)).hexdigest(),
        "version": 1,  # bump to invalidate all caches on format changes
    }
    return hashlib.sha1(json.dumps(spec, sort_keys=True,
                                   default=str).encode()).hexdigest()


def _run_cache_dir(cache_dir: str, run_id: str) -> str:
    return os.path.join(cache_dir, run_id.replace(os.sep, "__"))


def build_run_cache(dataset: CarlaDataset, run_id: str, cache_dir: str,
                    fingerprint: str) -> None:
    """Decode all frames of `run_id` once into memmapped per-key arrays."""
    out_dir = _run_cache_dir(cache_dir, run_id)
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset.data[run_id])
    valid = np.zeros(n, bool)
    mmaps: Dict[str, np.memmap] = {}
    keys_meta: Dict[str, dict] = {}

    for t in range(n):
        try:
            # explicitly the DECODE implementation — `dataset` is usually a
            # CachedCarlaDataset whose own _load_frame reads this very cache
            frame = CarlaDataset._load_frame(dataset, run_id, t)
            frame.pop("intrinsics", None)  # per-dataset constants
            frame.pop("extrinsics", None)
            if "route_map" in frame:  # stored single-channel (see module doc)
                frame["route_map"] = frame["route_map"][..., 0]
        except Exception:
            continue  # stays invalid; read path re-raises
        if not mmaps:
            for k, v in frame.items():
                v = np.asarray(v)
                mmaps[k] = np.lib.format.open_memmap(
                    os.path.join(out_dir, f"{k}.npy"), mode="w+",
                    dtype=v.dtype, shape=(n,) + v.shape)
                keys_meta[k] = {"dtype": str(v.dtype),
                                "shape": list(v.shape)}
        for k, v in frame.items():
            mmaps[k][t] = v
        valid[t] = True

    for m in mmaps.values():
        m.flush()
        del m
    np.save(os.path.join(out_dir, _VALID), valid)
    # meta last: its presence marks the cache complete (a killed build is
    # rebuilt on next startup instead of half-read)
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"fingerprint": fingerprint, "n_frames": int(n),
                   "keys": keys_meta}, f)


def _cache_ok(out_dir: str, fingerprint: str, n_frames: int) -> bool:
    meta_path = os.path.join(out_dir, _META)
    if not os.path.isfile(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    return (meta.get("fingerprint") == fingerprint
            and meta.get("n_frames") == n_frames)


class CachedCarlaDataset(CarlaDataset):
    """CarlaDataset whose `_load_frame` reads decoded memmaps.

    Missing or stale run caches are built at construction (one decode pass
    per run — the work one epoch would have paid anyway, minus all later
    epochs). Reads return copies, never memmap views, so batches hold no
    file references.
    """

    def __init__(self, cfg, mode: str = "train", sequence_length: int = 1,
                 dataset_root: Optional[str] = None, towns_filter: str = "*",
                 runs_filter: str = "*", cache_dir: Optional[str] = None):
        super().__init__(cfg, mode=mode, sequence_length=sequence_length,
                         dataset_root=dataset_root, towns_filter=towns_filter,
                         runs_filter=runs_filter)
        root = dataset_root if dataset_root else cfg.DATASET.DATAROOT
        if not cache_dir:
            cache_dir = os.path.join(root, "_frame_cache", cfg.DATASET.VERSION,
                                     mode)
        self.cache_dir = cache_dir
        self._fingerprint = decode_fingerprint(self)
        self._mmaps: Dict[str, Dict[str, np.ndarray]] = {}
        self._valid: Dict[str, np.ndarray] = {}
        for i, run_id in enumerate(sorted(self.data)):
            out_dir = _run_cache_dir(cache_dir, run_id)
            if not _cache_ok(out_dir, self._fingerprint,
                             len(self.data[run_id])):
                print(f"frame-cache build {i + 1}/{len(self.data)}: {run_id}",
                      flush=True)
                build_run_cache(self, run_id, cache_dir, self._fingerprint)

    def _open_run(self, run_id: str):
        out_dir = _run_cache_dir(self.cache_dir, run_id)
        with open(os.path.join(out_dir, _META)) as f:
            meta = json.load(f)
        self._valid[run_id] = np.load(os.path.join(out_dir, _VALID))
        self._mmaps[run_id] = {
            k: np.load(os.path.join(out_dir, f"{k}.npy"), mmap_mode="r")
            for k in meta["keys"]
        }

    def _load_frame(self, run_id: str, t: int) -> Dict[str, np.ndarray]:
        if run_id not in self._mmaps:
            self._open_run(run_id)
        if not self._valid[run_id][t]:
            raise ValueError(f"cached-invalid frame {run_id}/{t}")
        out: Dict[str, np.ndarray] = {}
        for k, m in self._mmaps[run_id].items():
            v = np.array(m[t])  # copy out of the memmap
            if k == "route_map":
                v = np.broadcast_to(v[..., None], (*v.shape, 3)).copy()
            out[k] = v
        out["intrinsics"] = self.intrinsics.copy()
        out["extrinsics"] = self.extrinsics.copy()
        return out
