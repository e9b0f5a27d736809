"""Visualisation helpers: BEV/voxel colouring, range-view images, composed
prediction strips for TensorBoard.

Counterpart of reference muvo/visualisation.py + the trainer's visualise
hooks (muvo/trainer.py:569-957), numpy/PIL-based (host-side only).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from muvo_tpu.constants import BIRDVIEW_COLOURS, VOXEL_COLOURS


def convert_bev_to_image(bev_label: np.ndarray,
                         colours: np.ndarray = BIRDVIEW_COLOURS) -> np.ndarray:
    """(h, w) int labels -> (h, w, 3) uint8 RGB."""
    label = np.clip(bev_label.astype(np.int64), 0, len(colours) - 1)
    return colours[label]


def voxel_to_bev_image(voxel: np.ndarray,
                       colours: np.ndarray = VOXEL_COLOURS) -> np.ndarray:
    """(X, Y, Z) semantic voxels -> top-down projection image.

    The highest occupied voxel wins (top-down view).
    """
    x, y, z = voxel.shape
    heights = np.arange(z)[None, None, :]
    occupied = voxel > 0
    top = np.where(occupied, heights, -1).max(axis=-1)  # (x, y)
    has = top >= 0
    labels = np.zeros((x, y), np.int64)
    labels[has] = voxel[np.nonzero(has)[0], np.nonzero(has)[1], top[has]]
    return colours[np.clip(labels, 0, len(colours) - 1)]


def range_view_to_image(range_depth: np.ndarray, max_depth: float = 80.0
                        ) -> np.ndarray:
    """(h, w) depth -> grayscale uint8 visualisation (invalid = black)."""
    valid = range_depth > 0
    norm = np.clip(range_depth / max_depth, 0, 1)
    img = (255 * (1 - norm)).astype(np.uint8)
    img[~valid] = 0
    return np.stack([img] * 3, axis=-1)


def denormalise_image(image: np.ndarray,
                      mean=(0.485, 0.456, 0.406),
                      std=(0.229, 0.224, 0.225)) -> np.ndarray:
    """Imagenet-normalised (h, w, 3) float -> uint8 RGB."""
    img = image * np.asarray(std) + np.asarray(mean)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def draw_action_gauge(width: int, value: float, label: str = "") -> np.ndarray:
    """Horizontal [-1, 1] gauge bar as a (16, width, 3) uint8 strip."""
    strip = np.full((16, width, 3), 40, np.uint8)
    mid = width // 2
    pos = int(mid + np.clip(value, -1, 1) * (mid - 2))
    lo, hi = (mid, pos) if pos >= mid else (pos, mid)
    strip[4:12, lo:hi + 1] = (60, 180, 75) if value >= 0 else (220, 50, 50)
    strip[:, mid - 1:mid + 1] = 255
    return strip


def hstack_pad(images: List[np.ndarray], pad: int = 2) -> np.ndarray:
    h = max(im.shape[0] for im in images)
    padded = []
    for im in images:
        extra = h - im.shape[0]
        im = np.pad(im, ((0, extra), (0, pad), (0, 0)), constant_values=255)
        padded.append(im)
    return np.concatenate(padded, axis=1)


def prepare_final_display_image(
    rgb_gt: np.ndarray,
    rgb_pred: np.ndarray,
    bev_gt: Optional[np.ndarray] = None,
    bev_pred: Optional[np.ndarray] = None,
    range_gt: Optional[np.ndarray] = None,
    range_pred: Optional[np.ndarray] = None,
    voxel_pred: Optional[np.ndarray] = None,
    actions: Optional[Dict[str, float]] = None,
    receptive_field: Optional[int] = None,
) -> np.ndarray:
    """Compose a GT-vs-prediction comparison strip for one frame."""
    rows = [hstack_pad([rgb_gt, rgb_pred])]
    if bev_gt is not None and bev_pred is not None:
        rows.append(hstack_pad([convert_bev_to_image(bev_gt),
                                convert_bev_to_image(bev_pred)]))
    if range_gt is not None and range_pred is not None:
        rows.append(hstack_pad([range_view_to_image(range_gt),
                                range_view_to_image(range_pred)]))
    if voxel_pred is not None:
        rows.append(voxel_to_bev_image(voxel_pred))
    if actions:
        width = rows[0].shape[1]
        for name, value in actions.items():
            rows.append(draw_action_gauge(width, value, name))
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 2), (0, w - r.shape[1]), (0, 0)),
                   constant_values=255) for r in rows]
    return np.concatenate(rows, axis=0)


def optical_flow_image(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Colour-coded Farneback optical flow between two RGB frames.

    (reference: muvo/trainer.py:1009-1020 get_color_coded_flow)
    """
    import cv2

    g1 = cv2.cvtColor(img1, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(img2, cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    hsv = np.zeros((*flow.shape[:2], 3), np.uint8)
    hsv[..., 2] = 255
    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv[..., 0] = ang * (180 / np.pi / 2)
    hsv[..., 1] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def trajectory_plot(positions: np.ndarray, size: int = 256) -> np.ndarray:
    """Top-down trajectory polyline image from (T, 2/3) positions.

    (reference trainer.py:808-842 plots ICP-derived trajectories)
    """
    import cv2

    img = np.full((size, size, 3), 255, np.uint8)
    pts = np.asarray(positions, float)[:, :2]
    if len(pts) >= 2:
        lo = pts.min(axis=0)
        span = max(float((pts.max(axis=0) - lo).max()), 1e-3)
        px = ((pts - lo) / span * (size - 20) + 10).astype(np.int32)
        cv2.polylines(img, [px], False, (0, 83, 138), 2)
        cv2.circle(img, tuple(px[0]), 4, (50, 205, 50), -1)
        cv2.circle(img, tuple(px[-1]), 4, (220, 20, 60), -1)
    return img


def sequence_strip(frames: List[np.ndarray], receptive_field: int,
                   separator_width: int = 4) -> np.ndarray:
    """Horizontally tile frames with a red separator after the RF frames."""
    h = frames[0].shape[0]
    sep = np.zeros((h, separator_width, 3), np.uint8)
    sep[..., 0] = 255
    tiles = []
    for i, f in enumerate(frames):
        if i == receptive_field:
            tiles.append(sep)
        tiles.append(f)
    return np.concatenate(tiles, axis=1)
