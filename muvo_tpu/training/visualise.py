"""TensorBoard visualisation of reconstructions and imaginations.

Counterpart of the reference trainer's visualise hooks
(muvo/trainer.py:569-957): composes GT-vs-prediction sequence strips for RGB,
BEV segmentation, LiDAR range view and voxel top-down projections, with the
receptive-field / future-horizon separator.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from muvo_tpu.visualisation import (
    convert_bev_to_image,
    denormalise_image,
    range_view_to_image,
    sequence_strip,
    voxel_to_bev_image,
)


def _to_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def visualise_step(cfg, batch: Dict, output: Dict,
                   output_imagine: Optional[Dict] = None,
                   max_frames: int = 8) -> Dict[str, np.ndarray]:
    """Returns {panel_name: (H, W, 3) uint8} for TB logging.

    batch/output: preprocessed batch + model output for sample 0.
    """
    batch = _to_np(batch)
    output = _to_np(output)
    imagine = _to_np(output_imagine) if output_imagine else None
    rf = cfg.RECEPTIVE_FIELD
    panels: Dict[str, np.ndarray] = {}

    def seq_of(key_out, key_in, render):
        gt_frames, pred_frames = [], []
        s_rec = output[key_out].shape[1]
        for t in range(min(s_rec, max_frames)):
            gt_frames.append(render(batch[key_in][0, t], True))
            pred_frames.append(render(output[key_out][0, t], False))
        if imagine is not None and key_out in imagine:
            s_im = imagine[key_out].shape[1]
            for t in range(min(s_im, max_frames - s_rec)):
                gt_frames.append(render(batch[key_in][0, rf + t], True))
                pred_frames.append(render(imagine[key_out][0, t], False))
        gt = sequence_strip(gt_frames, rf)
        pred = sequence_strip(pred_frames, rf)
        return np.concatenate([gt, pred], axis=0)

    if cfg.EVAL.RGB_SUPERVISION and "rgb_1" in output:
        def render_rgb(img, is_gt):
            if is_gt:
                return denormalise_image(img, cfg.IMAGE.IMAGENET_MEAN,
                                         cfg.IMAGE.IMAGENET_STD)
            return (np.clip(img, 0, 1) * 255).astype(np.uint8)

        panels["rgb"] = seq_of("rgb_1", "rgb_label_1", render_rgb)

    if cfg.SEMANTIC_SEG.ENABLED and "bev_segmentation_1" in output:
        def render_bev(x, is_gt):
            label = x[..., 0] if is_gt else np.argmax(x, axis=-1)
            return convert_bev_to_image(label)

        panels["bev"] = seq_of("bev_segmentation_1", "birdview_label_1",
                               render_bev)

    if cfg.LIDAR_RE.ENABLED and "lidar_reconstruction_1" in output:
        def render_range(x, is_gt):
            depth = x[..., -1] * cfg.LIDAR_RE.SCALE
            return range_view_to_image(depth)

        panels["range_view"] = seq_of("lidar_reconstruction_1",
                                      "range_view_label_1", render_range)

    if cfg.VOXEL_SEG.ENABLED and "voxel_1" in output:
        def render_voxel(x, is_gt):
            vox = x if is_gt else np.argmax(x, axis=-1)
            return voxel_to_bev_image(vox.astype(np.int64))

        panels["voxel_topdown"] = seq_of("voxel_1", "voxel_label_1",
                                         render_voxel)
    return panels
