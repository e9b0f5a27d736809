"""Total training objective: per-head weighted losses.

Mirrors reference muvo/trainer.py:251-390 (compute_loss): per-scale (1, 2, 4)
losses with 1/k discounts, KL balancing, instance centre/offset weighting,
MonoScene scal losses for voxels.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from muvo_tpu.constants import SEMANTIC_SEG_WEIGHTS, VOXEL_SEG_WEIGHTS
from muvo_tpu.losses import (
    kl_loss,
    regression_loss,
    segmentation_loss,
    spatial_regression_loss,
    ssim,
    voxel_losses_fused,
)


def compute_loss(cfg, batch: Dict, output: Dict) -> Dict[str, jnp.ndarray]:
    losses: Dict[str, jnp.ndarray] = {}
    action_weight = cfg.LOSSES.WEIGHT_ACTION

    if "throttle_brake" in output:
        losses["throttle_brake"] = action_weight * regression_loss(
            output["throttle_brake"], batch["throttle_brake"], norm=1
        )
    if "steering" in output:
        losses["steering"] = action_weight * regression_loss(
            output["steering"], batch["steering"], norm=1
        )

    if cfg.MODEL.TRANSITION.ENABLED and "prior" in output and "posterior" in output:
        losses["probabilistic"] = cfg.LOSSES.WEIGHT_PROBABILISTIC * kl_loss(
            output["prior"], output["posterior"],
            alpha=cfg.LOSSES.KL_BALANCING_ALPHA,
        )

    if cfg.SEMANTIC_SEG.ENABLED:
        weights = (jnp.asarray(SEMANTIC_SEG_WEIGHTS)
                   if cfg.SEMANTIC_SEG.USE_WEIGHTS else None)
        for k in (1, 2, 4):
            discount = 1.0 / k
            seg = segmentation_loss(
                output[f"bev_segmentation_{k}"],
                batch[f"birdview_label_{k}"][..., 0],
                use_top_k=cfg.SEMANTIC_SEG.USE_TOP_K,
                top_k_ratio=cfg.SEMANTIC_SEG.TOP_K_RATIO,
                weights=weights,
            )
            losses[f"bev_segmentation_{k}"] = (
                discount * cfg.LOSSES.WEIGHT_SEGMENTATION * seg
            )
            center = spatial_regression_loss(
                output[f"bev_instance_center_{k}"],
                batch[f"center_label_{k}"], norm=2,
            )
            offset = spatial_regression_loss(
                output[f"bev_instance_offset_{k}"],
                batch[f"offset_label_{k}"], norm=1,
                ignore_index=cfg.INSTANCE_SEG.IGNORE_INDEX,
            )
            center = cfg.INSTANCE_SEG.CENTER_LOSS_WEIGHT * center
            offset = cfg.INSTANCE_SEG.OFFSET_LOSS_WEIGHT * offset
            losses[f"bev_center_{k}"] = (
                discount * cfg.LOSSES.WEIGHT_INSTANCE * center
            )
            # offsets are already discounted in the labels
            losses[f"bev_offset_{k}"] = cfg.LOSSES.WEIGHT_INSTANCE * offset

    if cfg.EVAL.RGB_SUPERVISION:
        rgb_weight = 0.1
        for k in (1, 2, 4):
            discount = 1.0 / k
            rgb = spatial_regression_loss(
                output[f"rgb_{k}"], batch[f"rgb_label_{k}"], norm=1
            )
            rgb_instance = 0.0
            if cfg.LOSSES.RGB_INSTANCE:
                rgb_instance = spatial_regression_loss(
                    output[f"rgb_{k}"], batch[f"rgb_label_{k}"], norm=1,
                    instance_mask=batch[f"image_instance_mask_{k}"],
                )
            if cfg.LOSSES.SSIM:
                ssim_loss = 1 - ssim(
                    output[f"rgb_{k}"], batch[f"rgb_label_{k}"], channel=3
                )
                losses[f"ssim_{k}"] = rgb_weight * discount * ssim_loss * 0.6
            losses[f"rgb_{k}"] = rgb_weight * discount * (rgb + 0.5 * rgb_instance)

    if cfg.LIDAR_RE.ENABLED:
        for k in (1, 2, 4):
            discount = 1.0 / k
            re = spatial_regression_loss(
                output[f"lidar_reconstruction_{k}"][..., :3],
                batch[f"range_view_label_{k}"][..., :3], norm=2,
            )
            depth = spatial_regression_loss(
                output[f"lidar_reconstruction_{k}"][..., -1:],
                batch[f"range_view_label_{k}"][..., -1:], norm=1,
            )
            losses[f"lidar_re_{k}"] = re * discount * cfg.LOSSES.WEIGHT_LIDAR_RE
            losses[f"lidar_depth_{k}"] = depth * discount * cfg.LOSSES.WEIGHT_LIDAR_RE

    if cfg.LIDAR_SEG.ENABLED:
        weights = (jnp.asarray(VOXEL_SEG_WEIGHTS)
                   if cfg.LIDAR_SEG.USE_WEIGHTS else None)
        for k in (1, 2, 4):
            discount = 1.0 / k
            seg = segmentation_loss(
                output[f"lidar_segmentation_{k}"],
                batch[f"range_view_seg_label_{k}"][..., 0],
                use_top_k=cfg.LIDAR_SEG.USE_TOP_K,
                top_k_ratio=cfg.LIDAR_SEG.TOP_K_RATIO,
                weights=weights,
            )
            losses[f"lidar_seg_{k}"] = seg * discount * cfg.LOSSES.WEIGHT_LIDAR_SEG

    if cfg.SEMANTIC_IMAGE.ENABLED:
        weights = (jnp.asarray(VOXEL_SEG_WEIGHTS)
                   if cfg.SEMANTIC_IMAGE.USE_WEIGHTS else None)
        for k in (1, 2, 4):
            discount = 1.0 / k
            seg = segmentation_loss(
                output[f"semantic_image_{k}"],
                batch[f"semantic_image_label_{k}"][..., 0],
                use_top_k=cfg.SEMANTIC_IMAGE.USE_TOP_K,
                top_k_ratio=cfg.SEMANTIC_IMAGE.TOP_K_RATIO,
                weights=weights,
            )
            losses[f"semantic_image_{k}"] = (
                seg * discount * cfg.LOSSES.WEIGHT_SEM_IMAGE
            )

    if cfg.DEPTH.ENABLED:
        for k in (1, 2, 4):
            discount = 1.0 / k
            d = spatial_regression_loss(
                output[f"depth_{k}"], batch[f"depth_label_{k}"], norm=1
            )
            losses[f"depth_{k}"] = d * discount * cfg.LOSSES.WEIGHT_DEPTH

    if cfg.VOXEL_SEG.ENABLED:
        weights = (jnp.asarray(VOXEL_SEG_WEIGHTS)
                   if cfg.VOXEL_SEG.USE_WEIGHTS else None)
        for k in (1, 2, 4):
            discount = 1.0 / k
            # one shared log-softmax for CE + SemScal + GeoScal — the
            # standalone composition walks the fp32 voxel logits ~9x
            # (losses.voxel_losses_fused; equality-tested vs the three)
            vox, semscal, geoscal = voxel_losses_fused(
                output[f"voxel_{k}"], batch[f"voxel_label_{k}"],
                use_top_k=cfg.VOXEL_SEG.USE_TOP_K,
                top_k_ratio=cfg.VOXEL_SEG.TOP_K_RATIO,
                weights=weights,
            )
            losses[f"voxel_{k}"] = discount * cfg.LOSSES.WEIGHT_VOXEL * vox
            losses[f"sem_scal_{k}"] = discount * cfg.LOSSES.WEIGHT_VOXEL * semscal
            losses[f"geo_scal_{k}"] = discount * cfg.LOSSES.WEIGHT_VOXEL * geoscal

    if cfg.MODEL.REWARD.ENABLED:
        losses["reward"] = cfg.LOSSES.WEIGHT_REWARD * regression_loss(
            output["reward"], batch["reward"], norm=1
        )
    return losses


def reduce_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return sum(losses.values())
