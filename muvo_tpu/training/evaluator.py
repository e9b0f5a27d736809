"""Evaluation driver: reconstruction + imagination metrics over the test
samplers.

Mirrors the reference test protocol (muvo/trainer.py:1079-1095, 426-567):
observe RECEPTIVE_FIELD frames, imagine FUTURE_HORIZON frames N_SAMPLES
times, and accumulate BEV/LiDAR/camera IoU, SSIM, PSNR, Chamfer distance and
SSC voxel metrics separately for reconstruction and imagination.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from muvo_tpu import metrics as M

CLASS_NAMES_BEV = [
    "Background", "Road", "Lane marking", "Vehicle", "Pedestrian",
    "Green light", "Yellow light", "Red light and stop sign",
]


class MetricSuite:
    """On-host accumulation of on-device metric updates."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.reset()

    def reset(self):
        cfg = self.cfg
        self.state: Dict = {}
        if cfg.SEMANTIC_SEG.ENABLED:
            self.state["iou"] = M.jaccard_init(cfg.SEMANTIC_SEG.N_CHANNELS)
        if cfg.EVAL.RGB_SUPERVISION:
            self.state["ssim"] = M.mean_init()
            self.state["psnr"] = M.mean_init()
        if cfg.LIDAR_RE.ENABLED:
            self.state["cd"] = M.mean_init()
        if cfg.LIDAR_SEG.ENABLED:
            self.state["pcd_iou"] = M.jaccard_init(cfg.LIDAR_SEG.N_CLASSES)
        if cfg.SEMANTIC_IMAGE.ENABLED:
            self.state["image_iou"] = M.jaccard_init(cfg.SEMANTIC_IMAGE.N_CLASSES)
        if cfg.VOXEL_SEG.ENABLED:
            self.state["ssc"] = M.ssc_init(cfg.VOXEL_SEG.N_CLASSES)

    def update(self, batch: Dict, output: Dict, rng=None):
        cfg = self.cfg
        if cfg.SEMANTIC_SEG.ENABLED:
            pred = jnp.argmax(output["bev_segmentation_1"], axis=-1)
            self.state["iou"] = M.jaccard_update(
                self.state["iou"], pred, batch["birdview_label"][..., 0],
                cfg.SEMANTIC_SEG.N_CHANNELS,
            )
        if cfg.EVAL.RGB_SUPERVISION:
            self.state["ssim"] = M.mean_update(
                self.state["ssim"],
                M.ssim_batch(output["rgb_1"], batch["rgb_label_1"]),
            )
            self.state["psnr"] = M.mean_update(
                self.state["psnr"],
                M.psnr_batch(output["rgb_1"], batch["rgb_label_1"]),
            )
        if cfg.LIDAR_RE.ENABLED:
            scale = cfg.LIDAR_RE.SCALE
            target = batch["range_view_label_1"] * scale
            pred = output["lidar_reconstruction_1"] * scale
            b, s, h, w, c = pred.shape
            pcd_t = target.reshape(b * s, h * w, c)[..., :-1]
            pcd_p = pred.reshape(b * s, h * w, c)[..., :-1]
            # subsample 10,000 random columns with replacement, matching the
            # reference exactly (muvo/trainer.py:453 np.random.randint)
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            idx = jax.random.randint(rng, (10000,), 0, h * w)
            self.state["cd"] = M.mean_update(
                self.state["cd"],
                M.chamfer_batch(pcd_p[:, idx], pcd_t[:, idx]),
            )
        if cfg.LIDAR_SEG.ENABLED:
            pred = jnp.argmax(output["lidar_segmentation_1"], axis=-1)
            self.state["pcd_iou"] = M.jaccard_update(
                self.state["pcd_iou"], pred,
                batch["range_view_seg_label_1"][..., 0],
                cfg.LIDAR_SEG.N_CLASSES,
            )
        if cfg.SEMANTIC_IMAGE.ENABLED:
            pred = jnp.argmax(output["semantic_image_1"], axis=-1)
            self.state["image_iou"] = M.jaccard_update(
                self.state["image_iou"], pred,
                batch["semantic_image_label_1"][..., 0],
                cfg.SEMANTIC_IMAGE.N_CLASSES,
            )
        if cfg.VOXEL_SEG.ENABLED:
            pred = jnp.argmax(output["voxel_1"], axis=-1)
            b, s = pred.shape[:2]
            self.state["ssc"] = M.ssc_update(
                self.state["ssc"],
                pred.reshape((b * s,) + pred.shape[2:]),
                batch["voxel_label_1"].reshape((b * s,) + pred.shape[2:]),
                cfg.VOXEL_SEG.N_CLASSES,
            )

    def compute(self) -> Dict[str, float]:
        cfg = self.cfg
        out: Dict[str, float] = {}
        if cfg.SEMANTIC_SEG.ENABLED:
            scores = np.asarray(M.jaccard_compute(self.state["iou"]))
            for name, val in zip(CLASS_NAMES_BEV, scores):
                out[f"bev_iou_{name}"] = float(val)
            out["bev_mean_iou"] = float(scores.mean())
        if cfg.EVAL.RGB_SUPERVISION:
            out["ssim"] = float(np.asarray(M.mean_compute(self.state["ssim"])))
            out["psnr"] = float(np.asarray(M.mean_compute(self.state["psnr"])))
        if cfg.LIDAR_RE.ENABLED:
            out["chamfer_distance"] = float(
                np.asarray(M.mean_compute(self.state["cd"]))
            )
        if cfg.LIDAR_SEG.ENABLED:
            scores = np.asarray(M.jaccard_compute(self.state["pcd_iou"]))
            out["lidar_mean_iou"] = float(scores.mean())
        if cfg.SEMANTIC_IMAGE.ENABLED:
            scores = np.asarray(M.jaccard_compute(self.state["image_iou"]))
            out["camera_mean_iou"] = float(scores.mean())
        if cfg.VOXEL_SEG.ENABLED:
            stats = M.ssc_compute(self.state["ssc"])
            out["voxel_precision"] = float(np.asarray(stats["precision"]))
            out["voxel_recall"] = float(np.asarray(stats["recall"]))
            out["voxel_iou"] = float(np.asarray(stats["iou"]))
            out["voxel_iou_ssc_mean"] = float(np.asarray(stats["iou_ssc_mean"]))
        return out


class Evaluator:
    """Runs the reference test protocol over a dataloader."""

    def __init__(self, trainer, n_samples: int = None):
        self.trainer = trainer
        self.cfg = trainer.cfg
        self.rf = trainer.rf
        self.fh = trainer.fh
        self.n_samples = n_samples or self.cfg.PREDICTION.N_SAMPLES
        # encode-once / imagine-many split (reference trainer.py:234-247):
        # the posterior forward + recon decoders run once per batch, only
        # the prior rollout repeats per imagination sample
        self.observe_step, self.imagine_step = trainer.make_eval_split_steps()

    def run(self, state, loader, max_batches: int = None):
        recon = MetricSuite(self.cfg)
        imagine = MetricSuite(self.cfg)
        base_rng = jax.random.PRNGKey(7)
        from muvo_tpu.parallel.mesh import shard_batch

        can_imagine = self.cfg.MODEL.TRANSITION.ENABLED and self.fh > 0
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, self.trainer.mesh
            )
            # fold_in-derived keys keep batch i's observation rng independent
            # of N_SAMPLES (recon metrics must not move with sample count)
            step_rng, im_rng = jax.random.split(
                jax.random.fold_in(base_rng, i))
            obs = self.observe_step(state, batch, step_rng)
            pb = obs["pb"]
            batch_rf = {k: v[:, : self.rf] for k, v in pb.items()}
            batch_fh = {k: v[:, self.rf:] for k, v in pb.items()}
            # N_SAMPLES independent imagination rollouts per batch
            # (reference trainer.py:244-247)
            if can_imagine:
                for s in range(self.n_samples):
                    sample_rng = jax.random.fold_in(im_rng, s)
                    out = self.imagine_step(state, pb, obs["hidden_state"],
                                            obs["sample"], sample_rng)
                    imagine.update(batch_fh, out["output_imagine"],
                                   rng=sample_rng)
            recon.update(batch_rf, obs["output"], rng=step_rng)
        return recon.compute(), imagine.compute()
