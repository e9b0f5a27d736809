"""Evaluation metrics, on-device accumulator style.

Each metric is a pair (init_state, update(state, ...) -> state) of pure
functions plus a compute(state) -> scalars, so accumulation can run jitted on
device across eval batches. Semantics match reference muvo/metrics.py
(MonoScene SSC metrics, SSIM, Chamfer, PSNR) and the torchmetrics
JaccardIndex usage in the trainer (muvo/trainer.py:74-178).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from muvo_tpu.losses import ssim as _ssim_fn


# ---------------------------------------------------------------------------
# Jaccard / IoU via confusion matrix
# ---------------------------------------------------------------------------
def jaccard_init(n_classes: int):
    return jnp.zeros((n_classes, n_classes), jnp.int32)


def jaccard_update(conf, pred, target, n_classes: int):
    """pred/target: int arrays of identical shape (any rank)."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < n_classes)
    idx = jnp.where(valid, t * n_classes + p, n_classes * n_classes)
    counts = jnp.bincount(idx, length=n_classes * n_classes + 1)[:-1]
    return conf + counts.reshape(n_classes, n_classes).astype(conf.dtype)


def jaccard_compute(conf):
    """Per-class IoU (torchmetrics 'none' average: absent classes -> 0)."""
    conf = conf.astype(jnp.float32)
    tp = jnp.diag(conf)
    fp = conf.sum(axis=0) - tp
    fn = conf.sum(axis=1) - tp
    denom = tp + fp + fn
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1), 0.0)


# ---------------------------------------------------------------------------
# SSC metrics (semantic scene completion)
# ---------------------------------------------------------------------------
def ssc_init(n_classes: int) -> Dict:
    z = jnp.zeros((), jnp.float32)
    return {
        "completion_tp": z,
        "completion_fp": z,
        "completion_fn": z,
        "tps": jnp.zeros((n_classes,), jnp.float32),
        "fps": jnp.zeros((n_classes,), jnp.float32),
        "fns": jnp.zeros((n_classes,), jnp.float32),
    }


def ssc_update(state: Dict, y_pred, y_true, n_classes: int) -> Dict:
    """y_pred/y_true: (bs, X, Y, Z) int labels; 255 = ignore."""
    mask = y_true != 255
    pred = jnp.where(mask, y_pred, 0).reshape(-1)
    true = jnp.where(mask, y_true, 0).reshape(-1)

    # occupancy completion (binary occupied-vs-empty)
    b_pred = pred > 0
    b_true = true > 0
    tp = jnp.sum(b_true & b_pred)
    fp = jnp.sum(~b_true & b_pred)
    fn = jnp.sum(b_true & ~b_pred)

    # per-class semantic counts
    cls = jnp.arange(n_classes)
    eq_t = true[None, :] == cls[:, None]
    eq_p = pred[None, :] == cls[:, None]
    tps = jnp.sum(eq_t & eq_p, axis=1)
    fps = jnp.sum(~eq_t & eq_p, axis=1)
    fns = jnp.sum(eq_t & ~eq_p, axis=1)

    return {
        "completion_tp": state["completion_tp"] + tp,
        "completion_fp": state["completion_fp"] + fp,
        "completion_fn": state["completion_fn"] + fn,
        "tps": state["tps"] + tps,
        "fps": state["fps"] + fps,
        "fns": state["fns"] + fns,
    }


def ssc_compute(state: Dict) -> Dict:
    tp, fp, fn = (state["completion_tp"], state["completion_fp"],
                  state["completion_fn"])
    nonzero = tp != 0
    precision = jnp.where(nonzero, tp / jnp.maximum(tp + fp, 1), 0.0)
    recall = jnp.where(nonzero, tp / jnp.maximum(tp + fn, 1), 0.0)
    iou = jnp.where(nonzero, tp / jnp.maximum(tp + fp + fn, 1), 0.0)
    iou_ssc = state["tps"] / (state["tps"] + state["fps"] + state["fns"] + 1e-5)
    return {
        "precision": precision,
        "recall": recall,
        "iou": iou,
        "iou_ssc": iou_ssc,
        "iou_ssc_mean": jnp.mean(iou_ssc[1:]),
    }


# ---------------------------------------------------------------------------
# Running-mean metrics: SSIM / PSNR / Chamfer
# ---------------------------------------------------------------------------
def mean_init():
    return {"total": jnp.zeros((), jnp.float32), "count": jnp.zeros((), jnp.float32)}


def mean_update(state, value):
    return {"total": state["total"] + value, "count": state["count"] + 1.0}


def mean_compute(state):
    return state["total"] / jnp.maximum(state["count"], 1e-8)


def ssim_batch(prediction, target, channel=3):
    """Mean SSIM for a (b, s, h, w, c) batch."""
    return _ssim_fn(prediction, target, channel=channel)


def psnr_batch(prediction, target, max_pixel_val=1.0):
    """Mean PSNR over (b, s, h, w, c) images (per-image MSE)."""
    mse = jnp.mean((prediction - target) ** 2, axis=(2, 3, 4))
    psnr = 20 * jnp.log10(max_pixel_val / jnp.sqrt(jnp.maximum(mse, 1e-12)))
    return psnr.mean()


def chamfer_batch(prediction, target):
    """Symmetric Chamfer over (B, N, D) point sets, halved like the reference
    CDMetric (muvo/metrics.py:238-258, torch.cdist p=2).

    Matmul (Gram) form instead of an explicit (B, N, M, D) difference tensor:
    the pairwise matrix rides the MXU and peak memory is one (N, M) slab per
    sample (lax.map over the batch) — at the reference's 10,000 sampled
    points that is 400 MB instead of 4.8 GB+.
    """
    p = prediction.astype(jnp.float32)
    t = target.astype(jnp.float32)

    def one(args):
        pi, ti = args  # (N, D), (M, D)
        p2 = jnp.sum(pi ** 2, axis=-1)  # (N,)
        t2 = jnp.sum(ti ** 2, axis=-1)  # (M,)
        g = pi @ ti.T  # (N, M) on the MXU
        d2 = p2[:, None] + t2[None, :] - 2.0 * g
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        dl = dist.min(axis=0).mean()  # target -> nearest prediction
        dr = dist.min(axis=1).mean()  # prediction -> nearest target
        return (dl + dr) / 2

    return jax.lax.map(one, (p, t)).mean()
