"""Loss functions. Semantics match reference muvo/losses.py (channels-last).

All functions are pure and jit-safe: data-dependent guards from the reference
(``if mask.sum() == 0``, SemScal's per-class count guards) become masked
arithmetic with identical values.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _cross_entropy(logits, target, weights: Optional[jnp.ndarray]):
    """Per-element CE. logits (..., C) vs int target (...). Optional class
    weights (C,) applied like torch's weighted cross_entropy.

    Implemented via one-hot contraction rather than take_along_axis: with the
    small class counts here (2-9) the gather and its sort-based scatter
    gradient dominated the TPU step time; the one-hot form fuses into the
    softmax elementwise pipeline.
    """
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(target, n_classes, dtype=logp.dtype)
    loss = -jnp.sum(logp * onehot, axis=-1)
    if weights is not None:
        loss = loss * jnp.sum(onehot * weights.astype(logp.dtype), axis=-1)
    return loss


def segmentation_loss(prediction, target, use_top_k=False, top_k_ratio=1.0,
                      weights: Optional[jnp.ndarray] = None,
                      poly_one=False, poly_one_coefficient=0.0):
    """prediction (b, s, h, w, c) logits; target (b, s, h, w) int.

    Optional top-k hard-pixel mining over the flattened spatial dim, and
    the PolyLoss-1 term ``+ eps * (1 - exp(-CE))`` (reference
    losses.py:39-42 — dead in the reference's shipped configs but part of
    the loss API). (reference: losses.py:9-50; also covers VoxelLoss for
    (b,s,x,y,z,c) via losses.py:175-178)
    """
    b, s = prediction.shape[:2]
    loss = _cross_entropy(prediction, target, weights)
    if poly_one:
        prob = jnp.exp(-loss)
        loss = loss + poly_one_coefficient * (1 - prob)
    loss = loss.reshape(b, s, -1)
    if use_top_k:
        k = int(top_k_ratio * loss.shape[2])
        loss, _ = jax.lax.top_k(loss, k)
    return jnp.mean(loss)


def regression_loss(prediction, target, norm=1, channel_dim=-1):
    """L1/L2 summed over the channel dim, then mean. (reference: losses.py:53-71)"""
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if norm == 1:
        loss = jnp.abs(prediction - target)
    elif norm == 2:
        loss = (prediction - target) ** 2
    else:
        raise ValueError(f"Expected norm 1 or 2, got {norm}")
    loss = jnp.sum(loss, axis=channel_dim, keepdims=True)
    return jnp.mean(loss)


def spatial_regression_loss(prediction, target, norm=1, ignore_index=255,
                            instance_mask=None):
    """Masked L1/L2 over (b, s, h, w, c). Mask: first target channel !=
    ignore_index, or an explicit instance mask. (reference: losses.py:74-99)"""
    assert prediction.ndim == 5, "Must be a 5D tensor"
    if instance_mask is not None:
        mask = instance_mask
    else:
        mask = target[..., :1] != ignore_index
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if norm == 1:
        loss = jnp.abs(prediction - target)
    else:
        loss = (prediction - target) ** 2
    loss = jnp.sum(loss, axis=-1, keepdims=True)
    mask = jnp.broadcast_to(mask, loss.shape)
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, loss, 0.0).sum() / denom


def probabilistic_loss(prior_mu, prior_sigma, posterior_mu, posterior_sigma):
    """KL(posterior || prior); first timestep vs N(0, 1).

    (reference: losses.py:102-126)
    """
    prior_mu = prior_mu.astype(jnp.float32)
    prior_sigma = prior_sigma.astype(jnp.float32)
    posterior_mu = posterior_mu.astype(jnp.float32)
    posterior_sigma = posterior_sigma.astype(jnp.float32)
    posterior_var = posterior_sigma[:, 1:] ** 2
    prior_var = prior_sigma[:, 1:] ** 2
    posterior_log_sigma = jnp.log(posterior_sigma[:, 1:])
    prior_log_sigma = jnp.log(prior_sigma[:, 1:])

    kl_div = (
        prior_log_sigma - posterior_log_sigma - 0.5
        + (posterior_var + (posterior_mu[:, 1:] - prior_mu[:, 1:]) ** 2)
        / (2 * prior_var)
    )
    # Reference quirk (losses.py:121): the first-timestep KL-vs-N(0,1) term
    # indexes into the ALREADY-SHIFTED log-sigma/var tensors, so it uses
    # sigma from t=1 while mu comes from t=0. Replicated exactly
    # (tests/test_reference_parity.py::test_kl_loss_matches_reference).
    first_kl = (
        -posterior_log_sigma[:, :1] - 0.5
        + (posterior_var[:, :1] + posterior_mu[:, :1] ** 2) / 2
    )
    kl_div = jnp.concatenate([first_kl, kl_div], axis=1)
    return jnp.mean(jnp.sum(kl_div, axis=-1))


def kl_loss(prior, posterior, alpha=0.75):
    """KL balancing (Dreamer-v2 style). (reference: losses.py:129-141)"""
    sg = jax.lax.stop_gradient
    prior_loss = probabilistic_loss(
        prior["mu"], prior["sigma"], sg(posterior["mu"]), sg(posterior["sigma"])
    )
    posterior_loss = probabilistic_loss(
        sg(prior["mu"]), sg(prior["sigma"]), posterior["mu"], posterior["sigma"]
    )
    return alpha * prior_loss + (1 - alpha) * posterior_loss


def _bce_vs_one(p):
    """F.binary_cross_entropy(p, 1) == -log(p), torch-style clamped."""
    return jnp.minimum(-jnp.log(jnp.maximum(p, _EPS)), 100.0)


def sem_scal_loss(prediction, target, ignore_index=255):
    """MonoScene scene-class affinity loss, semantic variant, vectorised.

    prediction (b, s, X, Y, Z, C) logits; target (b, s, X, Y, Z) int.
    (reference: losses.py:191-251)
    """
    c = prediction.shape[-1]
    p = jax.nn.softmax(prediction.astype(jnp.float32), axis=-1)
    # reductions over all leading axes in place of a (-1, C) flatten — a
    # flattened (N, 2) fp32 tensor picks up 64x lane padding (29 GB at the
    # flagship voxel sizes) when XLA materialises it
    red = tuple(range(target.ndim))
    mask = (target != ignore_index)[..., None].astype(p.dtype)

    onehot = jax.nn.one_hot(target, c, dtype=p.dtype) * mask
    p_masked = p * mask

    nominator = jnp.sum(p_masked * onehot, axis=red)            # (C,)
    p_sum = jnp.sum(p_masked, axis=red)
    target_sum = jnp.sum(onehot, axis=red)
    non_target_sum = jnp.sum(mask) - target_sum

    precision = nominator / jnp.maximum(p_sum, _EPS)
    recall = nominator / jnp.maximum(target_sum, _EPS)
    specificity = jnp.sum((1 - p_masked) * (1 - onehot) * mask, axis=red) / \
        jnp.maximum(non_target_sum, _EPS)

    class_present = target_sum > 0
    loss_c = jnp.where(p_sum > 0, _bce_vs_one(precision), 0.0)
    loss_c += jnp.where(target_sum > 0, _bce_vs_one(recall), 0.0)
    loss_c += jnp.where(non_target_sum > 0, _bce_vs_one(specificity), 0.0)

    count = jnp.maximum(jnp.sum(class_present.astype(p.dtype)), 1.0)
    return jnp.sum(jnp.where(class_present, loss_c, 0.0)) / count


def voxel_losses_fused(logits, target, weights: Optional[jnp.ndarray] = None,
                       use_top_k=False, top_k_ratio=1.0, ignore_index=255):
    """(segmentation_loss, sem_scal_loss, geo_scal_loss) over voxel logits
    from ONE shared log-softmax — bit-compatible restructuring of the three
    standalone functions (tests/test_losses.py::test_voxel_losses_fused).

    The standalone composition walks the (b, s, X, Y, Z, C) fp32 logits
    ~9 times (an explicit fp32 convert, log_softmax for the CE, a full
    softmax *materialised* for SemScal, another for GeoScal, plus their
    one-hot products); at the flagship voxel sizes that is tens of GB of
    HBM traffic per step. Here:
      * logits stay bf16 in HBM — the fp32 upcast fuses into each
        consuming reduction (no materialised fp32 copy),
      * max/exp-sum run once; CE, SemScal and GeoScal all reuse ``lse``,
      * SemScal's specificity numerator is algebraic in the other sums:
        sum (1-p)(1-oh) m = sum m - p_sum - target_sum + nominator,
        so no third pass exists,
      * GeoScal needs only the empty-class probability exp(l0 - lse).
    (reference: losses.py:9-50, 191-251, 254-287)
    """
    c = logits.shape[-1]
    b, s = logits.shape[:2]
    l = logits.astype(jnp.float32)
    mx = jnp.max(l, axis=-1, keepdims=True)
    lse = mx + jnp.log(jnp.sum(jnp.exp(l - mx), axis=-1, keepdims=True))
    oh = jax.nn.one_hot(target, c, dtype=jnp.float32)
    red = tuple(range(target.ndim))

    # --- segmentation CE: -sum(log_softmax * onehot) == valid*lse - pick
    pick = jnp.sum(l * oh, axis=-1)
    valid = jnp.sum(oh, axis=-1)  # 0 for out-of-range targets, as one_hot
    ce = valid * lse[..., 0] - pick
    if weights is not None:
        ce = ce * jnp.sum(oh * weights.astype(jnp.float32), axis=-1)
    ce = ce.reshape(b, s, -1)
    if use_top_k:
        k = int(top_k_ratio * ce.shape[2])
        ce, _ = jax.lax.top_k(ce, k)
    seg = jnp.mean(ce)

    # --- shared masked sums (one fused multi-output reduction pass)
    mask = (target != ignore_index)[..., None].astype(jnp.float32)
    ohm = oh * mask
    p_m = jnp.exp(l - lse) * mask  # fuses into the reductions below
    nominator = jnp.sum(p_m * ohm, axis=red)       # (C,)
    p_sum = jnp.sum(p_m, axis=red)
    target_sum = jnp.sum(ohm, axis=red)
    mask_sum = jnp.sum(mask)
    non_target_sum = mask_sum - target_sum

    # --- SemScal (losses.py:191-251 semantics)
    precision = nominator / jnp.maximum(p_sum, _EPS)
    recall = nominator / jnp.maximum(target_sum, _EPS)
    spec_num = mask_sum - p_sum - target_sum + nominator
    specificity = spec_num / jnp.maximum(non_target_sum, _EPS)
    class_present = target_sum > 0
    loss_c = jnp.where(p_sum > 0, _bce_vs_one(precision), 0.0)
    loss_c += jnp.where(target_sum > 0, _bce_vs_one(recall), 0.0)
    loss_c += jnp.where(non_target_sum > 0, _bce_vs_one(specificity), 0.0)
    count = jnp.maximum(jnp.sum(class_present.astype(jnp.float32)), 1.0)
    sem = jnp.sum(jnp.where(class_present, loss_c, 0.0)) / count

    # --- GeoScal (losses.py:254-287 semantics) from the empty-class prob
    p0 = jnp.exp(l[..., 0] - lse[..., 0])
    m2 = mask[..., 0]
    nonempty_target = ((target != 0) & (target != ignore_index)
                       ).astype(jnp.float32)
    intersection = jnp.sum(nonempty_target * (1 - p0) * m2)
    g_precision = intersection / jnp.maximum(jnp.sum((1 - p0) * m2), _EPS)
    g_recall = intersection / jnp.maximum(jnp.sum(nonempty_target), _EPS)
    g_spec = jnp.sum((m2 - nonempty_target) * p0 * m2) / \
        jnp.maximum(jnp.sum(m2 - nonempty_target), _EPS)
    geo = (_bce_vs_one(g_precision) + _bce_vs_one(g_recall)
           + _bce_vs_one(g_spec))
    return seg, sem, geo


def geo_scal_loss(prediction, target, ignore_index=255):
    """MonoScene geometric (occupancy) affinity loss.

    (reference: losses.py:254-287)
    """
    p = jax.nn.softmax(prediction.astype(jnp.float32), axis=-1)
    empty_probs = p[..., 0]  # keep the array shape; sums below are global
    nonempty_probs = 1 - empty_probs
    t = target
    mask = t != ignore_index
    nonempty_target = ((t != 0) & mask).astype(p.dtype)
    m = mask.astype(p.dtype)

    intersection = jnp.sum(nonempty_target * nonempty_probs * m)
    precision = intersection / jnp.maximum(jnp.sum(nonempty_probs * m), _EPS)
    recall = intersection / jnp.maximum(jnp.sum(nonempty_target), _EPS)
    spec = jnp.sum((m - nonempty_target) * empty_probs * m) / \
        jnp.maximum(jnp.sum(m - nonempty_target), _EPS)
    return _bce_vs_one(precision) + _bce_vs_one(recall) + _bce_vs_one(spec)


# ---------------------------------------------------------------------------
def _gaussian_window(window_size=11, sigma=1.5):
    x = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] @ g[None, :]  # (k, k)


def ssim(prediction, target, channel=3, window_size=11, sigma=1.5, L=1.0,
         non_negative=False):
    """SSIM over (b, s, h, w, c); returns per-image mean SSIM averaged.

    (reference: losses.py:292-348; VALID padding, per reference padd=0)
    """
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    b, s = prediction.shape[:2]
    pred = prediction.reshape((b * s,) + prediction.shape[2:]).astype(
        jnp.float32)
    targ = target.reshape((b * s,) + target.shape[2:]).astype(jnp.float32)

    win = _gaussian_window(window_size, sigma)[:, :, None, None]
    win = jnp.tile(win, (1, 1, 1, channel))  # depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channel,
        )

    mu1, mu2 = filt(targ), filt(pred)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(targ * targ) - mu1_sq
    sigma2_sq = filt(pred * pred) - mu2_sq
    sigma12 = filt(targ * pred) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    per_image = ssim_map.mean(axis=(1, 2, 3))
    if non_negative:
        per_image = jnp.maximum(per_image, 0.0)
    return per_image.mean()


def chamfer_distance_loss(prediction, target):
    """Symmetric point-to-point Chamfer distance over (b, s, n, d).

    (reference: losses.py:352-367)
    """
    b, s, n, d = prediction.shape
    pred = prediction.reshape(b * s, n, d).astype(jnp.float32)
    targ = target.reshape(b * s, n, d).astype(jnp.float32)
    diff = pred[:, :, None, :] - targ[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff ** 2, axis=-1), _EPS))
    dl = dist.min(axis=1)
    dr = dist.min(axis=2)
    return (dl.mean(axis=1) + dr.mean(axis=1)).mean()
