"""Metric correctness: confusion IoU, SSC counts, PSNR vs hand values."""

import numpy as np
import jax.numpy as jnp

from muvo_tpu import metrics as M


def test_jaccard_hand_example():
    n = 3
    conf = M.jaccard_init(n)
    pred = jnp.asarray([0, 0, 1, 1, 2, 2, 2])
    true = jnp.asarray([0, 1, 1, 1, 2, 0, 2])
    conf = M.jaccard_update(conf, pred, true, n)
    iou = np.asarray(M.jaccard_compute(conf))
    # class 0: tp=1, fp=1 (pred0,true1), fn=1 (true0,pred2) -> 1/3
    np.testing.assert_allclose(iou[0], 1 / 3)
    # class 1: tp=2, fp=0, fn=1 -> 2/3
    np.testing.assert_allclose(iou[1], 2 / 3)
    # class 2: tp=2, fp=1, fn=0 -> 2/3
    np.testing.assert_allclose(iou[2], 2 / 3)


def test_jaccard_ignores_out_of_range_targets():
    conf = M.jaccard_init(2)
    pred = jnp.asarray([0, 1, 1])
    true = jnp.asarray([0, 255, 1])  # 255 ignored
    conf = M.jaccard_update(conf, pred, true, 2)
    assert int(np.asarray(conf).sum()) == 2


def test_ssc_metrics_hand_example():
    state = M.ssc_init(2)
    pred = jnp.asarray([[[[1, 0], [1, 1]]]])  # (1, 1, 2, 2)
    true = jnp.asarray([[[[1, 1], [0, 1]]]])
    state = M.ssc_update(state, pred, true, 2)
    stats = M.ssc_compute(state)
    # occupancy: tp=2 (both 1&1), fp=1, fn=1
    np.testing.assert_allclose(float(stats["precision"]), 2 / 3)
    np.testing.assert_allclose(float(stats["recall"]), 2 / 3)
    np.testing.assert_allclose(float(stats["iou"]), 2 / 4)


def test_ssc_ignore_voxels():
    state = M.ssc_init(2)
    pred = jnp.asarray([[[[1, 1]]]])
    true = jnp.asarray([[[[255, 1]]]])
    state = M.ssc_update(state, pred, true, 2)
    stats = M.ssc_compute(state)
    np.testing.assert_allclose(float(stats["precision"]), 1.0)


def test_psnr_known_value():
    pred = jnp.zeros((1, 1, 4, 4, 3))
    target = jnp.full((1, 1, 4, 4, 3), 0.1)
    psnr = float(M.psnr_batch(pred, target))
    np.testing.assert_allclose(psnr, 20.0, atol=1e-4)  # 20*log10(1/0.1)


def test_chamfer_identical_zero():
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 16, 3), jnp.float32)
    assert float(M.chamfer_batch(pts, pts)) < 1e-4


def test_chamfer_matches_torch_cdist_reference():
    """chamfer_batch must reproduce the reference CDMetric computation
    (muvo/metrics.py:238-258): torch.cdist p=2, per-side mean over points,
    halved sum, then mean over the batch."""
    import torch

    rs = np.random.RandomState(7)
    pred = rs.randn(3, 25, 3).astype(np.float32)
    target = rs.randn(3, 31, 3).astype(np.float32) * 2.0 + 0.5

    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    dist = torch.cdist(tp, tt, 2)
    dl, dr = dist.min(1)[0], dist.min(2)[0]
    expected = ((dl.mean(dim=1) + dr.mean(dim=1)) / 2).mean().item()

    got = float(M.chamfer_batch(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
