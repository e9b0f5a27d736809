"""Loss parity tests vs torch / brute-force numpy re-derivations."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from muvo_tpu import losses as L

rng = np.random.RandomState(7)


def test_cross_entropy_topk_matches_torch():
    b, s, h, w, c = 2, 3, 8, 8, 5
    logits = rng.randn(b, s, h, w, c).astype(np.float32)
    target = rng.randint(0, c, (b, s, h, w))
    weights = np.array([1.0, 1.0, 1.0, 2.0, 3.0], np.float32)

    # torch reference: (b*s, c, h, w) CE + topk over flattened pixels
    tl = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w),
        torch.from_numpy(target).reshape(b * s, h, w),
        weight=torch.from_numpy(weights), reduction="none",
    ).view(b, s, -1)
    k = int(0.25 * tl.shape[2])
    expected = tl.topk(k, dim=-1)[0].mean().item()

    out = L.segmentation_loss(
        jnp.asarray(logits), jnp.asarray(target), use_top_k=True,
        top_k_ratio=0.25, weights=jnp.asarray(weights),
    )
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_poly_one_matches_torch():
    """poly_one adds eps*(1-exp(-CE)) on the weighted per-element CE
    (reference losses.py:39-42)."""
    b, s, h, w, c = 2, 2, 6, 6, 4
    logits = rng.randn(b, s, h, w, c).astype(np.float32)
    target = rng.randint(0, c, (b, s, h, w))
    weights = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    eps = 0.7

    tl = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w),
        torch.from_numpy(target).reshape(b * s, h, w),
        weight=torch.from_numpy(weights), reduction="none",
    )
    tl = tl + eps * (1 - torch.exp(-tl))
    expected = tl.mean().item()

    out = L.segmentation_loss(
        jnp.asarray(logits), jnp.asarray(target),
        weights=jnp.asarray(weights), poly_one=True,
        poly_one_coefficient=eps,
    )
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_regression_loss_matches_torch():
    pred = rng.randn(2, 3, 1).astype(np.float32)
    targ = rng.randn(2, 3, 1).astype(np.float32)
    expected = (
        F.l1_loss(torch.from_numpy(pred), torch.from_numpy(targ),
                  reduction="none").sum(-1, keepdim=True).mean().item()
    )
    out = L.regression_loss(jnp.asarray(pred), jnp.asarray(targ), norm=1)
    np.testing.assert_allclose(float(out), expected, rtol=1e-6)


def test_spatial_regression_masked():
    b, s, h, w, c = 1, 2, 4, 4, 2
    pred = rng.randn(b, s, h, w, c).astype(np.float32)
    targ = rng.randn(b, s, h, w, c).astype(np.float32)
    targ[0, 0, 0, 0, :] = 255  # ignored pixel
    mask = targ[..., :1] != 255
    diff = np.abs(pred - targ).sum(-1, keepdims=True)
    expected = diff[np.broadcast_to(mask, diff.shape)].mean()
    out = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(targ), norm=1)
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_kl_loss_balancing():
    b, s, d = 2, 4, 6
    def make(scale):
        return {
            "mu": jnp.asarray(rng.randn(b, s, d).astype(np.float32)) * scale,
            "sigma": jnp.asarray(
                rng.uniform(0.2, 1.5, (b, s, d)).astype(np.float32)
            ),
        }

    prior, posterior = make(1.0), make(0.5)
    out = float(L.kl_loss(prior, posterior, alpha=0.75))

    # torch reference of ProbabilisticLoss
    def torch_prob_loss(pm, ps, qm, qs):
        pm, ps, qm, qs = map(torch.from_numpy, (pm, ps, qm, qs))
        posterior_var = qs[:, 1:] ** 2
        prior_var = ps[:, 1:] ** 2
        kl = (
            ps[:, 1:].log() - qs[:, 1:].log() - 0.5
            + (posterior_var + (qm[:, 1:] - pm[:, 1:]) ** 2) / (2 * prior_var)
        )
        # reference quirk (losses.py:121): first-step sigma terms index the
        # shifted tensors, i.e. sigma from t=1, mu from t=0
        first = (-qs[:, 1:2].log() - 0.5
                 + (posterior_var[:, :1] + qm[:, :1] ** 2) / 2)
        kl = torch.cat([first, kl], dim=1)
        return kl.sum(-1).mean().item()

    pm = np.asarray(prior["mu"]); ps = np.asarray(prior["sigma"])
    qm = np.asarray(posterior["mu"]); qs = np.asarray(posterior["sigma"])
    expected = 0.75 * torch_prob_loss(pm, ps, qm, qs) + \
        0.25 * torch_prob_loss(pm, ps, qm, qs)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_sem_scal_matches_reference_loop():
    """Brute-force per-class loop with the reference's guard semantics."""
    b, s, c, x, y, z = 1, 1, 4, 4, 4, 2
    logits = rng.randn(b, s, x, y, z, c).astype(np.float32)
    target = rng.randint(0, c, (b, s, x, y, z))
    target.flat[0] = 255  # an ignored voxel

    p = torch.softmax(torch.from_numpy(logits).reshape(-1, c), dim=-1).numpy()
    t = target.reshape(-1)
    mask = t != 255
    loss, count = 0.0, 0
    for i in range(c):
        pi = p[mask][:, i]
        ti = (t[mask] == i).astype(np.float64)
        if ti.sum() > 0:
            count += 1
            lc = 0.0
            nom = (pi * ti).sum()
            if pi.sum() > 0:
                lc += -np.log(max(nom / pi.sum(), 1e-12))
            lc += -np.log(max(nom / ti.sum(), 1e-12))
            if (1 - ti).sum() > 0:
                spec = ((1 - pi) * (1 - ti)).sum() / (1 - ti).sum()
                lc += -np.log(max(spec, 1e-12))
            loss += lc
    expected = loss / count

    out = float(L.sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_geo_scal_matches_reference_loop():
    b, s, c, x, y, z = 1, 1, 3, 4, 4, 2
    logits = rng.randn(b, s, x, y, z, c).astype(np.float32)
    target = rng.randint(0, c, (b, s, x, y, z))

    p = torch.softmax(torch.from_numpy(logits).reshape(-1, c), dim=-1).numpy()
    t = target.reshape(-1)
    empty = p[:, 0]
    nonempty = 1 - empty
    nt = (t != 0).astype(np.float64)
    inter = (nt * nonempty).sum()
    precision = inter / nonempty.sum()
    recall = inter / nt.sum()
    spec = ((1 - nt) * empty).sum() / (1 - nt).sum()
    expected = -np.log(precision) - np.log(recall) - np.log(spec)

    out = float(L.geo_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_ssim_perfect_match_is_one():
    img = rng.rand(1, 1, 24, 24, 3).astype(np.float32)
    val = float(L.ssim(jnp.asarray(img), jnp.asarray(img), channel=3))
    np.testing.assert_allclose(val, 1.0, atol=1e-5)


def test_ssim_matches_torch_conv():
    """Cross-check against a literal torch implementation."""
    b, s, c, h, w = 1, 1, 3, 16, 16
    pred = rng.rand(b, s, h, w, c).astype(np.float32)
    targ = rng.rand(b, s, h, w, c).astype(np.float32)

    # torch version (VALID padding, gaussian window 11x11 sigma 1.5)
    xs = torch.arange(11).float()
    g = torch.exp(-((xs - 5) ** 2) / (2 * 1.5 ** 2))
    g = (g / g.sum()).unsqueeze(1)
    win = (g @ g.t()).expand(c, 1, 11, 11).contiguous()
    tp = torch.from_numpy(pred).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w)
    tt = torch.from_numpy(targ).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w)
    mu1 = F.conv2d(tt, win, groups=c)
    mu2 = F.conv2d(tp, win, groups=c)
    s1 = F.conv2d(tt * tt, win, groups=c) - mu1 ** 2
    s2 = F.conv2d(tp * tp, win, groups=c) - mu2 ** 2
    s12 = F.conv2d(tt * tp, win, groups=c) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    )
    expected = ssim_map.mean().item()

    out = float(L.ssim(jnp.asarray(pred), jnp.asarray(targ), channel=3))
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_chamfer_distance():
    a = rng.randn(1, 1, 32, 3).astype(np.float32)
    out_same = float(L.chamfer_distance_loss(jnp.asarray(a), jnp.asarray(a)))
    assert out_same < 1e-4
    b = a + 1.0
    out_shift = float(L.chamfer_distance_loss(jnp.asarray(a), jnp.asarray(b)))
    assert out_shift > 0.5


def test_voxel_losses_fused_matches_standalone():
    """The fused CE+SemScal+GeoScal (one shared log-softmax) must equal the
    composition of the three standalone functions, incl. ignored voxels,
    class weights, and top-k mining."""
    b, s, c, x, y, z = 2, 2, 9, 6, 5, 4
    logits = rng.randn(b, s, x, y, z, c).astype(np.float32)
    target = rng.randint(0, c, (b, s, x, y, z))
    target.flat[::17] = 255  # ignored voxels
    lj, tj = jnp.asarray(logits), jnp.asarray(target)
    w = jnp.asarray(np.abs(rng.randn(c)).astype(np.float32) + 0.1)

    for weights, topk, ratio in [(None, False, 1.0), (w, False, 1.0),
                                 (None, True, 0.5), (w, True, 0.25)]:
        seg_f, sem_f, geo_f = L.voxel_losses_fused(
            lj, tj, weights=weights, use_top_k=topk, top_k_ratio=ratio)
        seg_e = L.segmentation_loss(lj, tj, use_top_k=topk,
                                    top_k_ratio=ratio, weights=weights)
        sem_e = L.sem_scal_loss(lj, tj)
        geo_e = L.geo_scal_loss(lj, tj)
        np.testing.assert_allclose(float(seg_f), float(seg_e), rtol=1e-5)
        np.testing.assert_allclose(float(sem_f), float(sem_e), rtol=1e-5)
        np.testing.assert_allclose(float(geo_f), float(geo_e), rtol=1e-5)


def test_voxel_losses_fused_bf16_grads_finite():
    """bf16 logits (the train-path dtype): values close to fp32, grads
    finite and matching the standalone composition."""
    b, s, c, x, y, z = 1, 1, 9, 4, 4, 4
    logits = rng.randn(b, s, x, y, z, c).astype(np.float32)
    target = jnp.asarray(rng.randint(0, c, (b, s, x, y, z)))

    def fused_total(l):
        a, b_, c_ = L.voxel_losses_fused(l, target)
        return a + b_ + c_

    def standalone_total(l):
        return (L.segmentation_loss(l, target) + L.sem_scal_loss(l, target)
                + L.geo_scal_loss(l, target))

    lb = jnp.asarray(logits).astype(jnp.bfloat16)
    vf, gf = jax.value_and_grad(fused_total)(lb)
    vs, gs = jax.value_and_grad(standalone_total)(lb)
    assert np.isfinite(float(vf))
    np.testing.assert_allclose(float(vf), float(vs), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gs, np.float32),
                               rtol=1e-2, atol=1e-3)
