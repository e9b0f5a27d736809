"""Unit tests: frustum pooling, PointPillars, RSSM, flash attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muvo_tpu.models.frustum import FrustumPooling, gen_dx_bx
from muvo_tpu.models.pointpillars import PointPillarNet
from muvo_tpu.models.rssm import RSSM
from muvo_tpu.ops.attention import multi_head_attention

rng = np.random.RandomState(42)


def test_gen_dx_bx():
    dx, bx, nx = gen_dx_bx((48, 48), 0.8, -16.0)
    assert list(nx) == [48, 48, 1]
    assert np.isclose(dx[0], 0.8) and np.isclose(dx[2], 20.0)


def brute_force_frustum_pool(fp, feats, depth, K, pose):
    """Literal per-point scatter-add reimplementation (z-buffer free)."""
    b, fh, fw, c = feats.shape
    nx0, nx1, nx2 = int(fp.nx[0]), int(fp.nx[1]), int(fp.nx[2])
    mask = np.asarray(fp.depth_mask(jnp.asarray(depth)))
    frustum = np.asarray(fp.frustum(fh, fw))  # (D, fh, fw, 3)
    out = np.zeros((b, nx2, nx1, nx0, c), np.float64)
    Kinv = np.linalg.inv(K)
    bev_K = np.asarray(fp.bev_intrinsics)
    bx, dx = np.asarray(fp.bx), np.asarray(fp.dx)
    for bi in range(b):
        rot = pose[bi, :3, :3]
        trans = pose[bi, :3, 3]
        for d in range(fp.D):
            for i in range(fh):
                for j in range(fw):
                    u, v, dep = frustum[d, i, j]
                    pt_cam = Kinv[bi] @ np.array([u * dep, v * dep, dep])
                    pt = rot @ pt_cam + trans
                    gx = pt[0] * bev_K[0, 0] + bev_K[0, 2]
                    gy = pt[1] * bev_K[1, 1] + bev_K[1, 2]
                    gz = (pt[2] - bx[2] + dx[2] / 2) / dx[2]
                    # trunc-toward-zero == torch .long() (reference quirk)
                    ix, iy, iz = int(gx), int(gy), int(gz)
                    if 0 <= ix < nx0 and 0 <= iy < nx1 and 0 <= iz < nx2:
                        w = depth[bi, i, j, d] * mask[bi, i, j, d]
                        out[bi, iz, iy, ix] += w * feats[bi, i, j]
    return out.reshape(b, nx2, nx1, nx0, c).transpose(0, 2, 3, 1, 4).reshape(
        b, nx1, nx0, nx2 * c
    )


def test_frustum_pooling_matches_brute_force():
    from muvo_tpu.geometry.camera import calculate_geometry

    fp = FrustumPooling(size=(12, 12), scale=0.8, offsetx=-4,
                        dbound=[1.0, 9.0, 1.0], downsample=8, sparse=True,
                        sparse_count=3)
    b, fh, fw, c = 2, 4, 6, 5
    feats = rng.randn(b, fh, fw, c).astype(np.float32)
    logits = rng.randn(b, fh, fw, fp.D).astype(np.float32)
    depth = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    K, E = calculate_geometry(100, fh * 8, fw * 8, 1.0, 0.0, 2.0, 0, 0, 0)
    Ks = np.broadcast_to(K, (b, 3, 3)).copy()
    poses = np.broadcast_to(E, (b, 4, 4)).copy()

    out = np.asarray(fp(jnp.asarray(feats), jnp.asarray(depth),
                        jnp.asarray(Ks), jnp.asarray(poses)))
    expected = brute_force_frustum_pool(fp, feats, depth, Ks, poses)
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
    assert np.abs(out).sum() > 0, "frustum pooled features are all zero"


def test_pointpillars_shapes_and_masking():
    net = PointPillarNet(min_x=-8, max_x=8, min_y=-8, max_y=8,
                         pixels_per_meter=1)
    b, p = 2, 64
    pts = rng.uniform(-10, 10, (b, p, 3)).astype(np.float32)
    num = np.array([40, 0], np.int32)  # second sample: no valid points
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(num),
                      train=False)
    out = net.apply(params, jnp.asarray(pts), jnp.asarray(num), train=False)
    assert out.shape == (b, 16, 16, 32)
    assert np.abs(np.asarray(out[1])).sum() == 0, "empty cloud must give zeros"
    assert np.abs(np.asarray(out[0])).sum() > 0


def test_rssm_rollout_and_determinism():
    model = RSSM(embedding_dim=16, action_dim=2, hidden_state_dim=24,
                 state_dim=12, action_latent_dim=8)
    b, s = 2, 5
    emb = jnp.asarray(rng.randn(b, s, 16), jnp.float32)
    act = jnp.asarray(rng.randn(b, s, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb, act, training=False,
                        rng=jax.random.PRNGKey(1))
    out1 = model.apply(params, emb, act, training=False, rng=jax.random.PRNGKey(1))
    out2 = model.apply(params, emb, act, training=False, rng=jax.random.PRNGKey(1))
    for branch in ("prior", "posterior"):
        for key in ("hidden_state", "sample", "mu", "sigma"):
            assert out1[branch][key].shape[:2] == (b, s)
            np.testing.assert_array_equal(
                np.asarray(out1[branch][key]), np.asarray(out2[branch][key])
            )
    # sigma respects the floor
    assert (np.asarray(out1["prior"]["sigma"]) > 0.1).all()
    # prior and posterior share the hidden state
    np.testing.assert_array_equal(
        np.asarray(out1["prior"]["hidden_state"]),
        np.asarray(out1["posterior"]["hidden_state"]),
    )


def test_rssm_imagine_step_consistency():
    """imagine_step chained manually matches scan semantics at step 0."""
    model = RSSM(embedding_dim=16, action_dim=2, hidden_state_dim=24,
                 state_dim=12, action_latent_dim=8)
    b = 2
    emb = jnp.asarray(rng.randn(b, 1, 16), jnp.float32)
    act = jnp.zeros((b, 1, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb, act, training=False,
                        rng=jax.random.PRNGKey(1))

    h = jnp.zeros((b, 24))
    smp = jnp.zeros((b, 12))
    prior = model.apply(params, h, smp, jnp.zeros((b, 2)), False,
                        method=model.imagine_step)
    seq = model.apply(params, emb, act, use_sample=False, training=False,
                      rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(prior["mu"]),
                               np.asarray(seq["prior"]["mu"][:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_flash_attention_matches_reference():
    b, h, n, d = 1, 2, 300, 48
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    from muvo_tpu.ops.flash_attention import flash_attention, _reference_attention

    out = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(
        _reference_attention(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                             v.reshape(b * h, n, d))
    ).reshape(b, h, n, d)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def _flash_grad_check(b, h, n, d, rtol, atol):
    from muvo_tpu.ops.flash_attention import (_reference_attention,
                                              flash_attention)

    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    g = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)

    _, vjp = jax.vjp(flash_attention, q, k, v)
    dq, dk, dv = vjp(g)

    def ref(q, k, v):
        bh = b * h
        out = _reference_attention(q.reshape(bh, n, d), k.reshape(bh, n, d),
                                   v.reshape(bh, n, d))
        return out.reshape(b, h, n, d)

    _, ref_vjp = jax.vjp(ref, q, k, v)
    rdq, rdk, rdv = ref_vjp(g)
    for got, want, name in ((dq, rdq, "dq"), (dk, rdk, "dk"), (dv, rdv, "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=rtol, atol=atol, err_msg=name)


def test_flash_attention_backward_tiny():
    # ragged n (not a block multiple) exercises the padding/mask path
    _flash_grad_check(1, 2, 300, 48, rtol=2e-3, atol=2e-3)


def test_flash_attention_backward_block_multiple():
    _flash_grad_check(1, 1, 512, 64, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flash_attention_backward_large_tokens():
    # LARGE fusion-path shape (5,184 tokens, reference mile.py:31-32)
    _flash_grad_check(1, 1, 5184, 64, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("dpad", ["on", "off"])
def test_flash_attention_d32_shipped_head_dim(monkeypatch, dpad):
    """d_head=32 is the ONLY head dim the LARGE model runs (8 heads x 512
    channels, reference mile.py:96-101) — cover it in both d-padding modes
    (MUVO_FLASH_DPAD=off keeps the MXU contraction at the true k=32).
    Ragged n exercises the tail mask; fused one-pass backward (default)."""
    monkeypatch.setenv("MUVO_FLASH_DPAD", dpad)
    _flash_grad_check(1, 2, 300, 32, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dpad", ["on", "off"])
def test_flash_attention_d32_two_kernel_bwd(monkeypatch, dpad):
    """Same d=32 coverage for the two-kernel (dq then dkv) backward — the
    automatic fallback path when the fused dq accumulator would exceed its
    VMEM budget."""
    monkeypatch.setenv("MUVO_FLASH_DPAD", dpad)
    monkeypatch.setenv("MUVO_FLASH_FUSED_BWD", "off")
    _flash_grad_check(1, 1, 512, 32, rtol=2e-3, atol=2e-3)


def test_flash_fused_bwd_vmem_fallback(monkeypatch):
    """Past the dq-scratch VMEM budget the vjp must route to the streaming
    two-kernel backward and still be correct."""
    import muvo_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_FUSED_DQ_VMEM_BUDGET", 1)  # force fallback
    _flash_grad_check(1, 1, 300, 32, rtol=2e-3, atol=2e-3)


def test_mha_dispatch():
    b, n, c = 2, 36, 32
    q = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    out = multi_head_attention(q, q, q, n_heads=4, use_flash=False)
    assert out.shape == (b, n, c)
    out_flash = multi_head_attention(q, q, q, n_heads=4, use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_flash),
                               rtol=2e-3, atol=2e-3)
