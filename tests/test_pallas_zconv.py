"""Pallas z-fold conv3d: fwd + custom-vjp grads vs the plain lax 3-D conv.

Runs the kernel in interpret mode (CPU); the same code path executes
compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muvo_tpu.ops.pallas_zconv import pallas_zconv_available, zconv3d_leaky


def _reference(x, kernel, bias, slope):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        y = y + bias
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y


@pytest.mark.parametrize("shape,cout,f", [
    ((2, 8, 6, 32, 4), 4, 32),   # zb=1 (full fold)
    ((1, 8, 10, 32, 4), 8, 16),  # zb=2 (blocked, halo crosses blocks)
    ((1, 16, 6, 24, 3), 5, 8),   # odd channels, zb=3
])
def test_fwd_matches_lax(shape, cout, f):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 3, shape[-1], cout).astype(np.float32))
    bias = jnp.asarray(rs.randn(cout).astype(np.float32))
    got = zconv3d_leaky(x, kernel, bias, f, 0.2, True)
    want = _reference(x, kernel, bias, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_lax():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 6, 32, 4).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 3, 4, 8).astype(np.float32))
    bias = jnp.asarray(rs.randn(8).astype(np.float32))

    def loss_pallas(x, k, b):
        return jnp.sum(jnp.sin(zconv3d_leaky(x, k, b, 16, 0.2, True)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(_reference(x, k, b, 0.2)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, kernel, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernel, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_no_bias_no_act_grad():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 4, 16, 2).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 3, 2, 8).astype(np.float32))

    def loss_pallas(x, k):
        return jnp.sum(zconv3d_leaky(x, k, None, 16, None, True) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_reference(x, k, None, None) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, kernel)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def _interior_mask(B, X, Y, Z, C, Xp2, Yp, ZpC):
    from muvo_tpu.ops.pallas_zconv import Y_FRONT

    mrow = (np.arange(Xp2) >= 1) & (np.arange(Xp2) <= X)
    mcol = (np.arange(Yp) >= Y_FRONT) & (np.arange(Yp) < Y_FRONT + Y)
    mlane = (np.arange(ZpC) >= C) & (np.arange(ZpC) < (Z + 1) * C)
    return jnp.asarray(mrow[:, None, None] & mcol[None, :, None]
                       & mlane[None, None, :])


def test_padded_io_roundtrip():
    """padded_out emits the _pad_folded layout (zero halo); pre_padded
    consumes it — the chain conv1(padded_out) -> conv2(pre_padded) matches
    the logical-layout chain exactly."""
    from muvo_tpu.ops.pallas_zconv import (
        _pad_folded,
        zconv3d_leaky_folded,
    )

    rs = np.random.RandomState(7)
    B, X, Y, Z, C, Cm, Cout = 1, 8, 10, 32, 4, 8, 8
    x4 = jnp.asarray(rs.randn(B, X, Y, Z * C).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, 3, C, Cm).astype(np.float32))
    b1 = jnp.asarray(rs.randn(Cm).astype(np.float32))
    k2 = jnp.asarray(rs.randn(3, 3, 3, Cm, Cout).astype(np.float32))
    b2 = jnp.asarray(rs.randn(Cout).astype(np.float32))

    # logical chain
    y1 = zconv3d_leaky_folded(x4, k1, b1, C, 16, 0.2, True)
    want = zconv3d_leaky_folded(y1, k2, b2, Cm, 16, 0.2, True)

    # padded chain
    y1p = zconv3d_leaky_folded(x4, k1, b1, C, 16, 0.2, True,
                               False, True, (Y, Z))
    # the emitted layout must equal _pad_folded of the logical result
    ref_pad, Yp, Zp = _pad_folded(y1, Cm)
    assert y1p.shape == ref_pad.shape
    np.testing.assert_allclose(np.asarray(y1p), np.asarray(ref_pad),
                               rtol=1e-5, atol=1e-5)
    got = zconv3d_leaky_folded(y1p, k2, b2, Cm, 16, 0.2, True,
                               True, False, (Y, Z))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_padded_io_chain_grads():
    """Grads through conv1(padded_out) -> masked affine -> conv2(pre_padded)
    match the logical chain (the mask models AdaIN keeping the halo zero)."""
    from muvo_tpu.ops.pallas_zconv import zconv3d_leaky_folded

    rs = np.random.RandomState(8)
    B, X, Y, Z, C, Cm, Cout = 1, 8, 6, 32, 4, 8, 8
    x4 = jnp.asarray(rs.randn(B, X, Y, Z * C).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, 3, C, Cm).astype(np.float32))
    b1 = jnp.asarray(rs.randn(Cm).astype(np.float32))
    k2 = jnp.asarray(rs.randn(3, 3, 3, Cm, Cout).astype(np.float32))
    b2 = jnp.asarray(rs.randn(Cout).astype(np.float32))

    def loss_logical(x4, k1, b1, k2, b2):
        y1 = zconv3d_leaky_folded(x4, k1, b1, C, 16, 0.2, True)
        y1 = 1.5 * y1 + 0.25
        y2 = zconv3d_leaky_folded(y1, k2, b2, Cm, 16, 0.2, True)
        return jnp.sum(jnp.sin(y2))

    def loss_padded(x4, k1, b1, k2, b2):
        y1 = zconv3d_leaky_folded(x4, k1, b1, C, 16, 0.2, True,
                                  False, True, (Y, Z))
        Xp2, Yp, ZpC = y1.shape[1], y1.shape[2], y1.shape[3]
        mask = _interior_mask(B, X, Y, Z, Cm, Xp2, Yp, ZpC)
        y1 = jnp.where(mask, 1.5 * y1 + 0.25, 0.0)
        y2 = zconv3d_leaky_folded(y1, k2, b2, Cm, 16, 0.2, True,
                                  True, False, (Y, Z))
        return jnp.sum(jnp.sin(y2))

    gl = jax.grad(loss_logical, argnums=(0, 1, 2, 3, 4))(x4, k1, b1, k2, b2)
    gp = jax.grad(loss_padded, argnums=(0, 1, 2, 3, 4))(x4, k1, b1, k2, b2)
    for a, b_ in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_up_padded_out_fwd_and_grads():
    """upzconv padded_out: forward layout + grads through the padded chain
    (up-conv1 padded_out -> masked affine -> conv2 pre_padded)."""
    from muvo_tpu.ops.pallas_zconv import (
        _pad_folded,
        _pick_f_up,
        upzconv3d_leaky_folded,
        zconv3d_leaky_folded,
    )

    rs = np.random.RandomState(9)
    B, Xs, Ys, Zs, C, Cm = 1, 4, 3, 16, 8, 4
    X, Y, Z = 2 * Xs, 2 * Ys, 2 * Zs
    xy = jnp.asarray(rs.randn(B, X, Y, Zs * C).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, 3, C, Cm).astype(np.float32))
    b1 = jnp.asarray(rs.randn(Cm).astype(np.float32))
    k2 = jnp.asarray(rs.randn(3, 3, 3, Cm, Cm).astype(np.float32))
    b2 = jnp.asarray(rs.randn(Cm).astype(np.float32))
    f = _pick_f_up(Zs, C, Cm)
    assert f > 2

    y_log = upzconv3d_leaky_folded(xy, k1, b1, C, f, 0.2, True)
    y_pad = upzconv3d_leaky_folded(xy, k1, b1, C, f, 0.2, True, True)
    ref_pad, _, _ = _pad_folded(y_log, Cm)
    assert y_pad.shape == ref_pad.shape
    np.testing.assert_allclose(np.asarray(y_pad), np.asarray(ref_pad),
                               rtol=1e-5, atol=1e-5)

    def loss_logical(xy, k1, b1, k2, b2):
        y1 = upzconv3d_leaky_folded(xy, k1, b1, C, f, 0.2, True)
        y1 = 0.5 * y1 - 0.125
        y2 = zconv3d_leaky_folded(y1, k2, b2, Cm, 32, 0.2, True)
        return jnp.sum(jnp.sin(y2))

    def loss_padded(xy, k1, b1, k2, b2):
        y1 = upzconv3d_leaky_folded(xy, k1, b1, C, f, 0.2, True, True)
        Xp2, Yp, ZpC = y1.shape[1], y1.shape[2], y1.shape[3]
        mask = _interior_mask(B, X, Y, Z, Cm, Xp2, Yp, ZpC)
        y1 = jnp.where(mask, 0.5 * y1 - 0.125, 0.0)
        y2 = zconv3d_leaky_folded(y1, k2, b2, Cm, 32, 0.2, True,
                                  True, False, (Y, Z))
        return jnp.sum(jnp.sin(y2))

    gl = jax.grad(loss_logical, argnums=(0, 1, 2, 3, 4))(xy, k1, b1, k2, b2)
    gp = jax.grad(loss_padded, argnums=(0, 1, 2, 3, 4))(xy, k1, b1, k2, b2)
    for a, b_ in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_availability_gate():
    # flagship voxel decoder stages (z, c_in, c_out, X)
    assert pallas_zconv_available(64, 16, 8, 192)   # conv3/conv1
    assert pallas_zconv_available(64, 8, 8, 192)    # conv3/conv2
    assert pallas_zconv_available(32, 32, 16, 96)   # conv2/conv1
    assert pallas_zconv_available(32, 16, 16, 96)   # conv2/conv2
    assert not pallas_zconv_available(16, 16, 8, 48)   # z <= 18: full band
    assert not pallas_zconv_available(30, 4, 128, 8)   # offsets unalignable


def test_voxel_decoder_folded_matches_default(monkeypatch):
    """The z-folded Pallas trunk (MUVO_CONV3D=pallas, interpret off-TPU)
    must reproduce the default XLA voxel decoder — outputs and grads."""
    from muvo_tpu.models.stylegan import VoxelDecoder

    dec = VoxelDecoder(latent_n_channels=8, semantic_n_channels=2,
                       feature_channels=16, constant_size=(1, 1, 1))
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(1, 8).astype(np.float32))

    monkeypatch.setenv("MUVO_CONV3D", "off")
    params = dec.init(jax.random.PRNGKey(0), w)

    def loss(params, w):
        out = dec.apply(params, w)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values()), out

    (l_ref, out_ref), g_ref = jax.value_and_grad(loss, has_aux=True)(params, w)

    monkeypatch.setenv("MUVO_CONV3D", "pallas")
    # param structure must be identical across paths (checkpoint compat)
    params2 = dec.init(jax.random.PRNGKey(0), w)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    (l_p, out_p), g_p = jax.value_and_grad(loss, has_aux=True)(params, w)

    assert set(out_ref) == set(out_p) == {"voxel_1", "voxel_2", "voxel_4"}
    for k in out_ref:
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_ref[k]),
                                   rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(l_p), float(l_ref), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_ref)):
        # grads reach ~1e4 magnitude (normal(1.0) constant tensor) and the
        # deep sin() loss amplifies fp32 accumulation-order noise, so
        # compare norm-relative per leaf (measured noise ~1.2e-4; a
        # structural bug shows as O(1)). The padded-IO chain itself is
        # bit-exact in f64 (see test_padded_io_chain_grads).
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / max(1.0, np.abs(b).max())
        assert rel < 2e-3, f"grad mismatch: norm-relative {rel}"


def test_fused_upsample_conv_matches_reference():
    """upzconv3d_leaky_folded == LeakyReLU(conv3d(trilinear_up_2x(x)) + b),
    with x/y upsampled outside and z composed into the banded weight."""
    from muvo_tpu.models.layers import upsample2x_trilinear
    from muvo_tpu.ops.pallas_zconv import (
        _pick_f_up,
        upzconv3d_leaky_folded,
    )

    rs = np.random.RandomState(4)
    B, Xs, Ys, Zs, C, Cout = 1, 4, 6, 16, 8, 4
    x5 = jnp.asarray(rs.randn(B, Xs, Ys, Zs, C).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 3, C, Cout).astype(np.float32))
    bias = jnp.asarray(rs.randn(Cout).astype(np.float32))

    up = upsample2x_trilinear(x5)
    want = _reference(up, kernel, bias, 0.2)

    # x/y upsample on the folded small-z tensor, z fused into the kernel
    xy = jax.image.resize(
        x5.reshape(B, Xs, Ys, Zs * C), (B, 2 * Xs, 2 * Ys, Zs * C),
        method="linear")
    f = _pick_f_up(Zs, C, Cout) or 2 * Zs
    got4 = upzconv3d_leaky_folded(xy, kernel, bias, C, f, 0.2, True)
    got = got4.reshape(B, 2 * Xs, 2 * Ys, 2 * Zs, Cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_upsample_conv_grads():
    from muvo_tpu.models.layers import upsample2x_trilinear
    from muvo_tpu.ops.pallas_zconv import (
        _pick_f_up,
        upzconv3d_leaky_folded,
    )

    rs = np.random.RandomState(5)
    B, Xs, Ys, Zs, C, Cout = 1, 4, 4, 16, 8, 4
    x5 = rs.randn(B, Xs, Ys, Zs, C).astype(np.float32)
    kernel = jnp.asarray(rs.randn(3, 3, 3, C, Cout).astype(np.float32))
    bias = jnp.asarray(rs.randn(Cout).astype(np.float32))
    xy = jnp.asarray(  # fixed x/y-upsampled input; grads flow through z-up
        np.asarray(jax.image.resize(
            jnp.asarray(x5).reshape(B, Xs, Ys, Zs * C),
            (B, 2 * Xs, 2 * Ys, Zs * C), method="linear")))
    f = _pick_f_up(Zs, C, Cout) or 2 * Zs

    def up_z_ref(x4):
        x5v = x4.reshape(B, 2 * Xs, 2 * Ys, Zs, C)
        from muvo_tpu.models.layers import _upsample2x_linear_axis
        return _upsample2x_linear_axis(x5v, 3)

    def loss_fused(x4, k, b):
        return jnp.sum(jnp.sin(
            upzconv3d_leaky_folded(x4, k, b, C, f, 0.2, True)))

    def loss_ref(x4, k, b):
        return jnp.sum(jnp.sin(_reference(up_z_ref(x4), k, b, 0.2)))

    gp = jax.grad(loss_fused, argnums=(0, 1, 2))(xy, kernel, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xy, kernel, bias)
    gr = (gr[0].reshape(gp[0].shape), gr[1], gr[2])
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)
