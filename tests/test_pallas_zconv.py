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
        # grads reach ~1e4 magnitude (normal(1.0) constant tensor); allow
        # fp32 accumulation-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-2)


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
