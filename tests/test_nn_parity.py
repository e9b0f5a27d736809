"""Numerical parity of core blocks vs torch's own nn modules (weights copied).

These validate both the architecture translation (NCHW->NHWC, gate orders,
padding conventions) and the torch->jax weight converter conventions.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from muvo_tpu.models.rssm import GRUCell, RepresentationModel
from muvo_tpu.models.transformer import TransformerEncoderLayer
from muvo_tpu.models.layers import ConvTranspose2dTorch, max_pool_torch
from muvo_tpu.models.common import position_embedding_sine

torch.manual_seed(0)
RTOL, ATOL = 2e-4, 2e-4


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_gru_cell_matches_torch():
    d_in, d_h, b = 12, 16, 3
    tcell = torch.nn.GRUCell(d_in, d_h)
    x = torch.randn(b, d_in)
    h = torch.randn(b, d_h)
    expected = tcell(x, h).detach().numpy()

    cell = GRUCell(d_h)
    params = cell.init(jax.random.PRNGKey(0), t2j(x), t2j(h))
    # torch weight_ih: (3h, in) rows ordered (r, z, n)
    params = {
        "params": {
            "ih": {"kernel": t2j(tcell.weight_ih).T, "bias": t2j(tcell.bias_ih)},
            "hh": {"kernel": t2j(tcell.weight_hh).T, "bias": t2j(tcell.bias_hh)},
        }
    }
    out = cell.apply(params, t2j(x), t2j(h))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=RTOL, atol=ATOL)


def test_transformer_layer_matches_torch():
    d, heads, b, n = 32, 4, 2, 10
    tl = torch.nn.TransformerEncoderLayer(d, heads, dim_feedforward=64,
                                          dropout=0.0, batch_first=True)
    tl.eval()
    x = torch.randn(b, n, d)
    with torch.no_grad():
        expected = tl(x).numpy()

    layer = TransformerEncoderLayer(d, heads, dim_feedforward=64, dropout=0.0)
    params = {
        "params": {
            "in_proj": {
                "kernel": t2j(tl.self_attn.in_proj_weight).T,
                "bias": t2j(tl.self_attn.in_proj_bias),
            },
            "out_proj": {
                "kernel": t2j(tl.self_attn.out_proj.weight).T,
                "bias": t2j(tl.self_attn.out_proj.bias),
            },
            "linear1": {"kernel": t2j(tl.linear1.weight).T, "bias": t2j(tl.linear1.bias)},
            "linear2": {"kernel": t2j(tl.linear2.weight).T, "bias": t2j(tl.linear2.bias)},
            "norm1": {"scale": t2j(tl.norm1.weight), "bias": t2j(tl.norm1.bias)},
            "norm2": {"scale": t2j(tl.norm2.weight), "bias": t2j(tl.norm2.bias)},
        }
    }
    out = layer.apply(params, t2j(x), train=False)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "k,s,p,op,size",
    [
        ((5, 13), (1, 1), (0, 0), (0, 0), (1, 1)),
        ((5, 5), (2, 2), (2, 2), (1, 1), (5, 13)),
        ((6, 6), (2, 2), (2, 2), (0, 0), (10, 26)),
    ],
)
def test_conv_transpose_matches_torch(k, s, p, op, size):
    cin, cout, b = 3, 4, 2
    tconv = torch.nn.ConvTranspose2d(cin, cout, k, s, p, output_padding=op)
    x = torch.randn(b, cin, *size)
    with torch.no_grad():
        expected = tconv(x).numpy()

    conv = ConvTranspose2dTorch(cout, k, s, p, op)
    x_j = t2j(x.permute(0, 2, 3, 1))
    params = conv.init(jax.random.PRNGKey(0), x_j)
    # torch kernel layout (in, out, kh, kw); lax.conv_transpose flips spatial
    # dims relative to torch, so reverse them.
    w = tconv.weight.detach().numpy()  # (in, out, kh, kw)
    w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()  # (kh, kw, in, out)
    params = {"params": {"kernel": jnp.asarray(w), "bias": t2j(tconv.bias)}}
    out = conv.apply(params, x_j)
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    assert out_nchw.shape == expected.shape
    np.testing.assert_allclose(out_nchw, expected, rtol=1e-3, atol=1e-4)


def test_subpixel_deconv_matches_conv_transpose():
    """The parity-packed sub-pixel lowering of ConvTranspose2d(6,2,2) is
    bit-for-math identical to ConvTranspose2dTorch with the same params."""
    from muvo_tpu.models.layers import (SubPixelConvTranspose2d,
                                        pixel_shuffle2x)

    cin, cout, b, h, w = 6, 5, 2, 9, 11
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)

    ref = ConvTranspose2dTorch(cout, (6, 6), (2, 2), (2, 2))
    params = ref.init(jax.random.PRNGKey(1), x)
    expected = np.asarray(ref.apply(params, x))

    sub = SubPixelConvTranspose2d(cout)
    packed = sub.apply(params, x)
    assert packed.shape == (b, h, w, 4 * cout)
    out = np.asarray(pixel_shuffle2x(packed, cout))
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_conv_decoder_subpixel_exact(monkeypatch):
    """The packed sub-pixel ConvDecoder (deconv + elu + head all packed)
    produces identical outputs to the plain ConvTranspose path with the
    same params."""
    from muvo_tpu.models.stylegan import ConvDecoder

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(2, 24), jnp.float32)
    dec = ConvDecoder(latent_n_channels=24, out_channels=3,
                      constant_size=(2, 3), head="rgb", base_channels=32)

    monkeypatch.setenv("MUVO_SUBPIXEL_DECONV", "off")
    params = dec.init(jax.random.PRNGKey(0), w)
    ref = dec.apply(params, w)

    monkeypatch.setenv("MUVO_SUBPIXEL_DECONV", "auto")
    out = dec.apply(params, w)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_max_pool_matches_torch():
    x = torch.randn(2, 3, 11, 17)
    for window, stride, pad in [(2, 2, 0), (3, 2, 1), (4, 4, 0)]:
        expected = torch.nn.functional.max_pool2d(x, window, stride, pad).numpy()
        out = max_pool_torch(t2j(x.permute(0, 2, 3, 1)), window, stride, pad)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), expected, rtol=1e-6, atol=1e-6
        )


def test_position_embedding_matches_reference_formula():
    """Cross-check against a literal torch transcription of the sine embed."""
    h, w, feats = 6, 8, 16
    # independent torch implementation (formula from the InterFuser paper)
    not_mask = torch.ones((1, h, w))
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * np.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    expected = torch.cat((pos_y, pos_x), dim=3)[0].numpy()  # (h, w, 2*feats)

    out = position_embedding_sine(h, w, num_pos_feats=feats, normalize=True)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_representation_model_sigma_floor():
    m = RepresentationModel(latent_dim=8)
    x = jnp.ones((2, 16))
    params = m.init(jax.random.PRNGKey(0), x)
    mu, sigma = m.apply(params, x)
    assert mu.shape == (2, 8) and sigma.shape == (2, 8)
    assert (np.asarray(sigma) > 0.1).all() and (np.asarray(sigma) < 2.1).all()


def test_upsample2x_linear_matches_torch():
    """upsample2x_{bi,tri}linear must bit-match torch F.interpolate
    (align_corners=False), the reference's upsample (common.py:156, 170)."""
    import torch
    import torch.nn.functional as F

    from muvo_tpu.models.layers import upsample2x_bilinear, upsample2x_trilinear

    rs = np.random.RandomState(3)
    x3 = rs.randn(2, 5, 7, 6, 3).astype(np.float32)
    got = np.asarray(upsample2x_trilinear(jnp.asarray(x3)))
    t = torch.from_numpy(x3.copy()).permute(0, 4, 1, 2, 3)
    ref = F.interpolate(t, scale_factor=2.0, mode="trilinear",
                        align_corners=False).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)

    x2 = rs.randn(2, 9, 11, 4).astype(np.float32)
    got2 = np.asarray(upsample2x_bilinear(jnp.asarray(x2)))
    t2 = torch.from_numpy(x2.copy()).permute(0, 3, 1, 2)
    ref2 = F.interpolate(t2, scale_factor=2.0, mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got2, ref2, atol=1e-6)
