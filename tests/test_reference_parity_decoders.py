"""Decoder parity against the reference's OWN torch modules.

Imports `muvo.models.common` from /root/reference (pure torch once the
unused `timm` / `torch_scatter` imports are stubbed), instantiates the
reference BevDecoder / ConvDecoder / VoxelDecoder1 at small-but-real sizes,
converts their state_dicts with the shipped converter functions
(training/weight_convert.py), and asserts our flax decoders produce the
same outputs. This directly validates the z-folded voxel trunk (Pallas
z-band lowering + composed upsample + packed heads) and the sub-pixel
ConvDecoder lowering against the reference's actual code, not a
re-implementation. (reference: muvo/models/common.py:370-424, 498-546,
549-632)
"""

import numpy as np
import pytest
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muvo.models import common as ref_common  # noqa: E402

from muvo_tpu.models import stylegan  # noqa: E402
from muvo_tpu.training import weight_convert as WC  # noqa: E402

LATENT = 16
SEM = 3


def _state_np(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def _merge(template, converted):
    merged, missing = WC._merge_into(template, converted)
    assert not missing, f"unconverted leaves: {missing}"
    return merged


def _nchw_to_nhwc(t):
    a = t.detach().numpy()
    return np.moveaxis(a, 1, -1)


def _ncdhw_to_ndhwc(t):
    a = t.detach().numpy()  # torch (B, C, X, Y, Z)
    return np.moveaxis(a, 1, -1)  # (B, X, Y, Z, C)


@pytest.mark.slow
def test_bev_decoder_matches_reference():
    torch.manual_seed(0)
    ref = ref_common.BevDecoder(LATENT, SEM, constant_size=(1, 1),
                                head="bev").eval()
    state = _state_np(ref, "dec")
    params = {}
    const = state["dec.constant_tensor"]
    WC._set(params, ("constant_tensor",), np.moveaxis(const, 0, -1))
    WC._adain("dec.first_norm", ("first_norm",), state, params)
    WC._conv_instance_norm("dec.first_conv", ("first_conv",), state, params)
    for i in range(3):
        WC._decoder_block(f"dec.middle_conv.{i}", (f"middle_{i}",), state,
                          params)
    for i, name in ((1, "conv1"), (2, "conv2"), (3, "conv3")):
        WC._decoder_block(f"dec.conv{i}", (name,), state, params)
    for k in (4, 2, 1):
        WC._style_head(f"dec.head_{k}", (f"head_{k}",), "bev", state, params)

    w = np.random.RandomState(1).randn(2, LATENT).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(w))

    model = stylegan.BevDecoder(LATENT, SEM, constant_size=(1, 1))
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(w))
    merged = _merge(jax.device_get(template["params"]), params)
    out = jax.jit(model.apply)({"params": merged}, jnp.asarray(w))

    for key in ("bev_segmentation_1", "bev_segmentation_4",
                "bev_instance_offset_2", "bev_instance_center_1"):
        np.testing.assert_allclose(
            np.asarray(out[key]), _nchw_to_nhwc(ref_out[key]),
            rtol=1e-4, atol=2e-4, err_msg=key)


@pytest.mark.slow
def test_conv_decoder_matches_reference():
    torch.manual_seed(1)
    ref = ref_common.ConvDecoder(LATENT, 3, constant_size=(1, 2),
                                 mlp_layers=0, head="rgb").eval()
    state = _state_np(ref, "dec")
    params = {}
    WC._conv_decoder("dec", (), "rgb", state, params)

    w = np.random.RandomState(2).randn(2, LATENT).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(w))

    model = stylegan.ConvDecoder(LATENT, 3, constant_size=(1, 2))
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(w))
    merged = _merge(jax.device_get(template["params"]), params)
    out = jax.jit(model.apply)({"params": merged}, jnp.asarray(w))

    for k in (4, 2, 1):
        key = f"rgb_{k}"
        np.testing.assert_allclose(
            np.asarray(out[key]), _nchw_to_nhwc(ref_out[key]),
            rtol=1e-4, atol=2e-4, err_msg=key)


@pytest.mark.slow
def test_voxel_decoder_matches_reference():
    torch.manual_seed(2)
    feat = 16
    ref = ref_common.VoxelDecoder1(LATENT, SEM, feature_channels=feat,
                                   constant_size=(1, 1, 1)).eval()
    state = _state_np(ref, "dec")
    params = {}
    const = state["dec.constant_tensor"]
    WC._set(params, ("constant_tensor",), np.moveaxis(const, 0, -1))
    WC._adain("dec.first_norm", ("first_norm",), state, params)
    WC._conv_instance_norm("dec.first_conv", ("first_conv",), state, params)
    for i in range(3):
        WC._decoder_block(f"dec.middle_conv.{i}", (f"middle_{i}",), state,
                          params)
    for i, name in ((1, "conv1"), (2, "conv2"), (3, "conv3")):
        WC._decoder_block(f"dec.conv{i}", (name,), state, params)
    for k in (4, 2, 1):
        WC._style_head(f"dec.head_{k}", (f"head_{k}",), "voxel", state,
                       params)

    w = np.random.RandomState(3).randn(1, LATENT).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(w))

    model = stylegan.VoxelDecoder(LATENT, SEM, feature_channels=feat,
                                  constant_size=(1, 1, 1))
    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(w))
    merged = _merge(jax.device_get(template["params"]), params)
    out = jax.jit(model.apply)({"params": merged}, jnp.asarray(w))

    for k in (4, 2, 1):
        key = f"voxel_{k}"
        np.testing.assert_allclose(
            np.asarray(out[key]), _ncdhw_to_ndhwc(ref_out[key]),
            rtol=1e-4, atol=3e-4, err_msg=key)
