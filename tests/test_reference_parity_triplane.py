"""Tri-plane voxel decoder parity against the reference's OWN
VoxelDecoderScale / VoxelDecoder0 (the 2-D-branch voxel path).
(reference: muvo/models/common.py:427-496)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muvo.models import common as ref_common  # noqa: E402

from muvo_tpu.models.stylegan import (  # noqa: E402
    TriPlaneVoxelDecoder,
    VoxelDecoderScale,
)
from muvo_tpu.training import weight_convert as WC  # noqa: E402

rng = np.random.RandomState(41)


def _convert_scale(sd, prefix, params):
    for name in ("weight_xy", "weight_xz", "weight_yz"):
        params[name] = {
            "kernel": WC._conv(sd[f"{prefix}{name}_decoder.weight"]),
            "bias": sd[f"{prefix}{name}_decoder.bias"],
        }
    params["cls1"] = {"kernel": WC._conv(sd[f"{prefix}classifier.0.weight"]),
                      "bias": sd[f"{prefix}classifier.0.bias"]}
    params["cls2"] = {"kernel": WC._conv(sd[f"{prefix}classifier.2.weight"]),
                      "bias": sd[f"{prefix}classifier.2.bias"]}


def _planes(b, c, x, y, z):
    xy = rng.randn(b, x, y, c).astype(np.float32)
    xz = rng.randn(b, x, z, c).astype(np.float32)
    yz = rng.randn(b, y, z, c).astype(np.float32)
    to_t = lambda a: torch.from_numpy(np.moveaxis(a, -1, 1).copy())  # noqa: E731
    return (xy, xz, yz), (to_t(xy), to_t(xz), to_t(yz))


def test_voxel_decoder_scale_matches_reference():
    torch.manual_seed(6)
    cin, ncls, feat = 8, 3, 8  # reference requires cin == feature_channels
    # (its classifier conv consumes the fused planes directly)
    ref = ref_common.VoxelDecoderScale(cin, ncls,
                                       feature_channels=feat).eval()
    (xy, xz, yz), (xy_t, xz_t, yz_t) = _planes(2, cin, 5, 4, 3)
    with torch.no_grad():
        ref_out = ref((xy_t, xz_t, yz_t)).numpy()  # (B, ncls, X, Y, Z)

    ours = VoxelDecoderScale(ncls, feature_channels=feat)
    variables = ours.init(jax.random.PRNGKey(0),
                          (jnp.asarray(xy), jnp.asarray(xz), jnp.asarray(yz)))
    params = jax.device_get(variables["params"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    _convert_scale(sd, "", params)
    out = ours.apply({"params": params},
                     (jnp.asarray(xy), jnp.asarray(xz), jnp.asarray(yz)))
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(ref_out, 1, -1),
                               rtol=1e-4, atol=1e-4)


def test_triplane_decoder_matches_reference():
    torch.manual_seed(7)
    cin, ncls, feat = 8, 3, 8
    ref = ref_common.VoxelDecoder0(cin, ncls, feature_channels=feat).eval()

    shapes = {1: (6, 4, 4), 2: (3, 2, 2), 4: (2, 1, 1)}  # (X, Y, Z) per scale
    xy_np, xz_np, yz_np = {}, {}, {}
    xy_t, xz_t, yz_t = {}, {}, {}
    for s, (x, y, z) in shapes.items():
        (a, b_, c_), (at, bt, ct) = _planes(2, cin, x, y, z)
        xy_np[f"rgb_{s}"], xz_np[f"rgb_{s}"], yz_np[f"rgb_{s}"] = a, b_, c_
        xy_t[f"rgb_{s}"], xz_t[f"rgb_{s}"], yz_t[f"rgb_{s}"] = at, bt, ct
    with torch.no_grad():
        ref_out = ref(xy_t, xz_t, yz_t)

    ours = TriPlaneVoxelDecoder(ncls, feature_channels=feat)
    jxy = {k: jnp.asarray(v) for k, v in xy_np.items()}
    jxz = {k: jnp.asarray(v) for k, v in xz_np.items()}
    jyz = {k: jnp.asarray(v) for k, v in yz_np.items()}
    variables = ours.init(jax.random.PRNGKey(0), jxy, jxz, jyz)
    params = jax.device_get(variables["params"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for s in (1, 2, 4):
        _convert_scale(sd, f"decoder_{s}.", params[f"decoder_{s}"])
    out = ours.apply({"params": params}, jxy, jxz, jyz)
    for s in (1, 2, 4):
        np.testing.assert_allclose(
            np.asarray(out[f"voxel_{s}"]),
            np.moveaxis(ref_out[f"voxel_{s}"].numpy(), 1, -1),
            rtol=1e-4, atol=1e-4, err_msg=f"voxel_{s}")
