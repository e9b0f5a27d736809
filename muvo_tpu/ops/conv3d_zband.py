"""MXU-efficient 3-D convolution for small channel counts.

A direct conv3d with 8-16 channels wastes the 128-lane MXU (utilisation
< 12%) and dominated the voxel decoder's step time. Here the depth axis is
folded into channels: a (3,3,3,C,C') kernel becomes a (3,3,Z*C,Z*C') kernel
that is block-banded over Z (zero outside |dz| <= 1), and the op runs as a
dense 3x3 conv2d with a 512-wide contraction — full MXU tiles for the
flagship voxel decoder (Z*C = 64*8 .. 32*16). The banded weight is built on
the fly from the standard conv3d parameter, so checkpoints/conversion are
unchanged.

Worth it when Z * C is near the 128 lane width but C alone is not; for large
C a plain conv3d wins (the extra z-band FLOPs scale with Z).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3d_zband(x, kernel, bias=None):
    """x: (B, X, Y, Z, C); kernel: (3, 3, 3, C, Cout) -> (B, X, Y, Z, Cout).

    Equivalent to lax 3-D 'SAME' convolution with stride 1.
    """
    b, X, Y, Z, C = x.shape
    kd, kh, kw, _, Cout = kernel.shape
    assert kd == kh == kw == 3, "z-band path expects 3x3x3 kernels"

    dtype = x.dtype
    # W[(h, w, z*C), (y*Cout)] = kernel[h, w, dz, c, c'] when y = z + dz - 1
    bands = []
    for dz in range(3):
        offset = 1 - dz  # eye[z, y] = 1 iff y = z + offset
        eye = jnp.eye(Z, Z, k=offset, dtype=dtype)
        # (Z, Z) x (3, 3, C, Cout) -> (3, 3, Z, C, Z, Cout)
        bands.append(jnp.einsum("zy,hwcd->hwzcyd", eye,
                                kernel[:, :, dz].astype(dtype)))
    W = (bands[0] + bands[1] + bands[2]).reshape(3, 3, Z * C, Z * Cout)

    y = jax.lax.conv_general_dilated(
        x.reshape(b, X, Y, Z * C), W, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(b, X, Y, Z, Cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def conv3d_zblock(x, kernel, bias=None, block: int = 16):
    """Blocked z-fold conv3d: like conv3d_zband but folds only ``block``
    z-slices (+1 halo each side) per matmul, bounding the banded-FLOP
    overhead at (block+2)*9/27 ≈ block/3 /(block) ... ~6x for block=16 while
    filling the 128 output lanes (block * Cout).

    x: (B, X, Y, Z, C); kernel: (3, 3, 3, C, Cout). Z % block == 0.
    """
    b, X, Y, Z, C = x.shape
    _, _, _, _, Cout = kernel.shape
    f = block
    assert Z % f == 0, f"Z={Z} not divisible by block={f}"
    zb = Z // f
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    # overlapping blocks laid out group-major in channels: (B,X,Y,zb,(f+2),C).
    # zb stays in the channel axis via a grouped conv (no batch folding — a
    # zb-in-batch layout made XLA pick a minor-batch layout with >10x padding).
    blocks = jnp.stack(
        [xp[:, :, :, i * f: i * f + f + 2, :] for i in range(zb)], axis=3
    ).reshape(b, X, Y, zb * (f + 2) * C)

    # W[h, w, (i, c), (j, c')] = kernel[h, w, i - j, c, c'] for i-j in {0,1,2}
    W = jnp.zeros((3, 3, f + 2, C, f, Cout), dtype)
    for dz in range(3):
        idx_i = jnp.arange(f) + dz
        # paired advanced indices (i = j + dz, j) broadcast to the front
        W = W.at[:, :, idx_i, :, jnp.arange(f), :].add(
            kernel[:, :, dz].astype(dtype)[None]
        )
    W = W.reshape(3, 3, (f + 2) * C, f * Cout)
    # every z-block shares the kernel: tile along the grouped output axis
    Wg = jnp.tile(W, (1, 1, 1, zb))

    y = jax.lax.conv_general_dilated(
        blocks, Wg, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=zb,
    )
    y = y.reshape(b, X, Y, Z, Cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class Conv3dZBand(nn.Module):
    """Drop-in 3x3x3 'SAME' conv3d with z-folded MXU lowering.

    Small Z folds entirely (z-band); large Z uses overlapping blocks sized so
    the output width fills the 128 MXU lanes.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        z = x.shape[-2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, c_in, self.features)
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if z <= 18:  # full-band FLOP overhead (z/3) still cheap
            return conv3d_zband(x, kernel, bias)
        block = max(1, 128 // self.features)
        while z % block != 0:
            block //= 2
        if block <= 2:
            return conv3d_zband(x, kernel, bias)
        return conv3d_zblock(x, kernel, bias, block=block)
