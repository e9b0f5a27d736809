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


def conv3d_zblock_halofree(x, kernel, bias=None, block: int = 16):
    """z-blocked conv3d without overlapped-input materialisation.

    The main grouped conv uses non-overlapping z-blocks (banded weights
    within each block); the two cross-block taps (first/last z slice of each
    block) are added by a small grouped correction conv over the boundary
    slices. Saves the (f+2)/f input duplication and its layout copies that
    dominated the overlapped formulation.
    """
    b, X, Y, Z, C = x.shape
    _, _, _, _, Cout = kernel.shape
    f = block
    assert Z % f == 0
    zb = Z // f
    dtype = x.dtype

    # ---- main: banded weights within each z-block --------------------
    W = jnp.zeros((3, 3, f, C, f, Cout), dtype)
    for dz in range(3):
        j0 = max(0, 1 - dz)          # first valid output z in the block
        j1 = min(f, f + 1 - dz)      # one past the last valid output z
        idx_j = jnp.arange(j0, j1)
        idx_i = idx_j + dz - 1       # input z within the block
        W = W.at[:, :, idx_i, :, idx_j, :].add(
            kernel[:, :, dz].astype(dtype)[None]
        )
    Wg = jnp.tile(W.reshape(3, 3, f * C, f * Cout), (1, 1, 1, zb))
    xb = x.reshape(b, X, Y, zb * f * C)
    y = jax.lax.conv_general_dilated(
        xb, Wg, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=zb,
    ).reshape(b, X, Y, zb, f, Cout)

    # ---- boundary corrections ----------------------------------------
    # out z=0 of block j also needs input z=f-1 of block j-1 (dz index 0);
    # out z=f-1 of block j also needs input z=0 of block j+1 (dz index 2).
    x5 = x.reshape(b, X, Y, zb, f, C)
    prev_last = jnp.concatenate(
        [jnp.zeros_like(x5[:, :, :, :1, 0, :]), x5[:, :, :, :-1, f - 1, :]],
        axis=3,
    )  # (b, X, Y, zb, C): last slice of the previous block
    next_first = jnp.concatenate(
        [x5[:, :, :, 1:, 0, :], jnp.zeros_like(x5[:, :, :, :1, 0, :])],
        axis=3,
    )  # first slice of the next block
    corr_in = jnp.concatenate([prev_last, next_first], axis=-1)  # (...,zb,2C)
    Wc = jnp.concatenate(
        [
            # prev_last -> out z=0 uses kernel dz=0; contributes to out idx 0
            jnp.concatenate([kernel[:, :, 0].astype(dtype),
                             jnp.zeros((3, 3, C, Cout), dtype)], axis=-1),
            # next_first -> out z=f-1 uses kernel dz=2; out idx 1
            jnp.concatenate([jnp.zeros((3, 3, C, Cout), dtype),
                             kernel[:, :, 2].astype(dtype)], axis=-1),
        ],
        axis=2,
    )  # (3, 3, 2C, 2Cout)
    corr = jax.lax.conv_general_dilated(
        corr_in.reshape(b, X, Y, zb * 2 * C), jnp.tile(Wc, (1, 1, 1, zb)),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=zb,
    ).reshape(b, X, Y, zb, 2, Cout)

    y = y.at[:, :, :, :, 0, :].add(corr[:, :, :, :, 0, :])
    y = y.at[:, :, :, :, f - 1, :].add(corr[:, :, :, :, 1, :])
    y = y.reshape(b, X, Y, Z, Cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def conv3d_zblock_ext(x, kernel, bias=None, block: int = 16):
    """z-blocked conv3d with boundary taps folded into the main grouped conv.

    Per-block input channels are [f z-slices | prev-block last slice |
    next-block first slice] = (f+2)*C, built from cheap slice concats (no
    overlapped-window stacking, no scatter adds). Exactly one grouped conv.
    """
    b, X, Y, Z, C = x.shape
    _, _, _, _, Cout = kernel.shape
    f = block
    assert Z % f == 0
    zb = Z // f
    dtype = x.dtype

    x5 = x.reshape(b, X, Y, zb, f * C)
    x6 = x.reshape(b, X, Y, zb, f, C)
    prev_last = jnp.concatenate(
        [jnp.zeros_like(x6[:, :, :, :1, 0, :]), x6[:, :, :, :-1, f - 1, :]],
        axis=3,
    )
    next_first = jnp.concatenate(
        [x6[:, :, :, 1:, 0, :], jnp.zeros_like(x6[:, :, :, :1, 0, :])],
        axis=3,
    )
    xb = jnp.concatenate([x5, prev_last, next_first], axis=-1)
    xb = xb.reshape(b, X, Y, zb * (f + 2) * C)

    # in-block band
    W = jnp.zeros((3, 3, f + 2, C, f, Cout), dtype)
    for dz in range(3):
        j0 = max(0, 1 - dz)
        j1 = min(f, f + 1 - dz)
        idx_j = jnp.arange(j0, j1)
        idx_i = idx_j + dz - 1
        W = W.at[:, :, idx_i, :, idx_j, :].add(
            kernel[:, :, dz].astype(dtype)[None]
        )
    # boundary rows: prev_last (channel block f) -> out z=0 with dz=0;
    # next_first (channel block f+1) -> out z=f-1 with dz=2
    W = W.at[:, :, f, :, 0, :].add(kernel[:, :, 0].astype(dtype))
    W = W.at[:, :, f + 1, :, f - 1, :].add(kernel[:, :, 2].astype(dtype))
    Wg = jnp.tile(W.reshape(3, 3, (f + 2) * C, f * Cout), (1, 1, 1, zb))

    y = jax.lax.conv_general_dilated(
        xb, Wg, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=zb,
    ).reshape(b, X, Y, Z, Cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def pallas_voxel_path(x_shape, out_channels: int) -> bool:
    """True when a Conv3dZBand on this input will take the fused Pallas
    path (TPU, auto mode, shapes alignable) — callers use it to keep the
    surrounding ops in the folded row-major domain. MUVO_CONV3D=pallas
    forces the path regardless of platform (interpret mode off-TPU, for
    tests)."""
    import os

    from muvo_tpu.ops.pallas_zconv import pallas_zconv_available

    mode = os.environ.get("MUVO_CONV3D", "auto")
    ok = pallas_zconv_available(x_shape[-2], x_shape[-1], out_channels,
                                x_shape[1])
    if mode == "pallas":
        return ok
    return mode == "auto" and _on_tpu() and ok


class Conv3dZBand(nn.Module):
    """Drop-in 3x3x3 'SAME' conv3d with z-folded MXU lowering.

    Small Z folds entirely (z-band); large Z uses a Pallas kernel that does
    the blocked banded matmul straight from haloed VMEM tiles (on TPU;
    ops/pallas_zconv.py — no overlapped-block materialisation, no unfold
    transpose, bias + LeakyReLU fused) with the XLA overlapping-block conv
    as the portable fallback.

    ``fuse_leaky``: apply LeakyReLU(slope) inside the kernel; the caller
    must then skip its own activation. Only honoured on the Pallas path —
    when None or on fallback paths the caller's activation runs as usual,
    so set it and branch on ``fused_activation``.
    """

    features: int
    use_bias: bool = True
    fuse_leaky: float = None

    @property
    def _mode(self) -> str:
        import os

        return os.environ.get("MUVO_CONV3D", "auto")

    def fused_activation(self, x_shape) -> bool:
        """True when __call__ on this input applies fuse_leaky itself."""
        return (self.fuse_leaky is not None
                and pallas_voxel_path(x_shape, self.features))

    @nn.compact
    def __call__(self, x, folded_zc=None, z_upsample: bool = False,
                 pre_padded: bool = False, padded_out: bool = False,
                 logical_y: int = None):
        if folded_zc is not None and z_upsample:
            # fused trilinear z-upsample + conv: x is x/y-upsampled with
            # SMALL z folded in the lanes; folded_zc = (Zs, C)
            from muvo_tpu.ops.pallas_zconv import (
                _pick_f_up, upzconv3d_leaky_folded,
            )

            Zs, C = folded_zc
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (3, 3, 3, C, self.features),
            )
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)
            return upzconv3d_leaky_folded(
                x, kernel.astype(x.dtype), bias, C,
                _pick_f_up(Zs, C, self.features), self.fuse_leaky,
                not _on_tpu(), padded_out,
            )
        if folded_zc is not None:
            # z-folded io: x (B, X, Y, Z*C) -> (B, X, Y, Z*Cout); caller
            # guarantees pallas_voxel_path() held for these shapes.
            # pre_padded/padded_out thread the _pad_folded layout between
            # chained convs (see ops/pallas_zconv.py).
            from muvo_tpu.ops.pallas_zconv import (
                _pick_f, zconv3d_leaky_folded,
            )

            Z, C = folded_zc
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (3, 3, 3, C, self.features),
            )
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias else None)
            logical_yz = ((logical_y, Z) if (pre_padded or padded_out)
                          else None)
            return zconv3d_leaky_folded(
                x, kernel.astype(x.dtype), bias, C,
                _pick_f(Z, C, self.features), self.fuse_leaky,
                not _on_tpu(), pre_padded, padded_out, logical_yz,
            )
        c_in = x.shape[-1]
        z = x.shape[-2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, c_in, self.features)
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        # perf-experiment escape hatch (identical math; trace-time only)
        mode = self._mode
        if self.fused_activation(x.shape):
            from muvo_tpu.ops.pallas_zconv import _pick_f, zconv3d_leaky

            return zconv3d_leaky(x, kernel.astype(x.dtype),
                                 None if bias is None else bias,
                                 _pick_f(z, c_in, self.features),
                                 self.fuse_leaky, not _on_tpu())
        if pallas_voxel_path(x.shape, self.features) and z > 18:
            from muvo_tpu.ops.pallas_zconv import _pick_f, zconv3d_leaky

            return zconv3d_leaky(x, kernel.astype(x.dtype),
                                 None if bias is None else bias,
                                 _pick_f(z, c_in, self.features),
                                 None, not _on_tpu())
        if mode == "xla":
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1, 1),
                ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return y + bias.astype(x.dtype) if bias is not None else y
        if mode in ("ext", "halofree") and z > 18:
            block = max(1, 128 // self.features)
            while z % block != 0:
                block //= 2
            if block > 2:
                fn = (conv3d_zblock_ext if mode == "ext"
                      else conv3d_zblock_halofree)
                return fn(x, kernel, bias, block=block)
        if z <= 18:  # full-band FLOP overhead (z/3) still cheap
            return conv3d_zband(x, kernel, bias)
        block = max(1, 128 // self.features)
        while z % block != 0:
            block //= 2
        if block <= 2:
            return conv3d_zband(x, kernel, bias)
        return conv3d_zblock(x, kernel, bias, block=block)
