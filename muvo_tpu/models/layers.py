"""Building-block layers (NHWC, flax.linen).

Torch-compatible semantics where it matters for weight conversion:
``ConvTranspose2dTorch`` reproduces torch's ConvTranspose2d output geometry
(output = (in-1)*stride - 2*padding + kernel + output_padding), and
``BasicBlock`` mirrors the timm resnet block used throughout the reference
(reference: muvo/layers/layers.py:9-66).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional activation."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence = ((1, 1), (1, 1))
    use_bias: bool = False
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel_size, self.strides,
                    padding=self.padding, use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """timm-style resnet BasicBlock; optional 1x1-stride-2 downsample path."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if self.downsample:
            # reference BasicBlock hard-codes stride 2 in its downsample conv
            # (muvo/layers/layers.py:36-44)
            shortcut = nn.Conv(self.planes, (1, 1), (2, 2), padding="VALID",
                               use_bias=False, name="ds_conv")(shortcut)
            shortcut = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="ds_bn")(shortcut)
        return nn.relu(y + shortcut)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with torch's exact output geometry.

    output = (in - 1) * stride - 2 * padding + kernel + output_padding
    Implemented via lax.conv_transpose with padding
    (k - 1 - p, k - 1 - p + output_padding) on each spatial dim.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        oph, opw = self.output_padding
        pad = ((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw))
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, x.shape[-1], self.features),
        )
        y = jax.lax.conv_transpose(
            x, kernel, strides=self.strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class SubPixelConvTranspose2d(nn.Module):
    """ConvTranspose2d(kernel 6, stride 2, padding 2) lowered as four
    parity-packed stride-1 3x3 convs (sub-pixel / depth-to-space form).

    Math is exactly ConvTranspose2dTorch's (tested): with lhs dilation the
    transpose conv reads kernel tap t = 2(i - m) + 3 - r for output parity
    r, so each parity sees the 3-tap subsampled kernel K[5-r::-2]. Returns
    the PACKED (B, H, W, 4*features) tensor — parity group pi = ry*2 + rx in
    the channel dim — so the big elementwise ops that follow (elu + its
    backward mask) run with full 128-lane channels instead of the 2x-padded
    C=64 layout of the unpacked (B, 2H, 2W, 64) tensor. Use pixel_shuffle2x
    to unpack. Parameter name/shape identical to ConvTranspose2dTorch, so
    weight conversion and checkpoints are unchanged.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (6, 6, c_in, self.features),
        )
        # Parity (ry, rx) output rows are a SAME 3x3 correlation of the input
        # with the subsampled taps kernel[1-ry::2, 1-rx::2] (verified
        # numerically against lax.conv_transpose in tests).
        subs = [
            kernel[1 - ry::2, 1 - rx::2]  # (3, 3, c_in, F)
            for ry in (0, 1) for rx in (0, 1)
        ]
        w3 = jnp.concatenate(subs, axis=-1)  # (3, 3, c_in, 4F)
        y = jax.lax.conv_general_dilated(
            x, w3.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(bias.astype(x.dtype), (4,))
        return y


def pixel_shuffle2x(packed, features: int):
    """(B, H, W, 4F) parity-packed -> (B, 2H, 2W, F)."""
    b, h, w, _ = packed.shape
    y = packed.reshape(b, h, w, 2, 2, features)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, H, ry, W, rx, F)
    return y.reshape(b, 2 * h, 2 * w, features)


def max_pool_torch(x, window: int, stride: Optional[int] = None, padding: int = 0):
    """torch-style max_pool2d on NHWC (floor division output size)."""
    stride = stride or window
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), pads,
    )


def avg_pool_torch(x, window: int, stride: Optional[int] = None):
    stride = stride or window
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )
    return summed / (window * window)


def adaptive_avg_pool_1x1(x):
    """Global average pool (NHWC or N...C) -> (N, C)."""
    axes = tuple(range(1, x.ndim - 1))
    return x.mean(axis=axes)


def resize_bilinear(x, size: Tuple[int, int]):
    """Bilinear resize of NHWC (matches torch align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="linear")


def upsample2x_bilinear(x):
    # jax.image.resize('linear') == torch F.interpolate(align_corners=False)
    # (tests/test_nn_parity.py). A hand-written shifted-sum + interleave
    # formulation was measured SLOWER on TPU (26.6 vs 33.4 frames/s/chip on
    # the flagship step): the odd/even interleave along non-minor axes
    # becomes strided copies, while XLA's resize lowering stays fused.
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


def upsample2x_trilinear(x):
    n, d, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * d, 2 * h, 2 * w, c), method="linear")


def _upsample2x_linear_axis(x, axis: int):
    """2x linear upsample along one axis, half-pixel centers (torch
    align_corners=False): out[2i] = .25 x[i-1] + .75 x[i],
    out[2i+1] = .75 x[i] + .25 x[i+1], edges clamped. Bit-matches
    jax.image.resize / torch F.interpolate."""
    n = x.shape[axis]

    def sl(a, b):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    xm = jnp.concatenate([x[sl(0, 1)], x[sl(0, n - 1)]], axis)
    xp = jnp.concatenate([x[sl(1, n)], x[sl(n - 1, n)]], axis)
    even = 0.25 * xm + 0.75 * x
    odd = 0.75 * x + 0.25 * xp
    out = jnp.stack([even, odd], axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


def _linear_up_matrix(n: int) -> jnp.ndarray:
    """(2n, n) half-pixel 2x linear interpolation matrix (edges clamped);
    matches jax.image.resize('linear') / torch align_corners=False."""
    rows = []
    for u in range(2 * n):
        w = [0.0] * n
        k = u // 2
        if u % 2 == 0:
            w[max(k - 1, 0)] += 0.25
            w[k] += 0.75
        else:
            w[k] += 0.75
            w[min(k + 1, n - 1)] += 0.25
        rows.append(w)
    import numpy as np

    return jnp.asarray(np.asarray(rows, np.float32))


def upsample2x_xy_folded(x4):
    """2x bilinear x/y upsample of a z-folded (B, X, Y, L) tensor, lanes
    untouched — pairs with the fused z-upsample conv kernel
    (ops/pallas_zconv.upzconv3d_leaky_folded)."""
    B, X, Y, L = x4.shape
    return jax.image.resize(x4, (B, 2 * X, 2 * Y, L), method="linear")


def upsample2x_trilinear_folded(x4, Z: int, C: int):
    """Trilinear 2x upsample on a z-folded (B, X, Y, Z*C) tensor ->
    (B, 2X, 2Y, 2Z*C), never leaving the folded row-major domain: the z
    interpolation is one MXU matmul with the (Z*C, 2Z*C) block-interp
    matrix, x/y are sublane/outer interleaves with the wide lane dim
    intact. 5-D resize here costs 5x-padded layout copies next to the
    Pallas conv boundary (measured 9 GB on the flagship step)."""
    B, X, Y, ZC = x4.shape
    U = _linear_up_matrix(Z)  # (2Z, Z)
    # W[(s, c), (u, c)] = U[u, s]
    W = (U.T[:, None, :, None]
         * jnp.eye(C, dtype=jnp.float32)[None, :, None, :])
    W = W.reshape(ZC, 2 * ZC).astype(x4.dtype)
    # z-interp on the lanes. Keep the rank-4 dot: flattening to a 2-D GEMM
    # (reshape(-1, ZC) @ W) was tried in r5 and REGRESSED the flagship step
    # (+8 ms/step voxel_decoder fwd) — the reshape boundary blocks fusion
    # with the surrounding elementwise ops, costing more than the
    # batch-in-sublanes emitter inefficiency at these shapes.
    x4 = x4 @ W
    # x/y via XLA's resize on the folded 4-D (lanes untouched) — its
    # lowering beats hand-written interleaves on TPU
    return jax.image.resize(x4, (B, 2 * X, 2 * Y, 2 * ZC), method="linear")


def strided_downsample(x, factors):
    """Strided-slice downsample over the trailing ``len(factors)`` axes.

    Exact torch 'nearest' semantics for integer factors (index
    floor(i*f) = i*f). Always lower through lax.slice: the jnp
    x[..., ::f, ::f, :] multi-axis strided-indexing form lowers to a full
    stablehlo.gather over every output element (measured ~2.5-6 ms/step on
    the flagship label pyramids) while a strided slice is a plain
    vectorised copy."""
    strides = [1] * x.ndim
    strides[x.ndim - len(factors):] = list(factors)
    return jax.lax.slice(x, [0] * x.ndim, x.shape, strides)


def downsample_nearest(x, factor: int):
    """Exact torch 'nearest' downsample for integer factors (NHWC or NSHWC)."""
    return strided_downsample(x, (factor, factor, 1))


def leaky_relu_torch(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


class MLP(nn.Module):
    """Dense stack with activation after every layer except optionally last."""

    features: Sequence[int]
    act: Callable = nn.relu
    final_act: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.final_act:
                x = self.act(x)
        return x


class RestrictionActivation(nn.Module):
    """tanh squashing into [min_value, max_value]."""

    min_value: float = 0.0
    max_value: float = 1.0

    def __call__(self, x):
        scale = (self.max_value - self.min_value) / 2
        return scale * (jnp.tanh(x) + 1) + self.min_value
