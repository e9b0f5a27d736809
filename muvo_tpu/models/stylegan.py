"""Latent-conditioned (StyleGAN-ish) decoders: BEV, image, and 3-D voxel.

Semantics match reference muvo/models/common.py:133-632: a learned constant
tensor is repeatedly convolved/upsampled with adaptive instance normalisation
driven by the latent "style" vector w, with multi-scale heads at downsample
factors 4/2/1. Output dict keys match the reference exactly
(``bev_segmentation_1``, ``rgb_2``, ``voxel_4``, ...).

Layout: NHWC for 2-D, NDHWC for 3-D (the reference's (C, X, Y, Z) becomes
(X, Y, Z, C)).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.models.layers import (
    ConvTranspose2dTorch,
    leaky_relu_torch,
    upsample2x_bilinear,
    upsample2x_trilinear,
)


class AdaptiveInstanceNorm(nn.Module):
    """Instance norm over spatial dims, then scale/bias from the style.

    ``folded_zc=(Z, C)`` computes the identical math on a z-folded 4-D
    tensor (B, X, Y, Z*C) — per-channel stats via a free bitcast view, the
    affine via z-tiled row vectors — so the big voxel-decoder activations
    never exist in a 5-D layout XLA would pad (see ops/pallas_zconv.py).
    """

    out_channels: int
    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x, w, folded_zc=None, padded_y: int = None):
        # Stats are single-pass (sum + sum-of-squares fused into one read;
        # var = E[x²] − E[x]², clamped at 0 against fp32 cancellation): the
        # two-pass (x − mean)² form cost an extra full read of the
        # 1.8 GB conv3-stage activations per AdaIN, fwd and bwd.
        if folded_zc is not None and padded_y is not None:
            # x in the _pad_folded layout (B, X+2, Yp, Zp*C) with a ZERO
            # halo (padded_y = logical Y). The zero halo contributes
            # nothing to sums, so the stats are exact over the padded
            # tensor; the affine applies under an interior mask so the
            # halo stays zero — the next pre_padded conv (and this op's
            # own input cotangent) need it.
            from muvo_tpu.ops.pallas_zconv import Y_FRONT

            Z, C = folded_zc
            b, Xp2, Yp, ZpC = x.shape
            X, Y, Zp = Xp2 - 2, padded_y, ZpC // C
            n = X * Y * Z
            mrow = (jnp.arange(Xp2) >= 1) & (jnp.arange(Xp2) <= X)
            mcol = ((jnp.arange(Yp) >= Y_FRONT)
                    & (jnp.arange(Yp) < Y_FRONT + Y))
            mlane = (jnp.arange(ZpC) >= C) & (jnp.arange(ZpC) < (Z + 1) * C)
            mask = (mrow[:, None, None] & mcol[None, :, None]
                    & mlane[None, None, :])
            # mask x BEFORE the stats: the value is unchanged (halo is
            # already zero) but the stats' cotangent paths (d sum/dx = 1
            # everywhere) must not reach the halo — the upstream conv's
            # padded_out vjp requires a zero-halo cotangent
            xm = jnp.where(mask, x, jnp.zeros((), x.dtype))
            x5 = xm.reshape(b, Xp2, Yp, Zp, C)  # free bitcast view
            s1 = jnp.sum(x5.astype(jnp.float32), axis=(1, 2, 3))   # (B, C)
            s2 = jnp.sum(jnp.square(x5.astype(jnp.float32)),
                         axis=(1, 2, 3))
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean ** 2, 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            mean4 = jnp.tile(mean, (1, Zp)).reshape(b, 1, 1, ZpC)
            inv4 = jnp.tile(inv, (1, Zp)).reshape(b, 1, 1, ZpC)
            norm = ((xm.astype(jnp.float32) - mean4) * inv4).astype(x.dtype)
            style = nn.Dense(2 * self.out_channels, name="latent_affine")(w)
            scale, bias = jnp.split(style, 2, axis=-1)
            scale4 = jnp.tile(scale, (1, Zp)).reshape(b, 1, 1, ZpC)
            bias4 = jnp.tile(bias, (1, Zp)).reshape(b, 1, 1, ZpC)
            return jnp.where(mask, scale4 * norm + bias4,
                             jnp.zeros((), x.dtype))
        if folded_zc is not None:
            Z, C = folded_zc
            b, X, Y, _ = x.shape
            n = X * Y * Z
            x5 = x.reshape(b, X, Y, Z, C)  # free bitcast view for the stats
            s1 = jnp.sum(x5.astype(jnp.float32), axis=(1, 2, 3))   # (B, C)
            s2 = jnp.sum(jnp.square(x5.astype(jnp.float32)),
                         axis=(1, 2, 3))
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean ** 2, 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            # identical op order to the unfolded path: fp32 normalise, cast,
            # then the style affine in the model dtype
            mean4 = jnp.tile(mean, (1, Z)).reshape(b, 1, 1, Z * C)
            inv4 = jnp.tile(inv, (1, Z)).reshape(b, 1, 1, Z * C)
            norm = ((x.astype(jnp.float32) - mean4) * inv4).astype(x.dtype)
            style = nn.Dense(2 * self.out_channels, name="latent_affine")(w)
            scale, bias = jnp.split(style, 2, axis=-1)
            scale4 = jnp.tile(scale, (1, Z)).reshape(b, 1, 1, Z * C)
            bias4 = jnp.tile(bias, (1, Z)).reshape(b, 1, 1, Z * C)
            return scale4 * norm + bias4

        spatial = tuple(range(1, x.ndim - 1))
        n = 1
        for d in spatial:
            n *= x.shape[d]
        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=spatial, keepdims=True)
        s2 = jnp.sum(jnp.square(x32), axis=spatial, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean ** 2, 0.0)
        x = ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)

        style = nn.Dense(2 * self.out_channels, name="latent_affine")(w)
        style = style.reshape(style.shape[:1] + (1,) * len(spatial) + (-1,))
        scale, bias = jnp.split(style, 2, axis=-1)
        return scale * x + bias


class ConvInstanceNorm(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, w, folded_zc=None, z_upsample: bool = False,
                 pre_padded: bool = False, padded_out: bool = False,
                 logical_y: int = None):
        if folded_zc is not None:
            # z-folded voxel path (TPU): Pallas conv with the LeakyReLU
            # fused, AdaIN on the folded view — no 5-D tensor exists.
            # z_upsample fuses the 2x trilinear z-interp into the conv
            # (folded_zc then gives the SMALL z; output z doubles).
            # pre_padded/padded_out keep the _pad_folded layout flowing
            # between chained convs (masked AdaIN preserves the zero halo).
            from muvo_tpu.ops.conv3d_zband import Conv3dZBand

            Z, C = folded_zc
            x = Conv3dZBand(self.out_channels, fuse_leaky=0.2,
                            name="conv")(x, folded_zc=(Z, C),
                                         z_upsample=z_upsample,
                                         pre_padded=pre_padded,
                                         padded_out=padded_out,
                                         logical_y=logical_y)
            z_out = 2 * Z if z_upsample else Z
            return AdaptiveInstanceNorm(self.out_channels, name="adain")(
                x, w, folded_zc=(z_out, self.out_channels),
                padded_y=(logical_y if padded_out else None))
        if x.ndim == 5 and x.shape[-1] <= 64:
            # small-channel conv3d: z-band lowering keeps the MXU busy
            from muvo_tpu.ops.conv3d_zband import Conv3dZBand

            x = Conv3dZBand(self.out_channels, name="conv")(x)
        else:
            kernel = (3,) * (x.ndim - 2)
            x = nn.Conv(self.out_channels, kernel, padding="SAME",
                        name="conv")(x)
        x = leaky_relu_torch(x, 0.2)
        return AdaptiveInstanceNorm(self.out_channels, name="adain")(x, w)


class DecoderBlock(nn.Module):
    """(optional 2x upsample) -> ConvInstanceNorm x2. Works for 2-D and 3-D."""

    out_channels: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, w, folded_zc=None):
        if folded_zc is not None:
            # z-folded voxel path: x is (B, X, Y, Z*C); returns
            # ((B, 2X, 2Y, 2Z*out), (2Z, out)) — see VoxelDecoder
            from muvo_tpu.models.layers import (
                upsample2x_trilinear_folded,
                upsample2x_xy_folded,
            )
            from muvo_tpu.ops.pallas_zconv import pallas_upzconv_available

            import os

            # conv1 emits its output already in the _pad_folded layout,
            # the masked AdaIN preserves the zero halo, and conv2 consumes
            # it pre_padded — no XLA pad pass (fwd, remat replay, or bwd)
            # touches the stage's biggest tensor. Measured SLOWER on the
            # flagship bench than the logical-layout chain (51.6 vs 52.3
            # f/s/chip: the pads it removes cost less than the masked
            # AdaIN + store-relayout overhead it adds), so OFF by default;
            # MUVO_PADDED_IO=on enables it (identical math, tested).
            use_p = os.environ.get("MUVO_PADDED_IO", "off") == "on"
            Z, C = folded_zc
            if self.upsample:
                if pallas_upzconv_available(Z, C, self.out_channels,
                                            2 * x.shape[1]):
                    # x/y via folded resize on the small-z tensor; the z
                    # interp composes into conv1's banded weight (halves
                    # its contraction and the resize traffic)
                    x = upsample2x_xy_folded(x)
                    Y = x.shape[2]
                    x = ConvInstanceNorm(self.out_channels, name="conv1")(
                        x, w, folded_zc=(Z, C), z_upsample=True,
                        padded_out=use_p, logical_y=Y)
                    Z = 2 * Z
                else:
                    x = upsample2x_trilinear_folded(x, Z, C)
                    Z = 2 * Z
                    Y = x.shape[2]
                    x = ConvInstanceNorm(self.out_channels, name="conv1")(
                        x, w, folded_zc=(Z, C),
                        padded_out=use_p, logical_y=Y)
            else:
                Y = x.shape[2]
                x = ConvInstanceNorm(self.out_channels, name="conv1")(
                    x, w, folded_zc=(Z, C),
                    padded_out=use_p, logical_y=Y)
            x = ConvInstanceNorm(self.out_channels, name="conv2")(
                x, w, folded_zc=(Z, self.out_channels),
                pre_padded=use_p, logical_y=Y)
            return x, (Z, self.out_channels)
        if self.upsample:
            x = upsample2x_bilinear(x) if x.ndim == 4 else upsample2x_trilinear(x)
        x = ConvInstanceNorm(self.out_channels, name="conv1")(x, w)
        return ConvInstanceNorm(self.out_channels, name="conv2")(x, w)


# ---------------------------------------------------------------------------
# Output heads (key names match reference common.py:249-367).
# ---------------------------------------------------------------------------
class SegmentationHead(nn.Module):
    n_classes: int
    downsample_factor: int

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        k = self.downsample_factor
        return {
            f"bev_segmentation_{k}": nn.Conv(self.n_classes, (1, 1), name="seg")(x),
            f"bev_instance_offset_{k}": nn.Conv(2, (1, 1), name="offset")(x),
            f"bev_instance_center_{k}": jax.nn.sigmoid(
                nn.Conv(1, (1, 1), name="center")(x)
            ),
        }


class _PointwiseConv(nn.Module):
    """1x1(x1) conv as an einsum over the channel axis.

    For 3-D tensors XLA's conv path chose a minor-batch layout with >10x
    padding on the gradient; the einsum form keeps channels minor. Parameter
    shape matches nn.Conv's 1x1(x1) kernel so weight conversion is unchanged.

    NOTE (r5, measured): flattening the input to (rows, C) for a native 2-D
    GEMM was tried and REGRESSED the flagship step (rgb_decoder +4 ms,
    voxel_decoder +8 ms, decode backward +9 ms per step) — the reshape
    boundaries block XLA's fusion of the surrounding AdaIN/elu elementwise
    work, and the extra HBM round-trips cost more than the rank-N
    batch-in-sublanes emitter inefficiency. Keep the rank-N dots here; the
    flatten only pays at LARGE transformer shapes (see transformer.py).
    """

    features: int
    spatial_rank: int

    def _matmul(self, x, w, bias):
        return x @ w + bias

    @nn.compact
    def __call__(self, x, folded_zc=None, parity_groups: int = 0):
        if parity_groups:
            # parity-packed input (B, H, W, g*C): same 1x1 weights applied
            # per group via a block-diagonal matmul (lanes stay full)
            g = parity_groups
            c_in = x.shape[-1] // g
            kshape = (1,) * self.spatial_rank + (c_in, self.features)
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                kshape)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            wk = kernel.reshape(c_in, self.features).astype(x.dtype)
            bd = (jnp.eye(g, dtype=x.dtype)[:, None, :, None]
                  * wk[None, :, None, :]).reshape(g * c_in,
                                                  g * self.features)
            return self._matmul(x, bd, jnp.tile(bias.astype(x.dtype), (g,)))
        if folded_zc is not None:
            # z-folded input: block-diagonal matmul over the lanes
            Z, C = folded_zc
            kshape = (1,) * self.spatial_rank + (C, self.features)
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                kshape)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            wk = kernel.reshape(C, self.features).astype(x.dtype)
            bd = (jnp.eye(Z, dtype=x.dtype)[:, None, :, None]
                  * wk[None, :, None, :]).reshape(Z * C, Z * self.features)
            bias4 = jnp.tile(bias.astype(x.dtype), (Z,))
            return self._matmul(x, bd, bias4)
        c_in = x.shape[-1]
        kshape = (1,) * self.spatial_rank + (c_in, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(c_in, self.features).astype(x.dtype)
        return self._matmul(x, w, bias.astype(x.dtype))


class _SingleConvHead(nn.Module):
    n_classes: int
    downsample_factor: int
    key_prefix: str = "rgb"

    @nn.compact
    def __call__(self, x, folded_zc=None,
                 packed_subpixel: int = 0) -> Dict[str, jnp.ndarray]:
        if packed_subpixel:
            # x is the parity-packed (B, H, W, 4*C) output of
            # SubPixelConvTranspose2d: apply the same 1x1 weights to each
            # parity group (block-diagonal matmul, lanes stay full) and
            # pixel-shuffle only the tiny (…, 4*n_classes) result —
            # shuffling the full feature tensor cost two ~4 ms layout
            # copies per step. Params identical to the unpacked head.
            from muvo_tpu.models.layers import pixel_shuffle2x

            y = _PointwiseConv(self.n_classes, 2, name="head")(
                x, parity_groups=4)
            out = pixel_shuffle2x(y, self.n_classes)
            return {f"{self.key_prefix}_{self.downsample_factor}": out}
        if folded_zc is not None:
            # pointwise conv on the z-folded tensor: one block-diagonal
            # matmul on the lanes, unfolding only the class output (the
            # model's external contract stays (…, Z, n_classes))
            Z, C = folded_zc
            b, X, Y, _ = x.shape
            out4 = _PointwiseConv(self.n_classes, 3, name="head")(
                x, folded_zc=(Z, C))
            out = out4.reshape(b, X, Y, Z, self.n_classes)
            return {f"{self.key_prefix}_{self.downsample_factor}": out}
        out = _PointwiseConv(self.n_classes, x.ndim - 2, name="head")(x)
        return {f"{self.key_prefix}_{self.downsample_factor}": out}


HEAD_KEY_PREFIX = {
    "rgb": "rgb",
    "bev": None,  # SegmentationHead
    "depth": "depth",
    "sem_image": "semantic_image",
    "lidar_re": "lidar_reconstruction",
    "lidar_seg": "lidar_segmentation",
    "voxel": "voxel",
}


def make_head(head: str, n_classes: int, downsample_factor: int, name: str):
    if head == "bev":
        return SegmentationHead(n_classes, downsample_factor, name=name)
    prefix = HEAD_KEY_PREFIX.get(head, "rgb")
    return _SingleConvHead(n_classes, downsample_factor, prefix, name=name)


# ---------------------------------------------------------------------------
class BevDecoder(nn.Module):
    """Constant 512x3x3 -> AdaIN conv stack -> 192x192 multi-scale heads.

    (reference: common.py:370-424)
    """

    latent_n_channels: int
    semantic_n_channels: int
    constant_size: Tuple[int, int] = (3, 3)
    head: str = "bev"
    base_channels: int = 512  # reference hard-codes 512 (common.py:373)

    @nn.compact
    def __call__(self, w) -> Dict[str, jnp.ndarray]:
        n = self.base_channels
        b = w.shape[0]
        const = self.param(
            "constant_tensor", nn.initializers.normal(1.0),
            (*self.constant_size, n),
        )
        x = jnp.broadcast_to(const[None], (b, *self.constant_size, n))

        x = AdaptiveInstanceNorm(n, name="first_norm")(x, w)
        x = ConvInstanceNorm(n, name="first_conv")(x, w)
        for i in range(3):
            x = DecoderBlock(n, upsample=True, name=f"middle_{i}")(x, w)

        x = DecoderBlock(n // 2, upsample=True, name="conv1")(x, w)
        out4 = make_head(self.head, self.semantic_n_channels, 4, "head_4")(x)
        x = DecoderBlock(n // 4, upsample=True, name="conv2")(x, w)
        out2 = make_head(self.head, self.semantic_n_channels, 2, "head_2")(x)
        x = DecoderBlock(n // 8, upsample=True, name="conv3")(x, w)
        out1 = make_head(self.head, self.semantic_n_channels, 1, "head_1")(x)
        return {**out4, **out2, **out1}


class ConvDecoder(nn.Module):
    """Dense -> transpose-conv pyramid -> multi-scale heads.

    constant_size (5,13) decodes to 320x832 (RGB crop); (1,16) to 64x1024
    (LiDAR range view). (reference: common.py:549-632)
    """

    latent_n_channels: int
    out_channels: int
    constant_size: Tuple[int, int] = (5, 13)
    head: str = "rgb"
    mlp_layers: int = 0
    base_channels: int = 512  # reference hard-codes 512 (common.py:553)

    @nn.compact
    def __call__(self, w) -> Dict[str, jnp.ndarray]:
        n = self.base_channels
        x = nn.Dense(n, name="linear")(w)
        if self.mlp_layers > 0:
            for i in range(self.mlp_layers):
                x = nn.LayerNorm(epsilon=1e-3, name=f"mlp_norm{i}")(x)
                x = nn.elu(x)
                if i < self.mlp_layers - 1:
                    x = nn.Dense(n, name=f"mlp_fc{i}")(x)
        x = x[:, None, None, :]  # (B, 1, 1, n)

        x = ConvTranspose2dTorch(n, self.constant_size, name="pre0")(x)
        x = nn.elu(x)
        x = ConvTranspose2dTorch(n, (5, 5), (2, 2), (2, 2), (1, 1), name="pre1")(x)
        x = nn.elu(x)
        x = ConvTranspose2dTorch(n, (5, 5), (2, 2), (2, 2), (1, 1), name="pre2")(x)
        x = nn.elu(x)
        x = ConvTranspose2dTorch(n, (6, 6), (2, 2), (2, 2), name="pre3")(x)
        x = nn.elu(x)

        x = ConvTranspose2dTorch(n // 2, (6, 6), (2, 2), (2, 2), name="trans_conv1")(x)
        x = nn.elu(x)
        out4 = make_head(self.head, self.out_channels, 4, "head_4")(x)
        x = ConvTranspose2dTorch(n // 4, (6, 6), (2, 2), (2, 2), name="trans_conv2")(x)
        x = nn.elu(x)
        out2 = make_head(self.head, self.out_channels, 2, "head_2")(x)
        import os

        if os.environ.get("MUVO_SUBPIXEL_DECONV", "auto") != "off":
            # Final deconv in parity-packed sub-pixel form: the (B,2H,2W,64)
            # output layout pads C=64 to 128 lanes (2x HBM + MXU waste on
            # the step's largest tensors); the packed (B,H,W,256) form keeps
            # lanes full through the conv, the elu fwd/bwd, AND the 1x1
            # head (block-diagonal) — only the (…, 4*n_classes) head output
            # is pixel-shuffled. Exact same math + params
            # (tests/test_nn_parity.py, tests/test_model.py).
            from muvo_tpu.models.layers import SubPixelConvTranspose2d

            xp = SubPixelConvTranspose2d(n // 8, name="trans_conv3")(x)
            xp = nn.elu(xp)
            out1 = make_head(self.head, self.out_channels, 1, "head_1")(
                xp, packed_subpixel=n // 8)
        else:
            x = ConvTranspose2dTorch(n // 8, (6, 6), (2, 2), (2, 2),
                                     name="trans_conv3")(x)
            x = nn.elu(x)
            out1 = make_head(self.head, self.out_channels, 1, "head_1")(x)
        return {**out4, **out2, **out1}


class VoxelDecoder(nn.Module):
    """3-D AdaIN deconv pyramid to (X, Y, Z) = (192, 192, 64).

    feature_channels follows VOXEL_SEG.DIMENSION (64 in the flagship config),
    so the stack runs 128 -> 64 -> 32 -> 16 -> 8 channels.
    (reference: common.py:498-546, VoxelDecoder1)
    """

    latent_n_channels: int
    semantic_n_channels: int
    feature_channels: int = 512
    constant_size: Tuple[int, int, int] = (3, 3, 1)

    @nn.compact
    def __call__(self, w) -> Dict[str, jnp.ndarray]:
        n = self.feature_channels
        b = w.shape[0]
        const = self.param(
            "constant_tensor", nn.initializers.normal(1.0),
            (*self.constant_size, 2 * n),
        )
        x = jnp.broadcast_to(const[None], (b, *self.constant_size, 2 * n))

        x = AdaptiveInstanceNorm(2 * n, name="first_norm")(x, w)
        x = ConvInstanceNorm(n, name="first_conv")(x, w)
        for i in range(3):
            x = DecoderBlock(n, upsample=True, name=f"middle_{i}")(x, w)

        # The large scales run z-folded on TPU: once a stage's (doubled)
        # shapes fit the Pallas z-fold kernel, the trunk stays 4-D
        # (B, X, Y, Z*C) through blocks and heads — 5-D tensors at these
        # sizes cost 5-8x layout padding (ops/pallas_zconv.py).
        from muvo_tpu.ops.conv3d_zband import pallas_voxel_path

        out: Dict[str, jnp.ndarray] = {}
        folded = None  # (x4, (Z, C)) once the trunk folds
        for out_c, k, bname, hname in (
            (n // 2, 4, "conv1", "head_4"),
            (n // 4, 2, "conv2", "head_2"),
            (n // 8, 1, "conv3", "head_1"),
        ):
            if folded is not None:
                # re-check the upcoming (doubled) shapes; unfold if the
                # kernel can't take this stage
                x4, (Z0, C0) = folded
                bb, X0, Y0, _ = x4.shape
                big = (bb, 2 * X0, 2 * Y0, 2 * Z0, C0)
                if not (pallas_voxel_path(big, out_c)
                        and pallas_voxel_path(big[:4] + (out_c,), out_c)):
                    x = x4.reshape(bb, X0, Y0, Z0, C0)
                    folded = None
            if folded is None:
                big = (x.shape[0], 2 * x.shape[1], 2 * x.shape[2],
                       2 * x.shape[3], x.shape[4])
                both_convs_ok = (
                    pallas_voxel_path(big, out_c)
                    and pallas_voxel_path(big[:4] + (out_c,), out_c)
                )
                if both_convs_ok:
                    bb, X1, Y1, Z1, C1 = x.shape
                    folded = (x.reshape(bb, X1, Y1, Z1 * C1), (Z1, C1))
            if folded is not None:
                x4, zc = DecoderBlock(out_c, upsample=True, name=bname)(
                    folded[0], w, folded_zc=folded[1])
                folded = (x4, zc)
                out.update(make_head("voxel", self.semantic_n_channels, k,
                                     hname)(x4, folded_zc=zc))
            else:
                x = DecoderBlock(out_c, upsample=True, name=bname)(x, w)
                out.update(make_head("voxel", self.semantic_n_channels, k,
                                     hname)(x))
        return out


class VoxelDecoderScale(nn.Module):
    """Tri-plane (xy/xz/yz) attention fusion into a dense 3-D grid.

    (reference: common.py:427-478, VoxelDecoderScale)
    """

    n_classes: int
    feature_channels: int = 512

    @nn.compact
    def __call__(self, feats) -> jnp.ndarray:
        xy, xz, yz = feats  # NHWC planes: (B,X,Y,C), (B,X,Z,C), (B,Y,Z,C)
        w_xy = nn.Conv(1, (1, 1), name="weight_xy")(xy)
        w_xz = nn.Conv(1, (1, 1), name="weight_xz")(xz)
        w_yz = nn.Conv(1, (1, 1), name="weight_yz")(yz)

        def expand(t, axis):
            return jnp.expand_dims(t, axis)

        f_xy = expand(xy, 3)   # (B, X, Y, 1, C)
        f_xz = expand(xz, 2)   # (B, X, 1, Z, C)
        f_yz = expand(yz, 1)   # (B, 1, Y, Z, C)
        g_xy = expand(w_xy, 3)
        g_xz = expand(w_xz, 2)
        g_yz = expand(w_yz, 1)

        def att(t1, w1, t2, w2):
            m = jnp.maximum(w1, w2)
            e1, e2 = jnp.exp(w1 - m), jnp.exp(w2 - m)
            z = e1 + e2
            return t1 * (e1 / z) + t2 * (e2 / z)

        fused = att(f_xy, g_xy, f_xz, g_xz) + att(f_xy, g_xy, f_yz, g_yz)
        x = nn.Conv(self.feature_channels, (3, 3, 3), padding="SAME",
                    name="cls1")(fused)
        x = nn.softplus(x)
        return nn.Conv(self.n_classes, (1, 1, 1), name="cls2")(x)


class TriPlaneVoxelDecoder(nn.Module):
    """Multi-scale tri-plane voxel decoder (reference VoxelDecoder0)."""

    n_classes: int
    feature_channels: int = 512

    @nn.compact
    def __call__(self, xy, xz, yz) -> Dict[str, jnp.ndarray]:
        out = {}
        for scale in (1, 2, 4):
            out[f"voxel_{scale}"] = VoxelDecoderScale(
                self.n_classes, self.feature_channels, name=f"decoder_{scale}"
            )((xy[f"rgb_{scale}"], xz[f"rgb_{scale}"], yz[f"rgb_{scale}"]))
        return out
