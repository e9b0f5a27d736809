"""Shared model components: FPN aggregators, route/speed encoders, policy,
positional embeddings, feature compressors.

Reference semantics: muvo/models/common.py:12-130, 636-678 and
muvo/models/mile.py:104-161.  Layout is NHWC.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.models.backbones.resnet import build_backbone
from muvo_tpu.models.layers import (
    BasicBlock,
    ConvBN,
    adaptive_avg_pool_1x1,
    max_pool_torch,
    resize_bilinear,
)


class Decoder(nn.Module):
    """Top-down FPN aggregation to the finest input stride.

    xs: coarse-to-fine list [s8, s16, s32] -> output at stride 8.
    (reference: muvo/models/common.py:71-99)
    """

    out_channels: int

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        x = ConvBN(self.out_channels, name="conv1")(xs[-1], train)
        for i in range(2, len(xs) + 1):
            skip = ConvBN(self.out_channels, name=f"skip{i}")(xs[-i], train)
            size = xs[-i].shape[1:3]
            x = skip + resize_bilinear(x, size)
        return x


class DecoderDS(nn.Module):
    """Bottom-up aggregation to the coarsest stride (max-pool downsampling).

    xs: [s8, s16, s32] -> output at stride 32. (reference: common.py:102-130)
    """

    out_channels: int

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        x = ConvBN(self.out_channels, name="conv1")(xs[0], train)
        for i in range(1, len(xs)):
            stride = xs[i - 1].shape[2] // xs[i].shape[2]
            skip = ConvBN(self.out_channels, name=f"skip{i}")(xs[i], train)
            x = skip + max_pool_torch(x, stride)
        return x


class RouteEncode(nn.Module):
    """Backbone stride-32 features -> global pool -> linear projection.

    (reference: common.py:12-23)
    """

    out_channels: int
    backbone: str = "resnet18"

    @nn.compact
    def __call__(self, route, train: bool = False):
        net, _ = build_backbone(self.backbone, out_indices=(4,))
        x = net(route, train)[0]
        x = adaptive_avg_pool_1x1(x)
        return nn.Dense(self.out_channels, name="fc")(x)


class Policy(nn.Module):
    """4-layer MLP -> tanh over 2 actions. (reference: common.py:53-68)"""

    in_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        x = nn.relu(nn.Dense(c)(x))
        x = nn.relu(nn.Dense(c)(x))
        x = nn.relu(nn.Dense(c // 2)(x))
        return jnp.tanh(nn.Dense(2)(x))


class FeatureCompressor(nn.Module):
    """Two BasicBlocks (first strided) + global pool: (N,H,W,C) -> (N, D).

    (reference: mile.py:104-115 image/lidar_feature_conv)
    """

    out_channels: int
    strides: Sequence[int] = (2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.out_channels, stride=self.strides[0],
                       downsample=True, name="block1")(x, train)
        x = BasicBlock(self.out_channels, stride=self.strides[1],
                       downsample=self.strides[1] != 1, name="block2")(x, train)
        return adaptive_avg_pool_1x1(x)


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0, normalize: bool = True,
                            scale: float = 2 * math.pi) -> jnp.ndarray:
    """2-D sine/cosine positional embedding, (h, w, 2*num_pos_feats).

    (reference: common.py:636-678; channel order [pos_y, pos_x])
    """
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class SpeedEncoder(nn.Module):
    """speed (N, 1) -> (N, C). (reference: mile.py:151-158)"""

    channels: int
    normalisation: float

    @nn.compact
    def __call__(self, speed):
        x = speed / self.normalisation
        x = nn.relu(nn.Dense(self.channels)(x))
        return nn.relu(nn.Dense(self.channels)(x))


class CommandEncoder(nn.Module):
    """Route command id -> embedding -> 2-layer MLP. (reference: mile.py:125-139)"""

    channels: int

    @nn.compact
    def __call__(self, command):
        x = nn.Embed(6, self.channels)(command.astype(jnp.int32))
        x = nn.relu(nn.Dense(self.channels)(x))
        return nn.relu(nn.Dense(self.channels)(x))


class GpsEncoder(nn.Module):
    """(N, 4) gps vectors -> (N, C). (reference: mile.py:141-146)"""

    channels: int

    @nn.compact
    def __call__(self, gps):
        x = nn.relu(nn.Dense(self.channels)(gps))
        return nn.relu(nn.Dense(self.channels)(x))


class BevDownSample4(nn.Module):
    """Two stride-2 5x5 convs used to shrink BEV features 4x.

    (reference: mile.py:55-59)
    """

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(512, (5, 5), (2, 2), padding=((2, 2), (2, 2)))(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (5, 5), (2, 2), padding=((2, 2), (2, 2)))(x)
