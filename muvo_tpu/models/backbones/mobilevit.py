"""MobileViTv2 feature backbone (NHWC), timm `mobilevitv2_100`-compatible
topology.

Reference usage: muvo/models/mile.py:24-27 with
cfg MODEL.ENCODER.NAME = 'mobilevitv2_100' (test_mobilevit_2d.yml). Feature
schedule matches timm: channels (64, 128, 256, 384, 512) at reductions
(2, 4, 8, 16, 32); width multiplier 1.0.

Architecture per "Separable Self-attention for Mobile Vision Transformers"
(arXiv:2206.02680): MobileNetV2 blocks for the early stages, MobileViTv2
blocks (local conv -> unfold 2x2 patches -> linear-complexity separable
self-attention transformer -> fold -> project) for the last three stages.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.silu(x) if self.act else x


class MV2Block(nn.Module):
    """MobileNetV2 inverted residual, expansion 2 (MobileViTv2 default)."""

    features: int
    stride: int = 1
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        y = ConvNormAct(hidden, kernel=1)(x, train)
        y = ConvNormAct(hidden, kernel=3, stride=self.stride, groups=hidden)(y, train)
        y = ConvNormAct(self.features, kernel=1, act=False)(y, train)
        if self.stride == 1 and c_in == self.features:
            y = y + x
        return y


class LayerNorm2d(nn.Module):
    """GroupNorm(1) over channels — mobilevit's conv-layout layer norm."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)


class SeparableSelfAttention(nn.Module):
    """Linear-complexity attention: softmax context scores over tokens."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (..., N, d)
        i = nn.Dense(1, name="to_i")(x)                       # (..., N, 1)
        scores = jax.nn.softmax(i, axis=-2)
        k = nn.Dense(self.dim, name="to_k")(x)                # (..., N, d)
        context = jnp.sum(scores * k, axis=-2, keepdims=True)  # (..., 1, d)
        v = nn.relu(nn.Dense(self.dim, name="to_v")(x))
        return nn.Dense(self.dim, name="out")(v * context)


class LinearTransformerBlock(nn.Module):
    dim: int
    ffn_mult: int = 2

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + SeparableSelfAttention(self.dim)(y)
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.silu(nn.Dense(self.dim * self.ffn_mult)(y))
        return x + nn.Dense(self.dim)(y)


class MobileViTV2Block(nn.Module):
    attn_dim: int
    depth: int
    patch: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        # local representation
        y = ConvNormAct(c, kernel=3, groups=c)(x, train)
        y = nn.Conv(self.attn_dim, (1, 1), use_bias=False)(y)

        # unfold into (ph*pw) patch grids of tokens
        b, h, w, d = y.shape
        p = self.patch
        pad_h = (-h) % p
        pad_w = (-w) % p
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hh, ww = y.shape[1] // p, y.shape[2] // p
        tokens = y.reshape(b, hh, p, ww, p, d)
        tokens = tokens.transpose(0, 2, 4, 1, 3, 5).reshape(b, p * p, hh * ww, d)

        for i in range(self.depth):
            tokens = LinearTransformerBlock(self.attn_dim, name=f"tf{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-5)(tokens)

        y = tokens.reshape(b, p, p, hh, ww, d).transpose(0, 3, 1, 4, 2, 5)
        y = y.reshape(b, hh * p, ww * p, d)
        if pad_h or pad_w:
            y = y[:, :h, :w]

        return ConvNormAct(c, kernel=1, act=False)(y, train)


class MobileViTV2Features(nn.Module):
    """Feature pyramid backbone; out_indices as in timm features_only."""

    out_indices: Tuple[int, ...] = (2, 3, 4)
    width: float = 1.0

    @staticmethod
    def feature_info(out_indices=(2, 3, 4), width: float = 1.0):
        chs = [int(64 * width), int(128 * width), int(256 * width),
               int(384 * width), int(512 * width)]
        reds = [2, 4, 8, 16, 32]
        return [{"num_chs": chs[i], "reduction": reds[i]} for i in out_indices]

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        feats = {}
        x = ConvNormAct(int(32 * w), kernel=3, stride=2, name="stem")(x, train)
        x = MV2Block(int(64 * w), stride=1, name="stage0_0")(x, train)
        feats[0] = x

        x = MV2Block(int(128 * w), stride=2, name="stage1_0")(x, train)
        x = MV2Block(int(128 * w), stride=1, name="stage1_1")(x, train)
        feats[1] = x

        for idx, (c_out, attn_dim, depth) in enumerate(
            [(int(256 * w), int(128 * w), 2),
             (int(384 * w), int(192 * w), 4),
             (int(512 * w), int(256 * w), 3)]
        ):
            x = MV2Block(c_out, stride=2, name=f"stage{idx + 2}_mv2")(x, train)
            x = MobileViTV2Block(attn_dim, depth,
                                 name=f"stage{idx + 2}_vit")(x, train)
            feats[idx + 2] = x

        return [feats[i] for i in self.out_indices]
