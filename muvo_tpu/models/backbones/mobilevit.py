"""MobileViTv2 feature backbone (NHWC) — faithful to timm `mobilevitv2_100`.

Reference usage: the reference passes cfg names straight to
``timm.create_model`` for the LiDAR range-view encoder (in_chans=4) and the
BEV backbone (muvo/models/mile.py:81-85, 254-258, 269-275); the
`test_mobilevit_2d.yml` baseline config selects 'mobilevitv2_100' for
MODEL.ENCODER.NAME / MODEL.LIDAR.ENCODER / MODEL.BEV.BACKBONE.
(Reference quirk: mile.py:23-27 only constructs the *image* encoder when
NAME == 'resnet18', so the image-encoder mobilevit branch would NameError on
`feature_info` in the reference as written; we build it generically.)

Topology is timm's byobnet mobilevitv2 config ("Separable Self-attention for
Mobile Vision Transformers", arXiv:2206.02680), width 1.0:

    stem   Conv3x3 s2 -> 32, BN, SiLU
    stage0 1x  InvertedResidual(64,  s1, exp 2)
    stage1 2x  InvertedResidual(128, s2/s1)
    stage2 IR(256, s2) + MobileViTv2Block(d=128, depth 2)
    stage3 IR(384, s2) + MobileViTv2Block(d=192, depth 4)
    stage4 IR(512, s2) + MobileViTv2Block(d=256, depth 3)

feature channels (64, 128, 256, 384, 512) at reductions (2, 4, 8, 16, 32),
matching timm features_only. All norms inside the transformer are
GroupNorm(1) over the whole (C, P, N) token tensor (timm GroupNorm1 on the
[B, C, P, N] layout) — NOT per-token LayerNorm. Parameter names mirror the
timm module tree one-to-one so `training/weight_convert._mobilevit_entries`
can map a timm state_dict directly (torch `stages.{i}.{j}` -> flax
`s{i}b{j}`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvNormAct(nn.Module):
    """timm ConvNormAct: conv (no bias) + BN + optional SiLU.

    Submodules named `conv`/`bn` to match timm state_dict keys.
    """

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
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.silu(x) if self.act else x


class InvertedResidual(nn.Module):
    """timm byobnet BottleneckBlock(bottle_in=True, linear_out=True, gs=1):
    1x1 expand (SiLU) -> depthwise 3x3 (SiLU) -> 1x1 project (linear),
    residual only at stride 1 with matching channels."""

    features: int
    stride: int = 1
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        y = ConvNormAct(hidden, kernel=1, name="conv1_1x1")(x, train)
        y = ConvNormAct(hidden, kernel=3, stride=self.stride, groups=hidden,
                        name="conv2_kxk")(y, train)
        y = ConvNormAct(self.features, kernel=1, act=False,
                        name="conv3_1x1")(y, train)
        if self.stride == 1 and c_in == self.features:
            y = y + x
        return y


def GroupNorm1(name: str) -> nn.GroupNorm:
    """timm GroupNorm1: GroupNorm(num_groups=1) — on the token tensor
    (b, P, N, d) the statistics reduce over ALL of (P, N, d) per sample,
    with per-channel (d) affine."""
    return nn.GroupNorm(num_groups=1, epsilon=1e-5, name=name)


class SeparableSelfAttention(nn.Module):
    """timm LinearSelfAttention on tokens (..., N, d): a fused qkv projection
    to (1 + 2d); softmax of the 1-d query scores over N; context = sum of
    score-weighted keys; out = out_proj(relu(value) * context)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        qkv = nn.Dense(1 + 2 * self.dim, name="qkv_proj")(x)
        i = qkv[..., :1]
        k = qkv[..., 1:1 + self.dim]
        v = qkv[..., 1 + self.dim:]
        scores = nn.softmax(i, axis=-2)
        context = jnp.sum(scores * k, axis=-2, keepdims=True)
        return nn.Dense(self.dim, name="out_proj")(nn.relu(v) * context)


class LinearTransformerBlock(nn.Module):
    """timm LinearTransformerBlock: prenorm attention + prenorm ConvMlp,
    both normed by GroupNorm1 (joint (P, N, d) statistics)."""

    dim: int
    ffn_mult: float = 2.0

    @nn.compact
    def __call__(self, x):
        x = x + SeparableSelfAttention(self.dim, name="attn")(
            GroupNorm1(name="norm1")(x))
        y = GroupNorm1(name="norm2")(x)
        y = nn.silu(nn.Dense(int(self.dim * self.ffn_mult), name="fc1")(y))
        return x + nn.Dense(self.dim, name="fc2")(y)


def _resize_bilinear_align_corners(x, new_h: int, new_w: int):
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC.

    Only reached when a feature map's H/W is not a multiple of the patch
    size (timm resizes UP to the next multiple and does not resize back)."""
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            lo = jnp.zeros((n_out,), jnp.int32)
            return lo, lo, jnp.zeros((n_out,), x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        return lo, lo + 1, (pos - lo.astype(jnp.float32)).astype(x.dtype)

    lo_h, hi_h, wh = axis_weights(h, new_h)
    x = (x[:, lo_h] * (1 - wh)[None, :, None, None]
         + x[:, hi_h] * wh[None, :, None, None])
    lo_w, hi_w, ww = axis_weights(w, new_w)
    return (x[:, :, lo_w] * (1 - ww)[None, None, :, None]
            + x[:, :, hi_w] * ww[None, None, :, None])


class MobileViTV2Block(nn.Module):
    """timm MobileVitV2Block: depthwise local conv -> 1x1 to attention dim ->
    unfold 2x2 patches -> linear transformer stack -> GroupNorm1 -> fold ->
    1x1 projection back (linear). Non-divisible maps are bilinearly resized
    UP (align_corners=True) and stay at the padded size, as in timm."""

    attn_dim: int
    depth: int
    patch: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        b, h, w, _ = x.shape
        p = self.patch
        new_h = -(-h // p) * p
        new_w = -(-w // p) * p
        if (new_h, new_w) != (h, w):
            x = _resize_bilinear_align_corners(x, new_h, new_w)

        y = ConvNormAct(c, kernel=3, groups=c, name="conv_kxk")(x, train)
        y = nn.Conv(self.attn_dim, (1, 1), use_bias=False, name="conv_1x1")(y)

        d = self.attn_dim
        hh, ww = new_h // p, new_w // p
        # unfold: (b, hh, p, ww, p, d) -> (b, P=p*p, N=hh*ww, d); token
        # ordering matches timm's [B, C, P, N] reshape/permute exactly
        tokens = y.reshape(b, hh, p, ww, p, d)
        tokens = tokens.transpose(0, 2, 4, 1, 3, 5).reshape(b, p * p, hh * ww, d)

        for i in range(self.depth):
            tokens = LinearTransformerBlock(d, name=f"tf{i}")(tokens)
        tokens = GroupNorm1(name="norm")(tokens)

        y = tokens.reshape(b, p, p, hh, ww, d).transpose(0, 3, 1, 4, 2, 5)
        y = y.reshape(b, new_h, new_w, d)
        return ConvNormAct(c, kernel=1, act=False, name="conv_proj")(y, train)


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
        x = InvertedResidual(int(64 * w), stride=1, name="s0b0")(x, train)
        feats[0] = x

        x = InvertedResidual(int(128 * w), stride=2, name="s1b0")(x, train)
        x = InvertedResidual(int(128 * w), stride=1, name="s1b1")(x, train)
        feats[1] = x

        for idx, (c_out, attn_dim, depth) in enumerate(
            [(int(256 * w), int(128 * w), 2),
             (int(384 * w), int(192 * w), 4),
             (int(512 * w), int(256 * w), 3)]
        ):
            x = InvertedResidual(c_out, stride=2,
                                 name=f"s{idx + 2}b0")(x, train)
            x = MobileViTV2Block(attn_dim, depth,
                                 name=f"s{idx + 2}b1")(x, train)
            feats[idx + 2] = x

        return [feats[i] for i in self.out_indices]
