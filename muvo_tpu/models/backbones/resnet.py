"""ResNet feature backbone (NHWC), timm `features_only`-compatible.

Mirrors the behaviour of the reference's timm resnet18 feature extractors
(reference: muvo/models/mile.py:23-27, 81-85, 254-258, 269-275): a standard
resnet18 trunk returning intermediate feature maps at the requested
``out_indices`` with the timm reduction/channel schedule:

    index:      0    1    2    3    4
    reduction:  2    4    8    16   32
    channels:   64   64   128  256  512

Weight layout is conversion-friendly from torchvision/timm state dicts
(conv1/bn1/layer{1..4}.{0,1}.{conv1,bn1,conv2,bn2,downsample}).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from muvo_tpu.models.layers import max_pool_torch


class _ResNetBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False

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
        if self.use_downsample:
            shortcut = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                               padding="VALID", use_bias=False,
                               name="downsample_conv")(shortcut)
            shortcut = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(shortcut)
        return nn.relu(y + shortcut)


class ResNetFeatures(nn.Module):
    """ResNet-18/34 trunk returning multi-scale features.

    out_indices selects from [stem/2, layer1/4, layer2/8, layer3/16, layer4/32].
    """

    out_indices: Tuple[int, ...] = (2, 3, 4)
    layers: Tuple[int, ...] = (2, 2, 2, 2)  # resnet18
    width: int = 64

    @staticmethod
    def feature_info(out_indices=(2, 3, 4), width=64):
        table = [
            {"num_chs": width, "reduction": 2},
            {"num_chs": width, "reduction": 4},
            {"num_chs": width * 2, "reduction": 8},
            {"num_chs": width * 4, "reduction": 16},
            {"num_chs": width * 8, "reduction": 32},
        ]
        return [table[i] for i in out_indices]

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = {}
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        feats[0] = x
        x = max_pool_torch(x, 3, 2, padding=1)

        planes = self.width
        for stage_idx, n_blocks in enumerate(self.layers):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n_blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (s != 1 or x.shape[-1] != planes)
                x = _ResNetBasicBlock(
                    planes, s, needs_ds,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            feats[stage_idx + 1] = x
            planes *= 2

        return [feats[i] for i in self.out_indices]


def build_backbone(name: str, out_indices: Sequence[int] = (2, 3, 4),
                   remat: bool = False):
    """Backbone registry. Returns (module, feature_info list).

    remat=True wraps the backbone in nn.remat so its activations are
    recomputed in the backward pass (frees encoder feature maps from HBM).
    """
    out_indices = tuple(out_indices)
    if name == "resnet18":
        cls = (nn.remat(ResNetFeatures, static_argnums=(2,))
           if remat else ResNetFeatures)
        return (
            cls(out_indices=out_indices, layers=(2, 2, 2, 2)),
            ResNetFeatures.feature_info(out_indices),
        )
    if name == "resnet34":
        cls = (nn.remat(ResNetFeatures, static_argnums=(2,))
           if remat else ResNetFeatures)
        return (
            cls(out_indices=out_indices, layers=(3, 4, 6, 3)),
            ResNetFeatures.feature_info(out_indices),
        )
    if name.startswith("mobilevit"):
        from muvo_tpu.models.backbones.mobilevit import MobileViTV2Features

        cls = (nn.remat(MobileViTV2Features, static_argnums=(2,))
           if remat else MobileViTV2Features)
        return (
            cls(out_indices=out_indices),
            MobileViTV2Features.feature_info(out_indices),
        )
    raise ValueError(f"Unknown backbone: {name}")
