"""Make the reference tree importable for parity tests.

The reference's pure-torch modules pull in optional deps at import time
(timm, torch_scatter, open3d, carla — via geometry_utils/dataset_utils
chains). install() registers stand-ins in sys.modules BEFORE any
`import muvo.*`:

* timm / open3d / carla: empty placeholder modules — only classes the
  parity tests never instantiate touch them.
* torch_scatter: REAL pure-torch implementations of scatter_mean and
  scatter_max (dim=0), so DynamicPointNet / PointPillarNet run genuinely.
"""

import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


def _scatter_mean(src, index, dim=0):
    assert dim == 0
    n = int(index.max()) + 1 if index.numel() else 0
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    cnt = torch.zeros(n, dtype=src.dtype)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    return out / cnt.clamp(min=1).unsqueeze(-1)


def _scatter_max(src, index, dim=0):
    assert dim == 0
    n = int(index.max()) + 1 if index.numel() else 0
    out = torch.full((n,) + src.shape[1:], float("-inf"), dtype=src.dtype)
    idx = index.unsqueeze(-1).expand_as(src)
    out.scatter_reduce_(0, idx, src, reduce="amax", include_self=True)
    return out, None  # callers use [0] (torch_scatter returns (max, argmax))


def _downsample_conv(in_channels, out_channels, kernel_size, stride=1,
                     dilation=1, first_dilation=None, norm_layer=None):
    """Faithful stand-in for timm.models.resnet.downsample_conv as the
    reference BasicBlock calls it (kernel_size=1, stride=2 -> padding 0)."""
    import torch.nn as nn

    norm_layer = norm_layer or nn.BatchNorm2d
    kernel_size = 1 if stride == 1 and dilation == 1 else kernel_size
    first_dilation = (first_dilation or dilation) if kernel_size > 1 else 1
    padding = ((stride - 1) + first_dilation * (kernel_size - 1)) // 2
    return nn.Sequential(
        nn.Conv2d(in_channels, out_channels, kernel_size, stride=stride,
                  padding=padding, dilation=first_dilation, bias=False),
        norm_layer(out_channels),
    )


class _FeatureInfo:
    def __init__(self, dicts):
        self._dicts = dicts

    def get_dicts(self, keys=None):
        if keys is None:
            return list(self._dicts)
        return [{k: d[k] for k in keys} for d in self._dicts]


def _make_timm_resnet18(in_chans=3, out_indices=(2, 3, 4)):
    """Faithful torch resnet18 with timm's features_only module naming
    (conv1/bn1/act1/maxpool, layerN.M.{conv1,bn1,conv2,bn2,downsample.0/1})
    and feature_info API — random init (`pretrained` weights are not
    downloadable here; parity tests convert whatever weights the module
    holds, so the init source is irrelevant)."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.act1 = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.act2 = nn.ReLU(inplace=True)
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            else:
                self.downsample = None

        def forward(self, x):
            s = x if self.downsample is None else self.downsample(x)
            x = self.act1(self.bn1(self.conv1(x)))
            x = self.bn2(self.conv2(x))
            return self.act2(x + s)

    class ResNet18Features(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_chans, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.act1 = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(Block(64, 64), Block(64, 64))
            self.layer2 = nn.Sequential(Block(64, 128, 2), Block(128, 128))
            self.layer3 = nn.Sequential(Block(128, 256, 2), Block(256, 256))
            self.layer4 = nn.Sequential(Block(256, 512, 2), Block(512, 512))
            info = [
                {"num_chs": 64, "reduction": 2},
                {"num_chs": 64, "reduction": 4},
                {"num_chs": 128, "reduction": 8},
                {"num_chs": 256, "reduction": 16},
                {"num_chs": 512, "reduction": 32},
            ]
            self.feature_info = _FeatureInfo([info[i] for i in out_indices])

        def forward(self, x):
            feats = []
            x = self.act1(self.bn1(self.conv1(x)))
            feats.append(x)
            x = self.maxpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                feats.append(x)
            return [feats[i] for i in out_indices]

    return ResNet18Features()


def _make_timm_mobilevitv2(in_chans=3, out_indices=(2, 3, 4), width=1.0):
    """Faithful torch mobilevitv2_100 with timm's byobnet module naming
    (stem.conv/bn, stages.{i}.{j}.{conv1_1x1,conv2_kxk,conv3_1x1}.conv/bn,
    mobilevit blocks' conv_kxk/conv_1x1/transformer.{k}/norm/conv_proj) and
    feature_info API. Matches timm's semantics exactly: SiLU everywhere,
    GroupNorm(1) norms over the [B, C, P, N] token tensor, fused qkv 1x1
    convs, softmax of the 1-d query scores over the patch axis N, residual
    IR blocks only at stride 1, bilinear align_corners=True resize up to a
    patch multiple (never resized back). Random init (pretrained weights are
    not downloadable here; parity tests convert whatever the module holds)."""
    import math

    import torch.nn as nn
    import torch.nn.functional as F

    class ConvNormAct(nn.Module):
        def __init__(self, cin, cout, k=3, stride=1, groups=1, act=True):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride, (k - 1) // 2,
                                  groups=groups, bias=False)
            self.bn = nn.BatchNorm2d(cout)
            self.act = nn.SiLU(inplace=True) if act else nn.Identity()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Bottleneck(nn.Module):  # byobnet 'bottle' w/ bottle_in, linear_out
        def __init__(self, cin, cout, stride=1, exp=2):
            super().__init__()
            mid = cin * exp
            self.conv1_1x1 = ConvNormAct(cin, mid, 1)
            self.conv2_kxk = ConvNormAct(mid, mid, 3, stride, groups=mid)
            self.conv3_1x1 = ConvNormAct(mid, cout, 1, act=False)
            self.has_res = stride == 1 and cin == cout

        def forward(self, x):
            y = self.conv3_1x1(self.conv2_kxk(self.conv1_1x1(x)))
            return x + y if self.has_res else y

    class LinearSelfAttention(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dim = dim
            self.qkv_proj = nn.Conv2d(dim, 1 + 2 * dim, 1, bias=True)
            self.out_proj = nn.Conv2d(dim, dim, 1, bias=True)

        def forward(self, x):  # x: [B, C, P, N]
            qkv = self.qkv_proj(x)
            q, k, v = qkv.split([1, self.dim, self.dim], dim=1)
            scores = F.softmax(q, dim=-1)
            ctx = (k * scores).sum(dim=-1, keepdim=True)
            return self.out_proj(F.relu(v) * ctx.expand_as(v))

    class ConvMlp(nn.Module):
        def __init__(self, dim, mult=2.0):
            super().__init__()
            self.fc1 = nn.Conv2d(dim, int(dim * mult), 1, bias=True)
            self.act = nn.SiLU(inplace=True)
            self.fc2 = nn.Conv2d(int(dim * mult), dim, 1, bias=True)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class LinearTransformerBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.norm1 = nn.GroupNorm(1, dim, eps=1e-5)
            self.attn = LinearSelfAttention(dim)
            self.norm2 = nn.GroupNorm(1, dim, eps=1e-5)
            self.mlp = ConvMlp(dim)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class MobileVitV2Block(nn.Module):
        def __init__(self, chs, dim, depth, patch=2):
            super().__init__()
            self.patch = patch
            self.conv_kxk = ConvNormAct(chs, chs, 3, groups=chs)
            self.conv_1x1 = nn.Conv2d(chs, dim, 1, bias=False)
            self.transformer = nn.Sequential(
                *[LinearTransformerBlock(dim) for _ in range(depth)])
            self.norm = nn.GroupNorm(1, dim, eps=1e-5)
            self.conv_proj = ConvNormAct(dim, chs, 1, act=False)

        def forward(self, x):
            B, C, H, W = x.shape
            p = self.patch
            nh, nw = math.ceil(H / p) * p, math.ceil(W / p) * p
            n_h, n_w = nh // p, nw // p
            if (nh, nw) != (H, W):
                x = F.interpolate(x, size=(nh, nw), mode="bilinear",
                                  align_corners=True)
            x = self.conv_1x1(self.conv_kxk(x))
            C = x.shape[1]
            x = x.reshape(B, C, n_h, p, n_w, p).permute(0, 1, 3, 5, 2, 4)
            x = x.reshape(B, C, p * p, n_h * n_w)
            x = self.norm(self.transformer(x))
            x = x.reshape(B, C, p, p, n_h, n_w).permute(0, 1, 4, 2, 5, 3)
            x = x.reshape(B, C, nh, nw)
            return self.conv_proj(x)

    class MobileViTV2Features(nn.Module):
        def __init__(self):
            super().__init__()
            w = width
            chs = [int(c * w) for c in (64, 128, 256, 384, 512)]
            self.stem = ConvNormAct(in_chans, int(32 * w), 3, stride=2)
            self.stages = nn.Sequential(
                nn.Sequential(Bottleneck(int(32 * w), chs[0], 1)),
                nn.Sequential(Bottleneck(chs[0], chs[1], 2),
                              Bottleneck(chs[1], chs[1], 1)),
                nn.Sequential(Bottleneck(chs[1], chs[2], 2),
                              MobileVitV2Block(chs[2], int(128 * w), 2)),
                nn.Sequential(Bottleneck(chs[2], chs[3], 2),
                              MobileVitV2Block(chs[3], int(192 * w), 4)),
                nn.Sequential(Bottleneck(chs[3], chs[4], 2),
                              MobileVitV2Block(chs[4], int(256 * w), 3)),
            )
            info = [{"num_chs": c, "reduction": r}
                    for c, r in zip(chs, (2, 4, 8, 16, 32))]
            self.feature_info = _FeatureInfo([info[i] for i in out_indices])

        def forward(self, x):
            x = self.stem(x)
            feats = []
            for stage in self.stages:
                x = stage(x)
                feats.append(x)
            return [feats[i] for i in out_indices]

    return MobileViTV2Features()


def _timm_create_model(name, pretrained=False, features_only=False,
                       out_indices=(2, 3, 4), in_chans=3, **kwargs):
    assert features_only, "stub only provides the features_only form"
    # str() unwraps the parity tests' _EncName trick (a str subclass that
    # compares equal to 'resnet18' to sidestep the reference's mile.py:23
    # resnet18-only encoder guard while requesting mobilevit).
    real = str(name)
    if real == "resnet18":
        return _make_timm_resnet18(in_chans=in_chans,
                                   out_indices=tuple(out_indices))
    if real == "mobilevitv2_100":
        return _make_timm_mobilevitv2(in_chans=in_chans,
                                      out_indices=tuple(out_indices))
    raise AssertionError(f"stub only provides resnet18/mobilevitv2_100, got {name}")


def install():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "torch_scatter" not in sys.modules:
        m = types.ModuleType("torch_scatter")
        m.scatter_mean = _scatter_mean
        m.scatter_max = _scatter_max
        sys.modules["torch_scatter"] = m
    for name in ("timm", "open3d", "carla"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            # PEP 562 module __getattr__: the repo's own lazy-import sites
            # use `try: import carla; carla.X ... except ImportError:` — a
            # silent empty stub would flip them onto the carla path and
            # crash with AttributeError. Raising ImportError on attribute
            # access keeps their fallback contract intact while letting the
            # reference's module-level `import carla` succeed.
            def _missing(attr, _name=name):
                raise ImportError(
                    f"'{_name}' is a parity-test stub (attribute {attr!r})")
            m.__getattr__ = _missing
            sys.modules[name] = m
    if "timm.models" not in sys.modules:
        models = types.ModuleType("timm.models")
        resnet = types.ModuleType("timm.models.resnet")
        resnet.downsample_conv = _downsample_conv
        models.resnet = resnet
        sys.modules["timm"].models = models
        sys.modules["timm"].create_model = _timm_create_model
        sys.modules["timm.models"] = models
        sys.modules["timm.models.resnet"] = resnet
    if "torchvision" not in sys.modules:
        import torch.nn.functional as F

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class Normalize:  # minimal base for network_utils.NormalizeInverse
            def __init__(self, mean, std, inplace=False):
                self.mean, self.std, self.inplace = mean, std, inplace

            def __call__(self, tensor):
                mean = torch.as_tensor(self.mean, dtype=tensor.dtype)
                std = torch.as_tensor(self.std, dtype=tensor.dtype)
                return (tensor - mean[:, None, None]) / std[:, None, None]

        tr.Normalize = Normalize
        tv.transforms = tr
        _ = F  # keep the local import obvious
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
