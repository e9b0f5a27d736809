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


def _timm_create_model(name, pretrained=False, features_only=False,
                       out_indices=(2, 3, 4), in_chans=3, **kwargs):
    assert name == "resnet18", f"stub only provides resnet18, got {name}"
    assert features_only, "stub only provides the features_only form"
    return _make_timm_resnet18(in_chans=in_chans,
                               out_indices=tuple(out_indices))


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
