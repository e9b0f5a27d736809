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
        sys.modules["timm.models"] = models
        sys.modules["timm.models.resnet"] = resnet
