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
            sys.modules[name] = types.ModuleType(name)
