"""Mixed-precision helpers: bf16 compute with fp32 master params.

Policy (matches the reference's '16-mixed' Lightning setting, adapted to
TPU): parameters and optimizer state live in fp32; inside the compiled step
params + floating batch tensors are cast to bf16, the model computes in bf16
(normalisation statistics stay fp32 — flax upcasts half-precision stats, and
the custom AdaIN/MaskedBatchNorm do the same), losses upcast to fp32, and
gradients are cast back to fp32 before the optimizer update. No loss scaling
is needed on TPU (bf16 keeps fp32's exponent range).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves to dtype; leave ints/bools untouched."""

    def cast(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def compute_dtype_from_cfg(cfg):
    precision = str(cfg.PRECISION)
    if "16" in precision:
        return jnp.bfloat16
    return jnp.float32
