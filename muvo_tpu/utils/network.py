"""Sequence-dim packing helpers ((b, s, ...) <-> (b*s, ...)).

Semantics match reference muvo/utils/network_utils.py:30-78. Works on numpy,
jnp arrays and pytrees of them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_sequence_dim(x):
    if isinstance(x, (dict,)):
        return {k: pack_sequence_dim(v) for k, v in x.items()}
    b, s = x.shape[:2]
    return x.reshape((b * s,) + tuple(x.shape[2:]))


def unpack_sequence_dim(x, b, s):
    if isinstance(x, (dict,)):
        return {k: unpack_sequence_dim(v, b, s) for k, v in x.items()}
    return x.reshape((b, s) + tuple(x.shape[1:]))


def remove_past(batch, receptive_field):
    """Keep only the last frame of the receptive field (deployment)."""
    return jax.tree_util.tree_map(lambda v: v[:, receptive_field - 1:receptive_field], batch)


def stacked_to_time_major(x):
    """(b, s, ...) -> (s, b, ...) for lax.scan time axes."""
    return jnp.swapaxes(x, 0, 1)
