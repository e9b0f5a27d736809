"""Panoptic centre/offset label generation, vectorised for TPU.

Semantics match reference muvo/utils/instance_utils.py:4-35 (which loops over
instances in Python): per frame, each instance id >= 1 contributes a Gaussian
bump at its rounded centre of mass to the centre heatmap, and (xc - x, yc - y)
displacement vectors on its own pixels to the offset map; other pixels hold
``ignore_index``.

This implementation is jit-safe with a static ``max_instances`` bound and uses
channels-last layout: centre (..., h, w, 1), offset (..., h, w, 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_instances", "ignore_index"))
def center_offset_labels(instance_label: jnp.ndarray, sigma,
                         max_instances: int = 32, ignore_index: int = 255):
    """instance_label: (b, s, h, w) int. sigma may be scalar or python float.

    Returns (center (b,s,h,w,1) float32, offset (b,s,h,w,2) float32).
    """

    def per_frame(inst, sig):
        h, w = inst.shape
        x = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
        y = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]

        ids = jnp.arange(1, max_instances + 1)
        masks = inst[None] == ids[:, None, None]  # (M, h, w)
        counts = masks.sum(axis=(1, 2))
        present = counts > 0
        safe = jnp.maximum(counts, 1).astype(jnp.float32)
        xc = jnp.round((masks * x[None]).sum(axis=(1, 2)) / safe)
        yc = jnp.round((masks * y[None]).sum(axis=(1, 2)) / safe)

        off_x = xc[:, None, None] - x[None]
        off_y = yc[:, None, None] - y[None]
        g = jnp.exp(-(off_x ** 2 + off_y ** 2) / sig ** 2)
        g = jnp.where(present[:, None, None], g, 0.0)
        center = g.max(axis=0, initial=0.0)

        ignore = jnp.float32(ignore_index)
        # Pick the offset of the instance owning each pixel (masks are
        # disjoint, so a masked sum selects it).
        any_mask = masks.any(axis=0)
        sel_x = (masks * off_x).sum(axis=0)
        sel_y = (masks * off_y).sum(axis=0)
        offset_x = jnp.where(any_mask, sel_x, ignore)
        offset_y = jnp.where(any_mask, sel_y, ignore)

        return center[..., None], jnp.stack([offset_x, offset_y], axis=-1)

    b, s = instance_label.shape[:2]
    flat = instance_label.reshape((b * s,) + instance_label.shape[2:])
    sig = jnp.float32(sigma)
    center, offset = jax.vmap(lambda m: per_frame(m, sig))(flat)
    center = center.reshape((b, s) + center.shape[1:])
    offset = offset.reshape((b, s) + offset.shape[1:])
    return center, offset
