"""Activation-sharding hints for the ('data', 'model') mesh.

`constrain` applies `with_sharding_constraint` when a mesh is in context
(the trainer wraps its jitted steps in ``jax.sharding.set_mesh``) and is a
no-op under plain jit, so model code can carry GSPMD layout hints without
depending on how (or whether) it is being partitioned. The 'model' axis
shards the fusion transformer's heads and the voxel decoder's spatial rows;
XLA propagates the layouts through the surrounding ops and inserts the ICI
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import PartitionSpec as P


def _active_mesh_axes() -> Optional[frozenset]:
    """Axis names of the mesh in context for the current trace, or None."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return None
    return frozenset(mesh.axis_names)


def constrain(x, spec: Sequence[Optional[str]]):
    """Sharding hint. No-op under plain jit (no mesh in context). With a mesh
    in context, a named axis missing from the mesh is a hard error — a
    misspelled axis must not silently degrade the layout.
    """
    axes = _active_mesh_axes()
    if axes is None:
        return x
    for s in spec:
        for name in (s if isinstance(s, (tuple, list)) else (s,)):
            if name is not None and name not in axes:
                raise ValueError(
                    f"constrain(): axis {name!r} not in active mesh axes "
                    f"{sorted(axes)}"
                )
    return jax.lax.with_sharding_constraint(x, P(*spec))
