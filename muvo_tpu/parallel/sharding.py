"""Activation-sharding hints for the ('data', 'model') mesh.

`constrain` applies `with_sharding_constraint` when a mesh is active, and is
a no-op otherwise, so model code can carry GSPMD layout hints without
depending on how (or whether) it is being partitioned. The 'model' axis
shards the fusion transformer's heads and the voxel decoder's spatial rows;
XLA propagates the layouts through the surrounding ops and inserts the ICI
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import PartitionSpec as P


def constrain(x, spec: Sequence[Optional[str]]):
    """Best-effort sharding constraint; no-op without an active mesh."""
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except (ValueError, RuntimeError, TypeError):
        return x
