"""Device mesh and sharding layout.

The training step is one SPMD program over a ``Mesh(('data', 'model'))``:
batches shard along 'data' (gradient all-reduce rides ICI, inserted by XLA),
parameters and optimizer state are replicated by default, and the 'model'
axis is available for tensor/sequence sharding of the fusion transformer and
the voxel decoder at larger scales.

The reference trains through Lightning with DDP latent and effectively runs
single-GPU (reference: train.py:93-112, muvo/config.py:39); here multi-chip is
the default path and a 1-device mesh is just the degenerate case.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {n_total}"
    )
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Form a global batch sharded over 'data' from this host's data.

    Single-process: a plain sharded device_put of the full batch.
    Multi-process: `batch` holds only this host's contiguous slice of the
    global batch (see data/loader.py) and
    `jax.make_array_from_process_local_data` assembles the global array —
    the TPU-native replacement for the reference's per-rank DDP loaders
    (reference train.py:93-112)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
