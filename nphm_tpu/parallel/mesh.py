"""Device-mesh helpers.

The framework's parallelism model (cf. SURVEY.md section 2.3): the reference
is single-GPU, so the one real scaling axis is data parallelism —
over training batches and over query-point chunks at extraction/fitting time.
We express both through a 1-D ``jax.sharding.Mesh`` over all local devices;
XLA inserts the ICI collectives (psum for gradients, all-gather for logits).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_device_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
