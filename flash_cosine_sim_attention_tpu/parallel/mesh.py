"""Device-mesh helpers for multi-chip / multi-host runs.

New capability vs the reference (which has no distributed code at all —
SURVEY.md §2.3): a 2-D (data, model) mesh where the model axis shards
attention heads / MLP hidden over ICI and the data axis shards the batch
(over DCN for multi-host).  Collectives are inserted by GSPMD from
NamedSharding annotations; the Pallas kernels run per-shard inside
``shard_map``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    ``model_parallel`` defaults to min(n, 8) capped by the head count of
    typical configs; multi-host runs should keep the model axis within a
    host's ICI domain and let the data axis span DCN (jax orders
    ``devices`` so that nearby devices are ICI-adjacent).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = min(n, 8)
        while n % model_parallel != 0:
            model_parallel -= 1
    assert n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
