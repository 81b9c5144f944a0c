"""Device-mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP runtime (reference:
src/train/cli/train_v33_ddp.py:105-120 setup_distributed / DDP wrap /
DistributedSampler) with a ``jax.sharding.Mesh``: parameters are replicated,
batches are sharded on the ``data`` axis, and gradient reduction is a single
``psum`` per optimizer step over ICI — strictly better than the reference's
per-micro-batch all-reduce (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int = -1,
    data_axis: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over all (or the first ``num_data``) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data and num_data > 0:
        if num_data > len(devices):
            raise ValueError(f"requested {num_data} devices, have {len(devices)}")
        devices = devices[:num_data]
    return Mesh(np.asarray(devices), (data_axis,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard a batch array's ``axis`` over the data mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


