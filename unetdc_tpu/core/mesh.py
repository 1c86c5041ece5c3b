"""Device mesh and sharding helpers.

The reference has no parallelism of any kind (verified — SURVEY.md §2.7); the
TPU-native scaling story for this workload is:

- ``data`` axis: batch data parallelism for training and batch inference.
- ``space`` axis: spatial partitioning of the image height dimension. XLA's
  SPMD partitioner handles convolution halo exchange automatically, so a
  512x512 (or larger) image can be split across chips with collectives over
  ICI rather than any hand-written NCCL/MPI (the reference has none either).

All entry points take a mesh; a 1-device mesh degenerates to single-chip
execution with zero overhead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data','space') mesh over the available devices.

    Defaults to all devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_space
    need = n_data * n_space
    if need > n_total or need == 0:
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {need} devices, "
            f"have {n_total}")
    dev_array = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(dev_array, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, space_dim: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over 'data' and optionally one spatial dim over 'space'.

    For NHWC image batches pass ``space_dim=1`` (height).
    """
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if space_dim is not None and mesh.shape[SPACE_AXIS] > 1:
        spec[space_dim] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def chunk_sharding(mesh: Mesh, ndim: int,
                   space_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for scan-chunked batches (K, B, ...): dim 0 is the scan
    axis (unsharded), dim 1 the batch over 'data', and optionally one
    spatial dim over 'space'."""
    spec = [None] * ndim
    spec[1] = DATA_AXIS
    if space_dim is not None and mesh.shape[SPACE_AXIS] > 1:
        spec[space_dim] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, space_dim: Optional[int] = None):
    """Device-put an array with batch (+ optional spatial) sharding."""
    return jax.device_put(x, batch_sharding(mesh, x.ndim, space_dim))


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
