"""Mesh construction and sharding helpers (TPU ICI data parallelism).

Replaces the reference's ``torch.nn.DataParallel(netWrapper,
device_ids=range(num_gpus))`` (``main.py:661``): a 1-axis ``Mesh`` over all
local devices, params replicated, batch tensors sharded along dim 0.  Under
``jax.jit`` the loss/grad means become ICI ``psum``s inserted by XLA — no
explicit collectives needed (multi-host DCN is out of scope for parity but
the mesh abstraction extends to it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    # sort by owning process so each process's devices form one contiguous
    # block of the data axis — parallel/distributed.py relies on this to
    # map a process's host rows to one contiguous global-batch slice
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """device_put every leaf with batch dim 0 sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
