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


def mesh_from_config(cfg, n_devices: Optional[int] = None) -> Mesh:
    """Build the device mesh from config: ``--mesh_shape`` overrides the
    data-axis width (1-axis only — DP is the reference's parity scope,
    SURVEY section 2.3), ``--data_axis`` names the axis.  ``n_devices``
    is the caller's default width (None = all devices).
    """
    if cfg.mesh_shape:
        if len(cfg.mesh_shape) != 1:
            raise ValueError(
                "only 1-axis (data-parallel) meshes are supported; got "
                f"mesh_shape={tuple(cfg.mesh_shape)}")
        w = int(cfg.mesh_shape[0])
        avail = len(jax.devices())
        if w > avail:
            raise ValueError(f"mesh_shape={w} exceeds the {avail} "
                             "available devices")
        if jax.process_count() > 1 and w != avail:
            raise ValueError("multi-host jobs must span every device "
                             f"(mesh_shape={w}, devices={avail}): all "
                             "processes participate in every SPMD program")
        n_devices = w
    return make_mesh(n_devices, cfg.data_axis)


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
