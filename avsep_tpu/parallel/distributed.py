"""Multi-host (DCN) data parallelism.

The reference never exceeds one host — its only parallelism is
single-process ``torch.nn.DataParallel`` (reference ``main.py:661``,
SURVEY.md §2.3) — so this module is beyond-parity scale-out: the same
1-axis data mesh extended across hosts with ``jax.distributed``.  The
SPMD train/eval programs are unchanged; only three seams know about
processes:

* **initialization** — :func:`maybe_initialize` wires
  ``jax.distributed.initialize`` from CLI flags before the first backend
  lookup, after which ``jax.devices()`` is the global device list and
  ``parallel.mesh.make_mesh`` builds a global mesh (devices ordered by
  owning process, so each process's rows are one contiguous block of the
  batch axis).
* **batch formation** — :func:`device_put_global` turns per-process host
  batches into globally-sharded ``jax.Array``s:

  - ``replicate`` mode: every process runs an identical deterministic
    loader (the datasets are deterministic per index and the loaders are
    order-preserving, data/loader.py), holds the FULL global batch, and
    ships only the rows its own devices own.  Global batch content is
    bit-identical to the single-process run — host work is replicated,
    device work is divided.  Right for host-cheap pipelines and for
    validating multi-host numerics.
  - ``shard`` mode: every process loads only ``batch/P`` rows from a
    DISJOINT 1/P partition of the dataset (``data.loader.ShardDataset``
    stride view) — host work divides too, every sample appears once per
    global epoch, and a global batch never repeats a sample.  The batch
    sequence differs from (but is statistically equivalent to) the
    1-process run's.

* **host-side readback** — :func:`fetch` replaces ``jax.device_get`` for
  trees that may contain non-addressable (cross-host sharded) arrays,
  all-gathering them to every host; scalars/replicated arrays pass
  through.  File writes (history, results.csv, checkpoints, media) are
  gated to the primary process via :func:`is_primary`.

Checkpoints: EVERY process must call ``checkpoint.save_checkpoint`` —
the orbax save synchronizes across processes internally, so a
primary-only call deadlocks the job (measured; see checkpoint.py).
device_get of the replicated TrainState is local per process; orbax
coordinates so the host-resident checkpoint (restorable on any
topology) is written once.

Validated end-to-end by ``tests/test_multihost.py``: two CPU processes x
two virtual devices vs one process x four devices produce matching loss
trajectories and eval meters through the real CLI path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from avsep_tpu.parallel.mesh import batch_sharding


def maybe_initialize(cfg) -> None:
    """``jax.distributed.initialize`` from CLI flags (no-op when
    ``dist_nprocs`` <= 1 or already initialized).  Must run before the
    first ``jax.devices()`` call of the process — some transitive imports
    (orbax) touch the backend, so multi-host entry points call this
    before importing the rest of the package (see tests/test_multihost.py
    runner) and ``main()``'s own call becomes the idempotent no-op."""
    if int(getattr(cfg, "dist_nprocs", 1)) <= 1:
        return
    if jax.distributed.is_initialized():
        return
    if not cfg.dist_coordinator:
        raise ValueError("--dist_nprocs > 1 requires --dist_coordinator "
                         "host:port (the address of process 0)")
    jax.distributed.initialize(
        coordinator_address=cfg.dist_coordinator,
        num_processes=int(cfg.dist_nprocs),
        process_id=int(cfg.dist_procid))
    print(f"[dist] process {jax.process_index()}/{jax.process_count()} "
          f"up: {len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices")


def validate_global_batch(cfg) -> None:
    """Fail fast with clear errors on batch/device mismatches in
    multi-host jobs, instead of a silently floored per-process batch
    (build_loaders integer-divides) or a raw XLA sharding error at the
    first step.  No-op single-process.  Shared by main() and
    sop_main.main() so both CLIs validate identically."""
    if jax.process_count() <= 1:
        return
    n_dev = len(jax.devices())
    if cfg.batch_size % n_dev:
        raise ValueError(f"global batch {cfg.batch_size} must divide "
                         f"across {n_dev} devices")
    if cfg.dist_data == "shard" and cfg.batch_size % jax.process_count():
        raise ValueError("dist_data=shard needs batch_size divisible "
                         "by the process count")


def is_primary() -> bool:
    return jax.process_index() == 0


def is_multihost() -> bool:
    return jax.process_count() > 1


def _local_row_offset(sharding, gshape) -> int:
    """First global row owned by this process (device order in
    ``mesh.make_mesh`` groups each process's devices contiguously)."""
    amap = sharding.addressable_devices_indices_map(gshape)
    return min((idx[0].start or 0) for idx in amap.values())


def device_put_global(batch: dict, mesh, axis: str = "data",
                      mode: str = "replicate") -> dict:
    """Per-process host batch -> globally batch-sharded device arrays.

    ``replicate``: each process holds the full global batch; rows outside
    this process's shard are never copied to a device.  ``shard``: each
    process holds only its own ``rows/P`` block; the global batch is the
    process-ordered concatenation.
    """
    sh = batch_sharding(mesh, axis)
    P = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if mode == "replicate":
            gshape = x.shape
            lo = 0
        else:
            gshape = (x.shape[0] * P,) + x.shape[1:]
            lo = _local_row_offset(sh, gshape)
        return jax.make_array_from_callback(
            gshape, sh,
            lambda idx: x[(slice((idx[0].start or 0) - lo,
                                 (idx[0].stop if idx[0].stop is not None
                                  else gshape[0]) - lo),) + idx[1:]])

    return {k: put(v) for k, v in batch.items()}


def fetch(tree):
    """``jax.device_get`` that tolerates cross-host sharded arrays.

    Single-process: plain device_get.  Multi-host: non-fully-addressable
    arrays are all-gathered to every process (collective — every process
    must call this on the same tree), everything else device_gets
    locally."""
    if not is_multihost():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(get, tree)
