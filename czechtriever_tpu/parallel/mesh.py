"""Device mesh + multi-host runtime setup.

TPU-native replacement for the reference's L0 distributed runtime
(/root/reference/src/dist_utils.py, src/slurm.py): instead of
torchrun/NCCL process groups we build a ``jax.sharding.Mesh`` with a
``data`` axis (DP + contrastive negative sharing) and a ``model`` axis
(tensor parallelism, a capability the reference lacks). Collectives are
then inserted by XLA from sharding annotations — there is no hand-written
all_gather/all_reduce anywhere in the training path.

Multi-host init goes through ``jax.distributed.initialize``; SLURM
environments are auto-detected by jax itself (replacing the env-var
translation in src/slurm.py:51-74).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host jax if running under a launcher.

    Safe to call unconditionally: single-process runs are a no-op
    (replacing the single-GPU fallback at src/slurm.py:89-93).
    """
    in_multiproc = (coordinator_address is not None
                    or "COORDINATOR_ADDRESS" in os.environ
                    # SLURM: >1 task counts even on a single node (the
                    # reference's one-process-per-GPU layout,
                    # src/slurm.py:51-74); jax's SlurmCluster then parses
                    # SLURM_PROCID/NTASKS/STEP_NODELIST itself
                    or int(os.environ.get("SLURM_NTASKS", "1")) > 1
                    or int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1)
    if not in_multiproc:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception as e:  # already initialized or single-host
        logger.warning("jax.distributed.initialize skipped: %s", e)


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, (
        f"mesh {data}x{model} != {n} available devices")
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# --- sharding helpers -------------------------------------------------------

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def microbatch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """[accum, batch, ...]: shard the *second* dim over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch dim over data axis."""
    return {k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()}


def shard_microbatches(mesh: Mesh, batch: dict) -> dict:
    return {k: jax.device_put(v, microbatch_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()}


def data_feed_info(mesh: Mesh):
    """Which disjoint slice of the global batch THIS process must build.

    Returns ``(feed_id, num_feeds, n_local_coords)``: processes owning
    the same set of data-axis coordinates (a ``model`` axis spanning
    hosts, the TP-teacher layout) form one *feed group* and must build
    IDENTICAL local rows; distinct groups build disjoint row blocks.
    Pure DP degenerates to ``(process_index, process_count,
    data_size / process_count)``. Single process: ``(0, 1, data_size)``.

    This is the key to per-process batch construction
    (``global_from_local_microbatches``): the reference reaches the same
    split with DistributedSampler (/root/reference/train.py:187-193);
    building the full global batch on every host instead wastes
    (pcount-1)/pcount of all crop/augment/pad work and shrinks per-epoch
    shard coverage by pcount.
    """
    devs = mesh.devices
    if devs.ndim == 1:
        devs = devs[:, None]
    proc_coords = {}
    for di in range(devs.shape[0]):
        for mi in range(devs.shape[1]):
            p = devs[di, mi].process_index
            proc_coords.setdefault(p, set()).add(di)
    groups = {}
    for p in sorted(proc_coords):
        key = frozenset(proc_coords[p])
        if key not in groups:
            groups[key] = len(groups)
    mine = sorted(proc_coords[jax.process_index()])
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous data "
            f"coords {mine}; per-process feeding needs a contiguous "
            "device-to-process layout (reorder the mesh or feed global "
            "batches)")
    # feed ids follow data-axis order so row blocks stay contiguous
    ordered = sorted(groups, key=lambda k: min(k))
    feed_of = {k: i for i, k in enumerate(ordered)}
    return (feed_of[frozenset(mine)], len(groups), len(mine))


def global_from_local_microbatches(mesh: Mesh, batch: dict) -> dict:
    """Assemble global ``[A, B_global, ...]`` microbatch arrays from each
    process's LOCAL rows ``[A, B_local, ...]`` without replicating host
    work (``jax.make_array_from_process_local_data``; the sharding is the
    same ``P(None, 'data', ...)`` the global path uses, so the jitted
    step sees identical types either way)."""
    def put(v):
        sharding = microbatch_sharding(mesh, np.ndim(v))
        return jax.make_array_from_process_local_data(sharding, v)
    return {k: put(v) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, queue, opt state)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def host_safe(tree):
    """Make a pytree of (possibly global-mesh) arrays usable from
    per-process host code — the eval paths encode rank-split text shards
    on a LOCAL mesh, and ``jax.device_put`` of a global-mesh array onto
    local devices is a cross-host transfer JAX rejects.

    Host leaves and fully-addressable device leaves pass through
    untouched (no copy); fully-replicated global leaves fetch their
    local shard (``np.asarray`` is legal there); process-spanning
    sharded leaves (a TP-sharded encoder over a multi-host ``model``
    axis) are gathered with ``multihost_utils.process_allgather``."""
    def pull(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return x
        if x.is_fully_replicated:
            return np.asarray(x)
        from jax.experimental import multihost_utils
        # tiled=True: the global array's shards re-assemble in place
        # (stacking is for host-local per-process values)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.tree.map(pull, tree)


# --- process helpers (reference is_main/rank/world_size,
#     src/dist_utils.py:77-102) ---------------------------------------------

def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main() -> bool:
    return jax.process_index() == 0


def local_mesh(model: int = 1) -> Mesh:
    """A (data, model) mesh over THIS process's addressable devices only.

    Multi-process evaluation encodes rank-split text shards locally
    (the reference splits BEIR query/corpus encoding across ranks,
    /root/reference/src/beir_utils.py:52-58,93-99); a global mesh would
    force every host batch through cross-process collectives just to
    run an embarrassingly parallel encode."""
    return make_mesh(model=model, devices=jax.local_devices())


def allgather_host_rows(parts: np.ndarray) -> list:
    """Gather a variable-row host array from every process; returns the
    per-process arrays in process order. The JAX analogue of the
    reference's varsize_all_gather (src/dist_utils.py:17-45): pad to
    the max row count, allgather, slice back.

    Single-process: returns [parts] untouched (no device round-trip).
    """
    if jax.process_count() == 1:
        return [np.asarray(parts)]
    from jax.experimental import multihost_utils

    parts = np.ascontiguousarray(parts)
    n = np.asarray([parts.shape[0]], np.int32)
    counts = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    m = int(counts.max())
    if m > parts.shape[0]:
        pad = np.zeros((m - parts.shape[0],) + parts.shape[1:], parts.dtype)
        parts = np.concatenate([parts, pad], axis=0)
    gathered = np.asarray(multihost_utils.process_allgather(parts))
    return [gathered[i, :counts[i]] for i in range(len(counts))]
