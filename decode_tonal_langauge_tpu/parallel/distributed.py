"""Multi-host runtime: `jax.distributed` bootstrap + host-sharded ingestion.

New first-class component with no reference counterpart (the reference is
strictly single-process; SURVEY.md §2.7/§5). Design:

- every host runs the same program; :func:`initialize` wires the
  processes into one JAX runtime (collectives ride ICI within a slice,
  DCN across hosts);
- *data* is sharded at the host level: each process loads only its share
  of subjects/blocks/files (:func:`host_shard`), while device-level
  sharding inside each host stays the mesh/`data`-axis story of
  ``parallel/mesh.py``;
- :func:`global_mesh` builds a mesh over every device of every process.

Single-process behavior is the identity (no coordinator needed), so the
same pipeline configs run unchanged from a laptop to a pod slice.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise the multi-process JAX runtime if configured.

    Returns True when a multi-process runtime is active afterwards.
    Activation requires an explicit ``coordinator_address`` argument or
    the ``JAX_COORDINATOR_ADDRESS`` environment variable; with neither,
    this is a no-op returning False — the single-host path. (Called by
    the pipeline runner at startup, so multi-host launches only need the
    env var set on each host.)
    """
    # Probe WITHOUT touching the backend: jax.process_count() would
    # initialise XLA, after which jax.distributed.initialize refuses to
    # run (caught by tests/test_distributed_multiprocess.py).
    if jax.distributed.is_initialized():
        return jax.process_count() > 1

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit:
        return False

    # jax.distributed.initialize only auto-reads JAX_COORDINATOR_ADDRESS
    # from the environment; outside a recognised cluster (SLURM etc.) it
    # then demands explicit num_processes/process_id. Honor the matching
    # env vars so "set three env vars per host" is a complete launch
    # recipe, as the pipeline docs promise.
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def host_shard(
    items: Sequence[T],
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[T]:
    """This process's share of a host-level work list.

    Deterministic round-robin by index so every process computes the same
    assignment without communication: process p takes items p, p+P, ...
    Order within the shard follows the input order.
    """
    if process_id is None:
        process_id = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if not 0 <= process_id < process_count:
        raise ValueError(
            f"process_id {process_id} out of range for {process_count} processes"
        )
    return list(items[process_id::process_count])


def global_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
):
    """Mesh over ALL devices (every process's chips).

    With one axis: (total_devices,). With two axes and no shape, the
    ``data`` axis spans hosts (DCN) and the second axis the devices
    within a host (ICI) — gradients psum over fast links first.
    """
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    if shape is None:
        if len(axis_names) == 1:
            shape = (len(devices),)
        elif len(axis_names) == 2:
            local = jax.local_device_count()
            shape = (len(devices) // local, local)
        else:
            raise ValueError("provide an explicit shape for >2 mesh axes")
    return Mesh(np.asarray(devices).reshape(tuple(shape)), tuple(axis_names))


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (multi-host only)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
