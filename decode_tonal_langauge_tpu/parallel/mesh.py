"""Device-mesh construction and sharding helpers.

New first-class component with no reference counterpart (the reference is
strictly single-device; SURVEY.md §2.7): data parallelism over
trials/seeds/subjects and model parallelism over wide dense layers ride a
``jax.sharding.Mesh``, with XLA inserting the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Mesh over the first ``n_devices`` devices.

    With one axis the mesh is (n,); with two and no explicit shape, the
    model axis gets the largest power-of-two factor <= 2 to keep DP wide.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]

    if shape is None:
        if len(axis_names) == 1:
            shape = (n_devices,)
        elif len(axis_names) == 2:
            model = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
            shape = (n_devices // model, model)
        else:
            raise ValueError("provide an explicit shape for >2 mesh axes")

    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def mesh_from_config(parallel_cfg) -> Optional[Mesh]:
    """Build a mesh from a config ``parallel:`` section (or return None).

    Supersedes the reference's single-device knob
    (``/root/reference/CONFIG.md:88``, ``device: cpu/cuda:0``) with a
    declarative mesh spec::

        parallel:
          data: 8        # devices on the data axis; 'auto' = all / model
          model: 1       # optional model axis (sharded dense heads)

    ``parallel: auto`` (the bare string) is shorthand for
    ``{data: auto}``. Returns ``None`` (single-device layout) when the
    section is absent/empty or resolves to one device. Multi-process
    runtimes get a mesh over every process's devices (the data axis
    spans hosts)."""
    if not parallel_cfg:
        return None
    if parallel_cfg == "auto" or parallel_cfg is True:
        parallel_cfg = {"data": "auto"}
    if not isinstance(parallel_cfg, dict):
        raise ValueError(
            f"parallel: section must be a mapping or 'auto', got {parallel_cfg!r}"
        )
    model = int(parallel_cfg.get("model", 1))
    data = parallel_cfg.get("data", "auto")
    n_avail = len(jax.devices())
    if data in ("auto", None):
        data = max(1, n_avail // model)
    data = int(data)
    if data * model > n_avail:
        raise ValueError(
            f"parallel: requested {data}x{model} devices but only "
            f"{n_avail} are visible"
        )
    if data * model == 1:
        return None
    if jax.process_count() > 1:
        from .distributed import global_mesh

        if data * model != n_avail:
            # A cross-host mesh must span every global device (lockstep
            # SPMD); a partial mesh would reshape-crash deep inside
            # global_mesh with an opaque error.
            raise ValueError(
                f"parallel: a multi-process mesh must use all "
                f"{n_avail} global devices; got data={data} x "
                f"model={model}. Set data: auto or match the device "
                f"count."
            )
        if model == 1:
            return global_mesh(("data",), (data,))
        return global_mesh(("data", "model"), (data, model))
    if model == 1:
        return make_mesh(data, axis_names=("data",))
    return make_mesh(data * model, axis_names=("data", "model"), shape=(data, model))


def global_device_put(arr, sharding: NamedSharding):
    """``device_put`` that also works on cross-host meshes.

    Single-process: plain ``device_put``. Multi-process (every host holds
    the full host-local copy of ``arr``, lockstep SPMD): each process
    contributes only its addressable shards via
    ``make_array_from_callback`` — a plain device_put would try to write
    other hosts' devices and fail."""
    if jax.process_count() <= 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch_global(arr) -> np.ndarray:
    """Device array -> host numpy, valid on cross-host meshes.

    ``np.asarray`` on an array with shards on other hosts raises
    (non-addressable); gather the global value first."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    """Place ``arr`` with its leading dim sharded over ``axis``."""
    spec = P(axis, *([None] * (np.ndim(arr) - 1)))
    return global_device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: global_device_put(x, sharding), tree
    )


def batch_spec(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


class DataParallelLayout:
    """Shared DP layout for the trainers: per-batch sample axis of the
    scanned (n_batches, B, ...) stacks sharded over ``data``, everything
    else replicated. ``None`` mesh degrades to a no-op single-device
    layout so trainers need no branching."""

    def __init__(self, mesh: Optional[Mesh], axis: str = "data"):
        self.mesh = mesh
        self.dp = int(mesh.shape[axis]) if mesh is not None else 1
        self._axis = axis
        self._replicated = (
            NamedSharding(mesh, P()) if mesh is not None else None
        )

    def round_batch(self, batch_size: int) -> int:
        """Round up so each scanned batch splits evenly over ``data``."""
        return -(-batch_size // self.dp) * self.dp

    def stack_sharding(self, ndim: int) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(
            self.mesh, P(None, self._axis, *([None] * (ndim - 2)))
        )

    def place_stacks(self, *stacks):
        """Device-put batch stacks with the per-batch axis sharded."""
        if self.mesh is None:
            return stacks
        return tuple(
            global_device_put(s, self.stack_sharding(np.ndim(s)))
            for s in stacks
        )

    def replicate_tree(self, tree):
        """Fully replicate a pytree (params/opt state) across the mesh."""
        if self.mesh is None:
            return tree
        return jax.tree_util.tree_map(
            lambda leaf: global_device_put(leaf, self._replicated), tree
        )

    def constrain_stack(self, arr):
        """`with_sharding_constraint` form of :meth:`stack_sharding` for
        use inside jit."""
        if self.mesh is None:
            return arr
        return jax.lax.with_sharding_constraint(
            arr, self.stack_sharding(arr.ndim)
        )

    # Static-config identity so trainers hashing by config can include
    # the layout without breaking jit cache sharing.
    def __hash__(self):
        return hash((self.mesh, self._axis))

    def __eq__(self, other):
        return (
            isinstance(other, DataParallelLayout)
            and self.mesh == other.mesh
            and self._axis == other._axis
        )
