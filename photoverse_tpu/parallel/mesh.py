"""GSPMD mesh + shardings for data-parallel PhotoVerse training.

Replaces the reference's HF Accelerate / torch.distributed DDP layer
(/root/reference/train.py:306-312,412-419,538; single_gpu.json) with the
TPU-native story: one `jax.sharding.Mesh` over the slice, batch arrays
sharded on the "data" axis, parameters replicated, and the gradient
all-reduce emitted by XLA from the sharding constraints (riding ICI within
a pod). Host-local data loading shards by `jax.process_index()`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "host_batch_slice",
    "zero1_sharding",
]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis sharded.

    Single-process: a plain sharded device_put. Multi-host (multi-controller
    JAX): `batch` holds only this process's rows (BatchLoader host_slice) and
    the global array is assembled from the per-process shards with
    `make_array_from_process_local_data` — no host ever materializes the
    full global batch, replacing the reference's DataLoader rank sharding
    (train.py:397-403)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def zero1_sharding(mesh: Mesh, tree):
    """ZeRO-1-style sharding spec for an optimizer-state pytree.

    Every array leaf whose leading dim divides over the data axis is sharded
    on that axis; scalars/odd shapes stay replicated. With params replicated
    and gradients reduced across the mesh, jit'ing the train step with the
    optimizer state in/out under this spec makes each device hold and
    update only its 1/N slice of the Adam moments (GSPMD inserts the
    required collectives) — the optimizer-memory story of ZeRO stage 1
    without a custom partitioner. Replaces nothing in the reference (which
    has no sharding at all); see SURVEY.md §5.8."""
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(x):
        shape = getattr(x, "shape", None)
        if shape and len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            return sharded
        return repl

    return jax.tree.map(spec, tree)


def host_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed batch (replaces DataLoader
    rank sharding; reference train.py:397-403 + accelerate ranks)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process count {n_proc}"
        )
    per = global_batch_size // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
