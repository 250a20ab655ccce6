"""FSDP / ZeRO-3-style parameter sharding over the data axis (GSPMD).

The reference has no parameter sharding of any kind (single-GPU DDP via
accelerate, /root/reference/train.py:306-312); this is the TPU-native
memory story for training on small-HBM chips: every parameter tree —
the frozen SD backbone (~5 GB f32), the trainable partition, and the
optimizer state — is sharded over the *data* axis, and XLA's SPMD
partitioner inserts the all-gathers where a weight is consumed and
reduce-scatters the gradients, exactly the ZeRO-3 schedule, derived
from sharding annotations instead of hand-written bucketing.

Mechanics: for each array leaf we shard the LARGEST dimension divisible
by the data-axis size (leaves smaller than `min_size` elements stay
replicated — gathering a 768-float bias per layer costs more latency
than the bytes it saves). Composes with tensor parallelism
(parallel/tp.py): pass the TP sharding tree as `base` and FSDP picks a
dimension the model axis does not already occupy, yielding 2-D-sharded
weights where both apply.

Memory per chip at SD-1.5 training scale (dp=8): frozen f32 backbone
5.1 GB -> 0.64 GB, Adam moments and trainable likewise /8 — enough to
lift the v5e-16GB micro-batch past 8 (PERFORMANCE.md: batch 16 was a
26 GB OOM with everything replicated).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from photoverse_tpu.parallel.mesh import DATA_AXIS

__all__ = ["fsdp_spec", "fsdp_shardings", "MIN_SHARD_SIZE"]

# leaves below this many elements stay replicated: the per-use all-gather
# latency of a tiny tensor exceeds the HBM it would free
MIN_SHARD_SIZE = 2**16


def fsdp_spec(shape, n: int, base: P = P(), min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec sharding the largest free dim of `shape` over the data
    axis; `base` (e.g. a TP spec from parallel/tp.unet_tp_spec) is preserved
    and never double-sharded. Returns `base` unchanged when no dim divides
    by `n` or the leaf is below `min_size` elements."""
    if n <= 1 or not shape:
        return base
    if math.prod(shape) < min_size:
        return base
    entries = list(base) + [None] * (len(shape) - len(base))
    if DATA_AXIS in entries:  # caller already sharded it over data
        return base
    for i in sorted(range(len(shape)), key=lambda j: -shape[j]):
        if entries[i] is None and shape[i] % n == 0 and shape[i] >= n:
            entries[i] = DATA_AXIS
            while entries and entries[-1] is None:  # canonical: no trailing None
                entries.pop()
            return P(*entries)
    return base


def fsdp_shardings(
    mesh: Mesh,
    tree,
    base=None,
    min_size: int = MIN_SHARD_SIZE,
):
    """NamedSharding tree for any param/optimizer pytree.

    `base` is an optional tree of NamedShardings (same structure) whose
    specs are kept and extended — pass parallel/tp.tree_tp_shardings output
    to compose FSDP with tensor parallelism on a 2-D mesh."""
    n = mesh.shape[DATA_AXIS]

    def leaf(x, b: Optional[NamedSharding]):
        spec = b.spec if b is not None else P()
        return NamedSharding(
            mesh, fsdp_spec(getattr(x, "shape", ()), n, spec, min_size)
        )

    if base is None:
        return jax.tree.map(lambda x: leaf(x, None), tree)
    return jax.tree.map(leaf, tree, base)
