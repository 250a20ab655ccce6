"""Tensor parallelism for the dual-conditioned UNet (GSPMD, Megatron-style).

The reference has no model parallelism at all (single-GPU DDP via
accelerate, /root/reference/train.py:306-312); this module is the
TPU-native extension that lets one *image* be served by several chips,
which data parallelism cannot do (DP only helps batch>=n_devices).

Design — annotate, don't rewrite:

  The UNet's transformer stacks carry most of its matmul FLOPs. We shard
  their weights Megatron-style over a "model" mesh axis and let GSPMD's
  sharding propagation derive every activation sharding and insert the
  collectives (riding ICI):

    * attn1/attn2 to_q, to_k, to_v, to_k_ip, to_v_ip  -> column-parallel
      (output features sharded). The (B, S, C) -> (B, S, H, d) head
      reshape propagates this to a heads-sharded attention: each chip
      computes H/tp full heads locally, softmax included — zero
      communication inside the attention itself.
    * attn1/attn2 to_out and ff_out                   -> row-parallel
      (input features sharded); GSPMD emits one psum per layer to
      rebuild the replicated residual stream, exactly Megatron's g/f
      operators.
    * ff_proj (GEGLU up-projection)                   -> column-parallel;
      with UNetConfig.tp_friendly_ffn the value/gate halves are computed
      as two weight-slice matmuls so both halves stay cleanly sharded
      (the fused kernel + activation split would force GSPMD to reshard
      a (B, S, 8C) activation inside the denoise scan).
    * LoRA: lora_B column-parallel next to its base projection, lora_A
      replicated (rank << width; sharding the rank dim would turn two
      thin matmuls into collectives for no memory win).
    * Everything else (convs, resnets, norms, time embedding, CLIP, VAE)
      stays replicated: GroupNorm statistics span whole channel groups
      and the down/up skip concatenations re-mix channels, so channel-
      sharding the conv stack buys collectives, not speedup. For latency
      scaling of the conv stack use spatial sharding (parallel/sp.py),
      which composes with TP on a 2-D mesh.

Requirements: tp must divide num_heads (8 for SD-1.5, so tp in {2,4,8}).
The flash fast path survives TP via the shard_map wrapper in
parallel/flash.py (heads are sharded, so every device runs the unmodified
Pallas kernel on its local heads — zero attention-internal comms); the
fused block-tail kernel has no sharded wrapper and stays off.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from photoverse_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS",
    "make_mesh_2d",
    "unet_tp_spec",
    "unet_tp_shardings",
    "bundle_tp_shardings",
    "tree_tp_shardings",
    "validate_tp",
]

MODEL_AXIS = "model"

# column-parallel projections: output features sharded (last kernel axis)
_COLUMN_PARENTS = frozenset(
    {"to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "ff_proj"}
)
# row-parallel projections: input features sharded (first kernel axis)
_ROW_PARENTS = frozenset({"to_out", "ff_out"})
# UNet transformer-block module names that host the sharded projections
_ATTN_SCOPES = ("attn1", "attn2")


def make_mesh_2d(
    dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """2-D ("data", "model") mesh: dp x tp devices.

    dp=None uses all available devices / tp. The model axis is innermost
    so TP collectives ride the fastest ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    if tp < 1:
        raise ValueError(f"tp must be >= 1, got {tp}")
    if dp is None:
        dp = len(devices) // tp
    need = dp * tp
    if need > len(devices) or need < 1:
        raise ValueError(
            f"mesh {dp}x{tp} needs {need} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def _segments(path) -> Tuple[str, ...]:
    """Flatten a tree_map_with_path key path into string segments.

    Handles flax dicts (DictKey per level), the flat ("unet", *path)
    tuple-keyed dicts of ckpt.partition_params (one DictKey holding the
    whole tuple), dataclass fields, and list indices (optax states).
    """
    out = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            key = k.key
            if isinstance(key, tuple):
                out.extend(str(s) for s in key)
            else:
                out.append(str(key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            out.append(str(k.name))
        elif isinstance(k, jax.tree_util.SequenceKey):
            out.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            out.append(str(k))
    return tuple(out)


def unet_tp_spec(segments: Sequence[str], ndim: int) -> P:
    """PartitionSpec for one UNet param leaf (path given as segments).

    The caller guarantees the path is inside the UNet tree (the VAE's
    mid-attention reuses the `to_q` names but must stay replicated).
    """
    segs = tuple(segments)
    if not segs or ndim == 0:
        return P()
    leaf = segs[-1]
    in_attn = any(s in _ATTN_SCOPES for s in segs)

    def col() -> P:
        return P(*([None] * (ndim - 1)), MODEL_AXIS)

    def row() -> P:
        return P(MODEL_AXIS, *([None] * (ndim - 1)))

    if leaf == "kernel" and ndim == 2:
        parent = segs[-2]
        # attn2's LoRA projections nest the base Dense one level deeper
        if parent == "base" and len(segs) >= 3:
            parent = segs[-3]
        if parent in ("ff_proj", "ff_out"):
            return col() if parent == "ff_proj" else row()
        if in_attn and parent in _COLUMN_PARENTS:
            return col()
        if in_attn and parent in _ROW_PARENTS:
            return row()
    elif leaf == "lora_B" and in_attn and ndim == 2:
        return col()
    elif leaf == "bias" and ndim == 1 and segs[-2] == "ff_proj":
        return P(MODEL_AXIS)
    return P()


def unet_tp_shardings(mesh: Mesh, unet_params):
    """NamedSharding tree for a UNet param tree (TP specs, rest replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh, unet_tp_spec(_segments(path), getattr(x, "ndim", 0))
        ),
        unet_params,
    )


def bundle_tp_shardings(mesh: Mesh, params):
    """Shardings for a full PhotoVerseParams bundle: UNet TP-sharded,
    CLIP/VAE/adapters replicated (conditioning is <5% of generate time)."""
    import dataclasses

    repl = NamedSharding(mesh, P())
    fields = {}
    for f in dataclasses.fields(params):
        tree = getattr(params, f.name)
        if f.name == "unet":
            fields[f.name] = unet_tp_shardings(mesh, tree)
        else:
            fields[f.name] = jax.tree.map(lambda _: repl, tree)
    return type(params)(**fields)


def tree_tp_shardings(mesh: Mesh, tree):
    """Shardings for any tree whose leaf paths embed UNet param paths —
    the trainable/frozen flat dicts (keys ("unet", *path)) and optax
    states built over them. Non-UNet-scoped leaves stay replicated."""

    def spec(path, x):
        segs = _segments(path)
        if "unet" in segs:
            sub = segs[segs.index("unet") + 1 :]
            return NamedSharding(
                mesh, unet_tp_spec(sub, getattr(x, "ndim", 0))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def validate_tp(unet_config, tp: int) -> None:
    """tp must divide the head count (head-sharded attention) — and
    therefore every sharded projection width."""
    if tp <= 1:
        return
    if unet_config.num_heads % tp:
        raise ValueError(
            f"tensor_parallel={tp} must divide num_heads="
            f"{unet_config.num_heads}"
        )
    if unet_config.use_flash_attention and unet_config.flash_fn is None:
        raise ValueError(
            "tensor parallelism needs the shard_map-wrapped flash kernel "
            "(parallel.flash.enable_sharded_flash) or the jnp attention "
            "path — the bare Pallas kernel is a single-device custom call "
            "GSPMD cannot shard"
        )
    if unet_config.fused_blocks:
        raise ValueError(
            "tensor parallelism requires fused_blocks off (the fused "
            "block-tail kernel has no sharded wrapper)"
        )
