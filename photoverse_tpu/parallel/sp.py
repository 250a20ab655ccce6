"""Spatial (sequence) parallelism for diffusion sampling — GSPMD patch
parallelism.

The reference cannot split one image across GPUs at all; this is the
TPU-native answer to batch-1 serving latency (same goal as DistriFusion /
xDiT patch parallelism, reached the GSPMD way: annotate one tensor, let
the compiler derive the rest).

We shard the latent *height* over the "model" mesh axis and constrain the
denoise scan carry to that sharding. XLA's SPMD partitioner then:

  * spatially partitions every conv with automatic halo exchange
    (3x3 convs exchange one latent row with each neighbor per layer —
    a few KB riding ICI),
  * keeps all elementwise/norm work local (GroupNorm statistics become a
    psum of per-shard partial moments),
  * runs attention with sharded queries and all-gathered K/V: each chip
    attends its own S/n query rows against the full key set — the
    standard sequence-parallel attention decomposition,
  * spatially partitions the VAE decoder the same way (the 512x512
    decode is ~15% of generate wall-clock at batch 16 and fully
    serial under DP at batch 1).

Composes with data parallelism on a 2-D ("data", "model") mesh
(parallel/tp.make_mesh_2d): batch over "data", height over "model".
Unlike tensor parallelism there are NO parameter-divisibility
constraints — params stay replicated; the spatial axis must divide the
latent height AT THE DEEPEST PYRAMID LEVEL (SD-1.5 at 512px: 64 latent
rows through 3 downsamples -> 8 rows at the bottom, so sp in {2,4,8};
validate_sp enforces this).

The flash fast path survives SP via the shard_map wrapper in
parallel/flash.py (local query rows against all-gathered K/V — the
standard sequence-parallel attention decomposition); the fused
block-tail kernel has no sharded wrapper and stays off
(parallel/tp.validate_tp, validate_sp below).
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from photoverse_tpu.parallel.mesh import DATA_AXIS
from photoverse_tpu.parallel.tp import MODEL_AXIS

__all__ = ["latent_spatial_sharding", "validate_sp"]


def latent_spatial_sharding(
    mesh: Mesh,
    batch_axis: str = DATA_AXIS,
    spatial_axis: str = MODEL_AXIS,
) -> NamedSharding:
    """Sharding for (B, H, W, C) latents/images: batch over the data axis,
    height over the model axis. Pass to engine.denoise/run_inference as
    `latent_sharding`."""
    return NamedSharding(mesh, P(batch_axis, spatial_axis))


def validate_sp(unet_config, latent_size: int, sp: int) -> None:
    """The sharded height must stay divisible through every down level
    (GSPMD would still be correct with ragged shards, but even shards keep
    the halo exchange balanced), and the Pallas single-device kernels must
    be off."""
    if sp <= 1:
        return
    min_h = latent_size // (2 ** (len(unet_config.block_out_channels) - 1))
    if min_h % sp:
        raise ValueError(
            f"spatial axis {sp} must divide the deepest latent height "
            f"{min_h} (latent {latent_size}, "
            f"{len(unet_config.block_out_channels) - 1} downsamples)"
        )
    if unet_config.use_flash_attention and unet_config.flash_fn is None:
        raise ValueError(
            "spatial parallelism needs the shard_map-wrapped flash kernel "
            "(parallel.flash.enable_sharded_flash) or the jnp attention "
            "path — the bare Pallas kernel is a single-device custom call "
            "GSPMD cannot shard"
        )
    if unet_config.fused_blocks:
        raise ValueError(
            "spatial parallelism requires fused_blocks off (the fused "
            "block-tail kernel has no sharded wrapper)"
        )
