"""Pallas conv3x3 vs XLA conv at the SD UNet hot shapes + full UNet ablation.

Chained-iteration methodology (see bench_components.py): ITERS serialized
calls inside one jit, corrected for the ~26 ms dispatch round trip.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, dataclasses
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from photoverse_tpu.ops.pallas_conv import conv3x3_same, _xla_conv3x3
from photoverse_tpu.models.assembly import build_models, init_params

B = 16
ITERS = 10
DISPATCH = 0.026

def timed(name, fn, params, first, *rest, flops=None):
    def looped(params, first, *rest):
        def body(i, carry):
            delta = carry * 1e-20
            perturbed = jax.tree.map(
                lambda x: x + delta.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.inexact) else x, first)
            out = fn(params, perturbed, *rest)
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))
    f = jax.jit(looped)
    jax.block_until_ready(f(params, first, *rest))
    t0 = time.perf_counter()
    jax.block_until_ready(f(params, first, *rest))
    dt = (time.perf_counter() - t0 - DISPATCH) / ITERS
    tf = f" {flops/dt/1e12:6.1f} TFLOPs" if flops else ""
    print(f"{name:40s} {dt*1e3:8.2f} ms{tf}", flush=True)
    return dt

rng = np.random.RandomState(0)
# hot conv shapes: (H, C) at batch 16 — level 0/1/2 resnet convs
for H, C in ((64, 320), (32, 640), (16, 1280)):
    x = jnp.asarray(rng.randn(B, H, H, C) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
    fl = 2 * B * H * H * C * C * 9
    timed(f"xla conv {H}x{H}x{C}", lambda wp, xp: _xla_conv3x3(xp, wp), w, x, flops=fl)
    timed(f"pallas conv {H}x{H}x{C}", lambda wp, xp: conv3x3_same(xp, wp), w, x, flops=fl)
    for rt in (8, 32):
        timed(f"pallas conv {H}x{H}x{C} rt={rt}",
              lambda wp, xp, rt=rt: conv3x3_same(xp, wp, row_tile=rt), w, x, flops=fl)

# full UNet fwd ablation
for pal in (False, True):
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True)
    if pal:
        modules = dataclasses.replace(
            modules, unet=modules.unet.clone(config=dataclasses.replace(
                modules.unet.config, use_pallas_conv=True)))
    params = init_params(modules, jax.random.PRNGKey(0))
    lat = jnp.asarray(rng.randn(B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    tc = jnp.asarray(rng.randn(B, 77, 768), jnp.float32)
    ic = jnp.asarray(rng.randn(B, 5, 768), jnp.float32)
    timed(f"unet fwd pallas_conv={pal}",
          lambda p, l, *a: modules.unet.apply({"params": p}, l, *a)[0],
          params.unet, lat, t, tc, ic)
