"""Pipeline component breakdown on TPU.

Methodology (round-2 revision — see PERFORMANCE.md "Round 2 findings"):
the relay caches repeat executions on identical buffers and
block_until_ready resolves on ACK, so each timed call perturbs the input
with a fresh scalar AND fetches a value; iterations chain in-graph so
nothing folds away. The old 26 ms dispatch correction is obsolete
(loopback relay). Params are passed as arguments (never closed over —
closure params become multi-GB executable constants).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.models.assembly import build_models, init_params

B = 16
ITERS = 10
TRIALS = 3


def timed(name, fn, params, first, *rest):
    def looped(s, params, first, *rest):
        def body(i, carry):
            delta = carry * 1e-20 + s
            perturbed = jax.tree.map(
                lambda x: x + delta.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.inexact)
                else x,
                first,
            )
            out = fn(params, perturbed, *rest)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    f = jax.jit(looped)
    float(f(jnp.float32(0), params, first, *rest))  # warm; value fetch syncs
    best = 1e9
    for t in range(TRIALS):
        s = jnp.float32(1e-7 * (t + 1))  # fresh operand defeats result cache
        t0 = time.perf_counter()
        float(f(s, params, first, *rest))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:28s} {best*1e3:8.2f} ms/call", flush=True)
    return best


def main():
    modules = build_models(
        dtype=jnp.bfloat16, fast_attention_scores=True, use_flash_attention=True
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)

    lat = jnp.asarray(rng.randn(B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    tc = jnp.asarray(rng.randn(B, 77, 768), jnp.float32)
    ic = jnp.asarray(rng.randn(B, 5, 768), jnp.float32)
    t_unet = timed(
        "unet fwd",
        lambda p, l, *a: modules.unet.apply({"params": p}, l, *a)[0],
        params.unet, lat, t, tc, ic,
    )

    z = jnp.asarray(rng.randn(B, 64, 64, 4), jnp.float32)
    t_vae = timed(
        "vae decode",
        lambda p, z: modules.vae.apply({"params": p}, z, method="decode"),
        params.vae, z,
    )

    px = jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32)
    t_vis = timed(
        "clip vision (5 layers out)",
        lambda p, x: modules.vision_encoder.apply(
            {"params": p}, x, collect_layers=(4, 8, 12, 16)
        )[0],
        params.vision_encoder, px,
    )

    total = 50 * t_unet + t_vae + 2 * t_vis
    print(f"\nmodeled 50-step pipeline: {total:.3f} s -> {B/total:.2f} imgs/s")


if __name__ == "__main__":
    main()
