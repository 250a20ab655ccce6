"""Pipeline component breakdown on TPU, with in-graph repetition so the
tunnel's per-dispatch latency doesn't pollute the numbers.

Times (per call): UNet fwd (the 50x hot op), VAE decode, CLIP vision,
CLIP text, adapters — at bench.py's batch and SD scale.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.models.assembly import build_models, init_params

B = 4
ITERS = 20


def timed(name, make_fn, *args):
    """make_fn(params, *args) -> out; loop ITERS times inside one jit."""

    def looped(params, *a):
        def body(i, carry):
            # serialize iterations: the input is perturbed by the previous
            # iteration's output, so nothing can be hoisted or folded
            delta = carry * 1e-20
            first = jax.tree.map(
                lambda x: x + delta.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.inexact)
                else x,
                a[0],
            )
            out = make_fn(params, first, *a[1:])
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    f = jax.jit(looped)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.2f} ms/call")
    return dt


def main():
    modules = build_models(dtype=jnp.bfloat16)
    params = init_params(modules, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)

    lat = jnp.asarray(rng.randn(B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    tc = jnp.asarray(rng.randn(B, 77, 768), jnp.float32)
    ic = jnp.asarray(rng.randn(B, 5, 768), jnp.float32)
    t_unet = timed(
        "unet fwd",
        lambda p, *a: modules.unet.apply({"params": p}, *a)[0],
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

    ids = jnp.asarray(rng.randint(0, 49408, (B, 77)), jnp.int32)
    t_txt = timed(
        "clip text",
        lambda p, i: modules.text_encoder.apply({"params": p}, i)[0],
        params.text_encoder, ids,
    )

    feats = jnp.asarray(rng.randn(5, B, 257, 1024), jnp.float32)
    t_ad = timed(
        "adapter (x2 in pipeline)",
        lambda p, f: modules.text_adapter.apply({"params": p}, f),
        params.text_adapter, feats,
    )

    total_50 = 50 * t_unet + t_vae + 2 * t_vis + 2 * t_txt + 2 * t_ad
    print(f"\nmodeled 50-step pipeline: {total_50:.3f} s -> "
          f"{B / total_50:.2f} imgs/s")


if __name__ == "__main__":
    main()
