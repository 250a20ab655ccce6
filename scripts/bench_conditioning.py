"""Conditioning-stage benchmark (BASELINE.md config 3): CLIP image + text
encoders + both adapters at batch 64, end to end on the chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.engine.inference import encode_condition
from photoverse_tpu.models.assembly import build_models, init_params

BATCH = 64
ITERS = 10


def main():
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    px_clip = jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32)
    pidx = jnp.full((BATCH,), 5, jnp.int32)

    def cond(params, px_clip, ids, pidx):
        concept, id_ctx = encode_condition(modules, params, px_clip, None)
        text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, ids, concept, pidx
        )
        return text_ctx, id_ctx

    f = jax.jit(cond)
    out = f(params, px_clip, ids, pidx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(params, px_clip, ids, pidx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"conditioning stage (batch {BATCH}): {dt*1e3:.1f} ms -> "
        f"{BATCH/dt:.0f} identities/sec/chip"
    )


if __name__ == "__main__":
    main()
