"""Conditioning-stage benchmark (BASELINE.md config 3): CLIP image + text
encoders + both adapters at batch 64, end to end on the chip.

Honest tunnel timing (PERFORMANCE.md round-2/3 findings): every trial
varies the operand ON DEVICE via a jitter scalar (a fresh host array
would ship 38 MB through the tunnel per trial; identical args would be
served from the relay cache) and fetches a value. The original round-1
version predated this protocol — its 117 ms / 549 ids/s record was
relay-cache-tainted; the honest bf16 number is ~145 ms / 442 ids/s
(and 485 ids/s with --int8_conditioning, scripts/bench_int8_conditioning.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.engine.inference import encode_condition
from photoverse_tpu.models.assembly import build_models, init_params

BATCH = 64
TRIALS = 6


def main():
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    px_clip = jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32)
    pidx = jnp.full((BATCH,), 5, jnp.int32)

    def cond(params, px_clip, jitter):
        px_clip = px_clip + jitter * 1e-3
        concept, id_ctx = encode_condition(modules, params, px_clip, None)
        text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, ids, concept, pidx
        )
        return text_ctx, id_ctx

    f = jax.jit(cond)
    out = f(params, px_clip, jnp.float32(0))
    float(jnp.sum(out[0]))
    ts = []
    for i in range(TRIALS):
        t0 = time.perf_counter()
        out = f(params, px_clip, jnp.float32(i + 1))
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        f"conditioning stage (batch {BATCH}): {dt*1e3:.1f} ms -> "
        f"{BATCH/dt:.0f} identities/sec/chip "
        f"(trials: {[round(t*1e3, 1) for t in ts]})"
    )


if __name__ == "__main__":
    main()
