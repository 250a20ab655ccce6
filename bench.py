"""Benchmark: 512px identity-conditioned generation throughput per chip.

Measures the BASELINE.json north-star config 1/2: SD-1.5-scale PhotoVerse
pipeline (dual CLIP conditioning + adapters + injected text encoder + dual
cross-attention UNet + DPM-Solver++ 50-step denoise + VAE decode) at 512px,
end to end, on the attached accelerator. Weights are random — throughput is
shape-dependent only.

Baseline: the torch reference publishes no numbers (SURVEY.md §6). The
comparison constant is a deliberately CONSERVATIVE A100 figure: an
optimized diffusers SD-1.5 fp16 pipeline at 512px/50 steps ~= 1.0
images/sec/GPU. The reference repo itself is much slower than that on
A100 (float32 weights, train.py:422; and two UNet evals per step even at
guidance 1, infer.py:103-116 — roughly 0.3-0.4 imgs/s), so vs_baseline
understates the speedup over the actual reference by ~3x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_TORCH_IMGS_PER_SEC = 1.0  # estimated reference throughput (see docstring)

BATCH = 16  # conv MXU utilization needs batch >= 16 (PERFORMANCE.md)
STEPS = 50
GUIDANCE = 1.0  # reference default (generate.py:25, README.md:79)
WARMUP_ITERS = 1
MEASURE_ITERS = 3


def main():
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference
    from photoverse_tpu.models.assembly import build_models, init_params

    import sys

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    note("building models")
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    note("params initialized")
    solver = DPMSolverMultistep.create(modules.schedule, STEPS)

    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(BATCH, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.randint(0, 49408, (BATCH, 77)), jnp.int32
        ),
        "concept_placeholder_idx": jnp.full((BATCH,), 5, jnp.int32),
    }

    def gen(params, rng_key):
        return run_inference(
            modules, params, solver, example, rng_key,
            guidance_scale=GUIDANCE, token_index=0,
        )

    jgen = jax.jit(gen)
    import time as _t

    t_c = _t.perf_counter()
    out = jgen(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    note(f"pipeline compiled+first run in {_t.perf_counter() - t_c:.1f}s")
    for i in range(WARMUP_ITERS):
        jax.block_until_ready(jgen(params, jax.random.PRNGKey(2 + i)))

    t0 = time.perf_counter()
    for i in range(MEASURE_ITERS):
        out = jgen(params, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    imgs_per_sec_chip = (BATCH * MEASURE_ITERS) / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "512px imgs/sec/chip (50-step DPM-Solver++, PhotoVerse pipeline)",
                "value": round(imgs_per_sec_chip, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec_chip / A100_TORCH_IMGS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
