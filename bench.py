"""Benchmark: 512px identity-conditioned generation throughput per chip.

Measures the BASELINE.json north-star config 1/2: SD-1.5-scale PhotoVerse
pipeline (dual CLIP conditioning + adapters + injected text encoder + dual
cross-attention UNet + DPM-Solver++ 50-step denoise + VAE decode) at 512px,
end to end, on the attached accelerator. Weights are random — throughput is
shape-dependent only.

Baseline: the torch reference publishes no numbers (SURVEY.md §6). The
`vs_baseline` denominator is the analytic A100 estimate of the torch
REFERENCE pipeline derived in BASELINE.md ("Analytic A100 baseline
estimate"): fp32 weights (train.py:422) + two UNet evals per step even at
guidance 1 (infer.py:103-116) -> ~70.5 TFLOP/image at ~20-39 TFLOPs
sustained = 0.28-0.55, central 0.4 imgs/s/GPU. The stricter comparison
against an OPTIMIZED diffusers fp16 pipeline (~1.0 imgs/s on A100) is
emitted as `vs_optimized_diffusers`.

Statistical protocol (round 3): N timed trials after warmup, each with a
fresh PRNGKey (the axon relay caches repeat executions of identical
programs — see PERFORMANCE.md "Round 2 findings"); the JSON carries the
MEDIAN plus per-trial values and spread so round-over-round deltas are
judgeable against the ~±4% run-to-run variance of the shared chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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

A100_TORCH_REFERENCE_IMGS_PER_SEC = 0.4  # BASELINE.md analytic derivation
A100_OPTIMIZED_DIFFUSERS_IMGS_PER_SEC = 1.0  # conservative comparison

BATCH = 16  # conv MXU utilization needs batch >= 16 (PERFORMANCE.md)
STEPS = 50
GUIDANCE = 1.0  # reference default (generate.py:25, README.md:79)
WARMUP_ITERS = 2  # 2: the first post-compile dispatch occasionally eats a
# tunnel hiccup that would land in trial 1 and inflate the spread stat
TRIALS = 5  # median-of-N; each trial varies the PRNGKey (relay cache)


def main():
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference
    from photoverse_tpu.models.assembly import build_models, init_params

    import sys

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    note("building models")
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True,
                           fused_blocks=True)
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
        # fetch a value like the timed trials so warmup really drains the
        # pipeline (block_until_ready is ACK-only through the tunnel)
        float(jnp.sum(jgen(params, jax.random.PRNGKey(2 + i))[0]))

    # the pipeline is an unsharded jax.jit — it executes on ONE device, so
    # per-chip throughput divides by 1 regardless of how many chips are
    # attached (dividing by device_count() would underreport on multi-chip
    # hosts; DP scaling is measured via generate --data_parallel instead)
    n_chips = 1
    trials = []
    for i in range(TRIALS):
        t0 = time.perf_counter()
        out = jgen(params, jax.random.PRNGKey(10 + i))
        # fetch a VALUE, not just the ready-signal: through the axon tunnel
        # block_until_ready resolves on the remote ACK for small programs
        # (PERFORMANCE.md round-2 findings); summing forces real completion
        float(jnp.sum(out[0]))
        dt = time.perf_counter() - t0
        trials.append(BATCH / dt / n_chips)
        note(f"trial {i + 1}/{TRIALS}: {trials[-1]:.4f} imgs/s/chip")

    med = float(np.median(trials))
    spread = (max(trials) - min(trials)) / med if med else 0.0
    print(
        json.dumps(
            {
                "metric": "512px imgs/sec/chip (50-step DPM-Solver++, PhotoVerse pipeline)",
                "value": round(med, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(med / A100_TORCH_REFERENCE_IMGS_PER_SEC, 4),
                "vs_optimized_diffusers": round(
                    med / A100_OPTIMIZED_DIFFUSERS_IMGS_PER_SEC, 4
                ),
                "median": round(med, 4),
                "trials": [round(t, 4) for t in trials],
                "spread": round(spread, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
