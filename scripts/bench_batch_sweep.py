#!/usr/bin/env python
"""Throughput vs batch size for the full 50-step pipeline (fast bundle).

The headline metric is imgs/sec/chip; batch 16 was chosen in round 1 for
conv MXU utilization, but a larger batch further amortizes the ~1.7 GB of
UNet weight reads per eval and XLA's fixed per-op costs — if it fits in
the 16 GB HBM. Honest timing per PERFORMANCE.md round-2 findings (fresh
PRNGKey each trial + value fetch). Run with no other JAX process holding
the tunnel.
"""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, init_params

STEPS = 50
BATCHES = [int(b) for b in (sys.argv[1:] or [16, 24, 32])]

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

def main():
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True,
                           fused_blocks=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    results = {}
    for B in BATCHES:
        rng = np.random.RandomState(0)
        example = {
            "pixel_values": jnp.asarray(rng.randn(B, 512, 512, 3), jnp.float32),
            "pixel_values_clip": jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32),
            "text_input_ids": jnp.asarray(rng.randint(0, 49408, (B, 77)), jnp.int32),
            "concept_placeholder_idx": jnp.full((B,), 5, jnp.int32),
        }
        def gen(p, r, ex=example):
            return run_inference(modules, p, solver, ex, r,
                                 guidance_scale=1.0, token_index=0)
        jgen = jax.jit(gen)
        try:
            t0 = time.perf_counter()
            out = jgen(params, jax.random.PRNGKey(1))
            float(jnp.sum(out[0]))
            note(f"B={B}: compiled+first {time.perf_counter()-t0:.1f}s")
            ts = []
            for i in range(4):
                t0 = time.perf_counter()
                out = jgen(params, jax.random.PRNGKey(10 + i))
                float(jnp.sum(out[0]))
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            note(f"B={B}: median {med:.3f}s = {B/med:.4f} imgs/s  trials={[round(t,3) for t in ts]}")
            results[B] = round(B / med, 4)
        except Exception as e:  # OOM etc.
            note(f"B={B}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[B] = None
    print(json.dumps(results))

if __name__ == "__main__":
    main()
