#!/usr/bin/env python
"""Single-request serving latency: batch 1 and 4, the two canonical configs.

BASELINE config 1 is the single-face generate (50 steps, guidance 1); the
reference's recommended user config is 25 steps, guidance 6
(generate_container_exec.sh:8-15). Records sec/image and imgs/s for each,
with honest timing (fresh PRNGKey + value fetch). At batch 1 the pipeline
is weight-read dominated (~1.7 GB of UNet weights per eval), so these
numbers anchor any future weight-quantization work. Run with no other JAX
process holding the tunnel.
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

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

CONFIGS = [  # (batch, steps, guidance, label)
    (1, 50, 1.0, "b1_50step_g1"),
    (1, 25, 6.0, "b1_25step_g6"),
    (4, 50, 1.0, "b4_50step_g1"),
    (4, 25, 6.0, "b4_25step_g6"),
]

def main():
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True,
                           fused_blocks=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    results = {}
    for B, steps, g, label in CONFIGS:
        solver = DPMSolverMultistep.create(modules.schedule, steps)
        rng = np.random.RandomState(0)
        example = {
            "pixel_values": jnp.asarray(rng.randn(B, 512, 512, 3), jnp.float32),
            "pixel_values_clip": jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32),
            "text_input_ids": jnp.asarray(rng.randint(0, 49408, (B, 77)), jnp.int32),
            "concept_placeholder_idx": jnp.full((B,), 5, jnp.int32),
        }
        # tokenized empty prompt: BOS, EOS, then pad-EOT (CLIP convention)
        uncond = np.full((B, 77), 49407, np.int32)
        uncond[:, 0] = 49406
        uncond = jnp.asarray(uncond)

        def gen(p, r, ex=example, sol=solver, gg=g, un=uncond):
            return run_inference(modules, p, sol, ex, r,
                                 guidance_scale=gg, token_index=0,
                                 uncond_input_ids=un)
        jgen = jax.jit(gen)
        t0 = time.perf_counter()
        out = jgen(params, jax.random.PRNGKey(1))
        float(jnp.sum(out[0]))
        note(f"{label}: compiled+first {time.perf_counter()-t0:.1f}s")
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            out = jgen(params, jax.random.PRNGKey(10 + i))
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        note(f"{label}: median {med:.3f}s  trials={[round(t,3) for t in ts]}")
        results[label] = {"sec_per_batch": round(med, 4),
                          "sec_per_image": round(med / B, 4),
                          "imgs_per_sec": round(B / med, 4)}
    print(json.dumps(results))

if __name__ == "__main__":
    main()
