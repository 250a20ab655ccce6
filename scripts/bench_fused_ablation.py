#!/usr/bin/env python
"""End-to-end ablation: UNetConfig.fused_blocks on vs off (honest timing:
fresh PRNGKey per trial + value fetch; see PERFORMANCE.md round-2 findings).
Run on the TPU with no other JAX process holding the tunnel."""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, init_params

BATCH, STEPS = 16, 50

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

def build(fused):
    return build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                        use_flash_attention=True, fast_norms=True,
                        fused_blocks=fused)

def run(modules, params, solver, example, label, trials=4):
    def gen(p, r):
        return run_inference(modules, p, solver, example, r,
                             guidance_scale=1.0, token_index=0)
    jgen = jax.jit(gen)
    t0 = time.perf_counter()
    out = jgen(params, jax.random.PRNGKey(1))
    float(jnp.sum(out[0]))
    note(f"{label}: compiled+first {time.perf_counter()-t0:.1f}s")
    ts = []
    for i in range(trials):
        t0 = time.perf_counter()
        out = jgen(params, jax.random.PRNGKey(10 + i))
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    note(f"{label}: median {med:.3f}s = {BATCH/med:.4f} imgs/s  trials={[round(t,3) for t in ts]}")
    return BATCH / med

def main():
    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(BATCH, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((BATCH,), 5, jnp.int32),
    }
    modules = build(False)
    params = init_params(modules, jax.random.PRNGKey(0))
    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    base = run(modules, params, solver, example, "baseline")
    modules_f = build(True)
    fused = run(modules_f, params, solver, example, "fused_blocks")
    print(json.dumps({"baseline": round(base, 4), "fused": round(fused, 4),
                      "ratio": round(fused / base, 4)}))

if __name__ == "__main__":
    main()
