#!/usr/bin/env python
"""End-to-end ablation: fast_norm_reductions (bf16 norm-statistics
reductions) on vs off, same-process A/B + output deviation.

The round-3 profile shows flax's forced-f32 GroupNorm/LayerNorm statistics
reductions (convert_reduce_fusion) are the largest non-attention device
cost. This measures lifting force_float32_reductions on top of the
shipping fast bundle (flash + fast_norms + bf16 scores + fused_blocks),
with honest timing (fresh PRNGKey per trial + value fetch; see
PERFORMANCE.md round-2 findings) and the decoded-image deviation between
the two routes under identical params/rng.

Run on the TPU with no other JAX process holding the tunnel.
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

BATCH, STEPS = 16, 50

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

def build(fast_red):
    return build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                        use_flash_attention=True, fast_norms=True,
                        fused_blocks=True, fast_norm_reductions=fast_red)

def timed(jgen, params, label, trials=5):
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
    return BATCH / med, out

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

    def make(mods):
        def gen(p, r):
            return run_inference(mods, p, solver, example, r,
                                 guidance_scale=1.0, token_index=0)
        return jax.jit(gen)

    jbase, jfast = make(modules), make(build(True))
    # interleave A/B to ride out chip drift
    base1, out_b = timed(jbase, params, "baseline(pass1)")
    fast1, out_f = timed(jfast, params, "fast_red(pass1)")
    base2, _ = timed(jbase, params, "baseline(pass2)")
    fast2, _ = timed(jfast, params, "fast_red(pass2)")

    # deviation under identical rng (PRNGKey(14) was the last trial of each)
    a = np.asarray(out_b[0], np.float32)
    b = np.asarray(out_f[0], np.float32)
    dev_max = float(np.max(np.abs(a - b)))
    dev_mean = float(np.mean(np.abs(a - b)))
    base = float(np.median([base1, base2]))
    fast = float(np.median([fast1, fast2]))
    print(json.dumps({
        "baseline_imgs_s": round(base, 4), "fast_red_imgs_s": round(fast, 4),
        "ratio": round(fast / base, 4),
        "pixel_dev_max": round(dev_max, 5), "pixel_dev_mean": round(dev_mean, 6),
    }))

if __name__ == "__main__":
    main()
