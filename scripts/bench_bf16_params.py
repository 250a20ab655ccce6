"""Same-process A/B: bf16-STORED weights for batch-1 serving (VERDICT r3 #8).

The batch-1 UNet eval carries a ~2.1 ms (~13%) f32->bf16 weight-read floor
(PERFORMANCE.md serving section): with f32-stored params every eval reads
3.4 GB of weights and converts them to the bf16 compute dtype. Storing the
serving tree in bf16 halves that read. This measures the honest batch-1
latency delta + max pixel deviation under the headline serving recipe
(bf16 + flash + fast norms/scores + fused blocks, 50 steps, guidance 1).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photoverse_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache("/tmp/jax_cache")

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, cast_params, init_params

STEPS, TRIALS = 50, 5


def note(msg):
    print(f"# {msg}", flush=True)


def bench(modules, params, label):
    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(1, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(1, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (1, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((1,), 5, jnp.int32),
    }
    jgen = jax.jit(
        lambda p, k: run_inference(
            modules, p, solver, example, k, guidance_scale=1.0, token_index=0
        )
    )
    t = time.perf_counter()
    float(jnp.sum(jgen(params, jax.random.PRNGKey(1))[0]))
    note(f"{label}: compile+first {time.perf_counter() - t:.1f}s")
    for i in range(2):
        float(jnp.sum(jgen(params, jax.random.PRNGKey(2 + i))[0]))

    # bench.py's outlier protocol (retry-once then discard tunnel hiccups)
    from bench import robust_trials

    def run_trial(seed):
        t0 = time.perf_counter()
        float(jnp.sum(jgen(params, jax.random.PRNGKey(seed))[0]))
        return time.perf_counter() - t0

    kept, _ = robust_trials(run_trial, TRIALS, label)
    return float(np.median(kept)), kept, jgen(params, jax.random.PRNGKey(99))


def main():
    modules = build_models(
        dtype=jnp.bfloat16, fast_attention_scores=True,
        use_flash_attention=True, fast_norms=True, fused_blocks=True,
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    note("params initialized (f32)")
    m32, s32, img32 = bench(modules, params, "params=f32")
    # the SAME transformation generate/serve --bf16_params applies
    p16 = cast_params(params, jnp.bfloat16)
    m16, s16, img16 = bench(modules, p16, "params=bf16")
    dev = float(jnp.max(jnp.abs(img16[0].astype(jnp.float32)
                                - img32[0].astype(jnp.float32))))
    print(json.dumps({
        "f32_sec_per_image_b1": round(m32, 4),
        "bf16_sec_per_image_b1": round(m16, 4),
        "speedup": round(m32 / m16, 4),
        "trials_f32": [round(s, 4) for s in s32],
        "trials_bf16": [round(s, 4) for s in s16],
        "max_pixel_deviation": dev,
    }))


if __name__ == "__main__":
    main()
