"""BASELINE config 2: batched CFG inference — 8 prompts x 1 identity,
512px, guidance 6, negative prompt, 25 steps (the reference's recommended
user inference, generate_container_exec.sh:8-15). Honest tunnel timing."""
import os, sys, time
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, init_params

B, STEPS, GUIDANCE = 8, 25, 6.0
modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                       use_flash_attention=True, fast_norms=True)
params = init_params(modules, jax.random.PRNGKey(0))
solver = DPMSolverMultistep.create(modules.schedule, STEPS)
rng = np.random.RandomState(0)
example = {
    "pixel_values": jnp.asarray(rng.randn(B, 512, 512, 3), jnp.float32),
    "pixel_values_clip": jnp.asarray(
        np.repeat(rng.randn(1, 224, 224, 3), B, 0), jnp.float32),  # 1 identity
    "text_input_ids": jnp.asarray(rng.randint(0, 49408, (B, 77)), jnp.int32),
    "concept_placeholder_idx": jnp.full((B,), 5, jnp.int32),
    "negative_text_input_ids": jnp.asarray(
        np.repeat(rng.randint(0, 49408, (1, 77)), B, 0), jnp.int32),
}
jgen = jax.jit(lambda p, k: jnp.sum(run_inference(
    modules, p, solver, example, k, guidance_scale=GUIDANCE, token_index=0
).astype(jnp.float32)))
t = time.perf_counter()
float(jgen(params, jax.random.PRNGKey(1)))
print(f"# compile+first {time.perf_counter()-t:.1f}s", flush=True)
best = 1e9
for i in range(3):
    t0 = time.perf_counter()
    float(jgen(params, jax.random.PRNGKey(10+i)))
    best = min(best, time.perf_counter() - t0)
print(f"batched CFG (8 prompts x 1 id, 25 steps, g=6): "
      f"{best:.2f} s/batch -> {B/best:.3f} imgs/s/chip", flush=True)
