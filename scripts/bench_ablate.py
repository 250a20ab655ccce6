"""End-to-end pipeline throughput with flag ablations (one process)."""
import json, os, sys, time
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np, dataclasses
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, "/root/repo")
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, init_params

BATCH, STEPS = 16, 50

def bench(name, vae_flash, fast_flash):
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=fast_flash,
                           use_flash_attention=True, fast_norms=True)
    if not vae_flash:
        modules = dataclasses.replace(
            modules, vae=modules.vae.clone(
                config=dataclasses.replace(modules.vae.config, use_flash_attention=False)))
    params = init_params(modules, jax.random.PRNGKey(0))
    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(BATCH, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((BATCH,), 5, jnp.int32),
    }
    jgen = jax.jit(lambda p, k: run_inference(modules, p, solver, example, k,
                                              guidance_scale=1.0, token_index=0))
    t = time.perf_counter()
    jax.block_until_ready(jgen(params, jax.random.PRNGKey(1)))
    print(f"# {name}: compile+first {time.perf_counter()-t:.1f}s", flush=True)
    jax.block_until_ready(jgen(params, jax.random.PRNGKey(2)))
    t0 = time.perf_counter()
    for i in range(3):
        out = jgen(params, jax.random.PRNGKey(10+i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {BATCH*3/dt:.4f} imgs/s/chip", flush=True)

bench("vaeflash=0 fast=1", vae_flash=False, fast_flash=True)
bench("vaeflash=1 fast=0", vae_flash=True, fast_flash=False)
bench("vaeflash=0 fast=0", vae_flash=False, fast_flash=False)
