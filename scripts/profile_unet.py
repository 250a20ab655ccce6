"""Profile one pipeline bench iteration; dump op-level breakdown."""
import sys, time, glob, gzip, json, collections, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.models.assembly import build_models, init_params

B = 16
modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                       use_flash_attention=True, fast_norms=True)
params = init_params(modules, jax.random.PRNGKey(0))
solver = DPMSolverMultistep.create(modules.schedule, 50)
rng = np.random.RandomState(0)
example = {
    "pixel_values": jnp.asarray(rng.randn(B, 512, 512, 3), jnp.float32),
    "pixel_values_clip": jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32),
    "text_input_ids": jnp.asarray(rng.randint(0, 49408, (B, 77)), jnp.int32),
    "concept_placeholder_idx": jnp.full((B,), 5, jnp.int32),
}
jgen = jax.jit(lambda p, k: run_inference(modules, p, solver, example, k,
                                          guidance_scale=1.0, token_index=0))
out = jgen(params, jax.random.PRNGKey(1)); jax.block_until_ready(out)
print("# warm", flush=True)
jax.profiler.start_trace("/tmp/prof_r2")
out = jgen(params, jax.random.PRNGKey(2)); jax.block_until_ready(out)
jax.profiler.stop_trace()
print("# traced", flush=True)

# parse the trace
files = glob.glob("/tmp/prof_r2/**/*.trace.json.gz", recursive=True)
print(files)
ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
tot = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        cat = e.get("args", {}).get("long_name", "") or e.get("name", "")
        name = e.get("name", "")
        pid_ok = True
        tot[name.split(".")[0]] += e["dur"]
for name, us in tot.most_common(40):
    print(f"{us/1e3:10.1f} ms  {name}")
