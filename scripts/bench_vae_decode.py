#!/usr/bin/env python
"""VAE decode ablation (VERDICT round-2 #8): f32 norms vs fast_norms,
batch 16 at 64x64 latents. Honest timing: fresh operand + value fetch."""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from photoverse_tpu.models.vae import AutoencoderKL, VAEConfig

B = 16
rng = np.random.RandomState(0)
z = jnp.asarray(rng.randn(B, 64, 64, 4).astype(np.float32))

def measure(fast_norms, use_flash):
    cfg = VAEConfig(use_flash_attention=use_flash, fast_norms=fast_norms)
    vae = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
    params = vae.init(jax.random.PRNGKey(0), z[:1], jax.random.PRNGKey(1))["params"]
    dec = jax.jit(lambda p, zz: vae.apply({"params": p}, zz, method="decode"))
    out = dec(params, z); float(jnp.sum(out))
    ts = []
    for i in range(4):
        zi = z + jnp.float32(i * 1e-6)
        t0 = time.perf_counter()
        o = dec(params, zi)
        float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return min(ts), np.asarray(out, np.float32)

t_base, o_base = measure(False, True)
t_fast, o_fast = measure(True, True)
dev = float(np.max(np.abs(o_base - o_fast)))
print(json.dumps({"decode_b16_f32norms_ms": round(t_base*1e3,1),
                  "decode_b16_fastnorms_ms": round(t_fast*1e3,1),
                  "speedup": round(t_base/t_fast, 3),
                  "max_abs_dev": round(dev, 5)}))
