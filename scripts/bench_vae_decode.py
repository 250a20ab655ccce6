#!/usr/bin/env python
"""VAE decode ablation (VERDICT round-2 #8): f32 norms vs fast_norms,
batch 16 at 64x64 latents. Honest timing: fresh operand + value fetch.
Params come from eval_shape + host fill (never trace module.init at SD
scale through the tunnel — NOTES.md gotcha #4) and are SHARED between the
two configs (identical param trees) so the deviation is attributable."""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from photoverse_tpu.models.vae import AutoencoderKL, VAEConfig

B = 16
rng = np.random.RandomState(0)
z = jnp.asarray(rng.randn(B, 64, 64, 4).astype(np.float32))


def host_init(vae):
    shapes = jax.eval_shape(
        lambda k: vae.init(k, z[:1], jax.random.PRNGKey(1)), jax.random.PRNGKey(0)
    )["params"]
    fill = np.random.RandomState(1)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            a = np.ones(s.shape, np.float32)
        elif name == "bias":
            a = np.zeros(s.shape, np.float32)
        else:
            a = (fill.standard_normal(s.shape) * 0.05).astype(np.float32)
        return jnp.asarray(a, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def measure(params, fast_norms):
    cfg = VAEConfig(use_flash_attention=True, fast_norms=fast_norms)
    vae = AutoencoderKL(config=cfg, dtype=jnp.bfloat16)
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


base_vae = AutoencoderKL(config=VAEConfig(use_flash_attention=True), dtype=jnp.bfloat16)
params = host_init(base_vae)
t_base, o_base = measure(params, False)
t_fast, o_fast = measure(params, True)
dev = float(np.max(np.abs(o_base - o_fast)))
print(json.dumps({"decode_b16_f32norms_ms": round(t_base * 1e3, 1),
                  "decode_b16_fastnorms_ms": round(t_fast * 1e3, 1),
                  "speedup": round(t_base / t_fast, 3),
                  "max_abs_dev": round(dev, 5)}))
