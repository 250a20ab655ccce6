"""Microbenchmark: jnp vs fused-Pallas dual-context attention on TPU.

Sweeps the SD-1.5 UNet cross-attention shapes (per-level spatial sizes and
head dims) at a given batch and prints per-shape timings.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.ops.attention import dual_context_attention
from photoverse_tpu.ops.pallas_attention import dual_context_attention_pallas

# (Sq, heads, head_dim) per UNet level at 512px
SHAPES = [
    (4096, 8, 40),
    (1024, 8, 80),
    (256, 8, 160),
    (64, 8, 160),
]
B = 8
ST, K = 77, 5
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    coefs = jnp.asarray([1.0, 1.0], jnp.float32)
    for Sq, H, d in SHAPES:
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1, DTYPE)
        q, kt, vt = mk(B, Sq, H, d), mk(B, ST, H, d), mk(B, ST, H, d)
        ki, vi = mk(B, K, H, d), mk(B, K, H, d)

        jnp_fn = jax.jit(
            lambda q, kt, vt, ki, vi: dual_context_attention(
                q, kt, vt, ki, vi, train=False
            )[0]
        )
        pallas_fn = jax.jit(
            lambda q, kt, vt, ki, vi: dual_context_attention_pallas(
                q, kt, vt, ki, vi, coefs
            )
        )
        t_jnp = timeit(jnp_fn, q, kt, vt, ki, vi)
        t_pal = timeit(pallas_fn, q, kt, vt, ki, vi)
        err = float(
            jnp.max(
                jnp.abs(
                    jnp_fn(q, kt, vt, ki, vi).astype(jnp.float32)
                    - pallas_fn(q, kt, vt, ki, vi).astype(jnp.float32)
                )
            )
        )
        print(
            f"Sq={Sq:5d} d={d:3d}: jnp {t_jnp*1e6:8.1f}us  "
            f"pallas {t_pal*1e6:8.1f}us  speedup {t_jnp/t_pal:5.2f}x  maxerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
