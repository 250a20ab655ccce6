"""Microbenchmark: jnp vs fused-Pallas dual-context attention on TPU.

Iterations are serialized *inside* one jit (the input is perturbed by the
previous output) so the axon tunnel's per-dispatch latency doesn't pollute
the numbers.
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
ITERS = 30


def timeit(fn, q, *rest):
    def looped(q, *rest):
        def body(i, carry):
            out = fn(q + carry.astype(q.dtype) * 1e-20, *rest)
            return jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    f = jax.jit(looped)
    jax.block_until_ready(f(q, *rest))
    t0 = time.perf_counter()
    jax.block_until_ready(f(q, *rest))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    coefs = jnp.asarray([1.0, 1.0], jnp.float32)
    for Sq, H, d in SHAPES:
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1, DTYPE)
        q, kt, vt = mk(B, Sq, H, d), mk(B, ST, H, d), mk(B, ST, H, d)
        ki, vi = mk(B, K, H, d), mk(B, K, H, d)

        t_jnp = timeit(
            lambda q, kt, vt, ki, vi: dual_context_attention(
                q, kt, vt, ki, vi, train=False
            )[0],
            q, kt, vt, ki, vi,
        )
        t_pal = timeit(
            lambda q, kt, vt, ki, vi: dual_context_attention_pallas(
                q, kt, vt, ki, vi, coefs
            ),
            q, kt, vt, ki, vi,
        )
        print(
            f"Sq={Sq:5d} d={d:3d}: jnp {t_jnp*1e6:8.1f}us  "
            f"pallas {t_pal*1e6:8.1f}us  speedup {t_jnp/t_pal:5.2f}x"
        )


if __name__ == "__main__":
    main()
