#!/usr/bin/env python
"""Scoping microbench for an int8 serving path on this chip.

Three questions, each answered by an honest timed measurement (fresh
operands every call + value fetch; PERFORMANCE.md round-2 findings):

1. MXU int8 rate: dot_general on int8 operands (preferred_element_type
   int32) vs the same shapes in bf16 — is int8 ~2x on this chip?
2. Weight-only int8 for matmuls: does XLA fuse the int8->bf16 dequant
   (convert * scale) into the dot, or does it materialize the dequantized
   weights (making it pointless inside a denoise scan)?
3. Same question for convolution weights (the UNet is conv-heavy).

Big-shape programs (>=50 ms) so tunnel dispatch noise is irrelevant.
Run with no other JAX process holding the tunnel.
"""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

M = K = N = 8192
REPS = 24  # chained matmuls inside one jit to swamp dispatch

def timeit(fn, args, label, trials=4):
    jf = jax.jit(fn)
    out = jf(*args); float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for i in range(trials):
        # vary an operand so the relay cannot serve a cached execution
        args2 = (args[0] + i % 3,) + args[1:]
        t0 = time.perf_counter()
        out = jf(*args2)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    note(f"{label}: median {med*1e3:.1f} ms  trials={[round(t*1e3,1) for t in ts]}")
    return med

def chain_bf16(x, w):
    def body(c, _):
        c = jax.lax.dot(c, w, precision=None)
        c = (c * (1.0 / K)).astype(jnp.bfloat16)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=REPS)
    return y

def chain_int8(x, w):
    # int8 x int8 -> int32 accumulate; rescale back to int8 between links
    def body(c, _):
        y = jax.lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        c = (y >> 7).astype(jnp.int8)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=REPS)
    return y

def chain_wonly(x, w_q, scale):
    # weight-only: dequantize inside the scan body; if XLA fuses the
    # convert into the dot's operand read this matches bf16 time with
    # int8-sized weight traffic; if it materializes, it is slower.
    # The carry-dependent term blocks loop-invariant hoisting (a hoisted
    # dequant is exactly the bf16 baseline and proves nothing).
    def body(c, _):
        w = (w_q.astype(jnp.bfloat16) * scale) + c[0, 0] * jnp.bfloat16(0)
        c = jax.lax.dot(c, w, precision=None)
        c = (c * (1.0 / K)).astype(jnp.bfloat16)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=REPS)
    return y

def conv_bf16(x, w):
    def body(c, _):
        c = jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        c = (c * 0.01).astype(jnp.bfloat16)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=8)
    return y

def conv_wonly(x, w_q, scale):
    def body(c, _):
        w = (w_q.astype(jnp.bfloat16) * scale) + c[0, 0, 0, 0] * jnp.bfloat16(0)
        c = jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        c = (c * 0.01).astype(jnp.bfloat16)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=8)
    return y

def main():
    rng = np.random.RandomState(0)
    x16 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w16 = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)
    x8 = jnp.asarray(rng.randint(-100, 100, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-100, 100, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.rand(N) * 0.02, jnp.bfloat16)

    flops = 2.0 * M * K * N * REPS
    t_bf16 = timeit(chain_bf16, (x16, w16), "bf16 chain")
    note(f"bf16: {flops/t_bf16/1e12:.1f} TFLOP/s")
    t_int8 = timeit(chain_int8, (x8, w8), "int8 chain")
    note(f"int8: {flops/t_int8/1e12:.1f} TOP/s")
    t_wo = timeit(chain_wonly, (x16, w8, scale), "weight-only-int8 chain")

    xc = jnp.asarray(rng.randn(16, 64, 64, 640), jnp.bfloat16)
    wc16 = jnp.asarray(rng.randn(3, 3, 640, 640) / 76.0, jnp.bfloat16)
    wc8 = jnp.asarray(rng.randint(-100, 100, (3, 3, 640, 640)), jnp.int8)
    cscale = jnp.asarray(rng.rand(640) * 0.01, jnp.bfloat16)
    t_c16 = timeit(conv_bf16, (xc, wc16), "bf16 conv chain")
    t_cwo = timeit(conv_wonly, (xc, wc8, cscale), "weight-only-int8 conv chain")

    print(json.dumps({
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "int8_speedup": round(t_bf16 / t_int8, 3),
        "weight_only_matmul_ratio": round(t_wo / t_bf16, 3),
        "weight_only_conv_ratio": round(t_cwo / t_c16, 3),
    }))

if __name__ == "__main__":
    main()
