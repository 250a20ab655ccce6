#!/usr/bin/env python
"""A/B: W8A8 int8 conditioning stage vs bf16 (BASELINE config 3, batch 64).

CLIP image + text encoders + both adapters, end to end, honest timing
(fresh image operand per trial + value fetch — PERFORMANCE.md round-2
findings; the legacy bench_conditioning.py predates that protocol).
Reports throughput for both routes and the text/identity context cosine
deviation under identical inputs. Run with no other JAX process holding
the tunnel.
"""
import os, sys, time, json
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from photoverse_tpu.engine.inference import encode_condition
from photoverse_tpu.models.assembly import build_models, init_params

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TRIALS = 6

def note(m): print(f"# {m}", file=sys.stderr, flush=True)

def cosine(a, b):
    a = np.asarray(a, np.float64).ravel(); b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

def main():
    rng = np.random.RandomState(0)
    px = rng.randn(BATCH, 224, 224, 3).astype(np.float32)
    ids = jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32)
    pidx = jnp.full((BATCH,), 5, jnp.int32)

    def build(int8):
        return build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                            int8_conditioning=int8)

    mods = build(False)
    params = init_params(mods, jax.random.PRNGKey(0))

    def make(m):
        def cond(p, px_clip, jitter):
            # vary the operand ON DEVICE (a fresh host array would ship
            # 38 MB through the tunnel per trial and swamp the timing)
            px_clip = px_clip + jitter * 1e-3
            concept, id_ctx = encode_condition(m, p, px_clip, None)
            text_ctx, _ = m.text_encoder.apply(
                {"params": p.text_encoder}, ids, concept, pidx
            )
            return text_ctx, id_ctx
        return jax.jit(cond)

    px_dev = jnp.asarray(px)
    outs = {}
    rates = {}
    for label, m in (("bf16", mods), ("int8", build(True))):
        f = make(m)
        t0 = time.perf_counter()
        o = f(params, px_dev, jnp.float32(0))
        float(jnp.sum(o[0]))
        note(f"{label}: compiled+first {time.perf_counter()-t0:.1f}s")
        ts = []
        for i in range(TRIALS):
            t0 = time.perf_counter()
            o = f(params, px_dev, jnp.float32(i + 1))
            float(jnp.sum(o[0]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        note(f"{label}: median {med*1e3:.1f} ms = {BATCH/med:.0f} ids/s  "
             f"trials={[round(t*1e3,1) for t in ts]}")
        rates[label] = BATCH / med
        outs[label] = f(params, px_dev, jnp.float32(0))

    print(json.dumps({
        "bf16_ids_per_sec": round(rates["bf16"], 1),
        "int8_ids_per_sec": round(rates["int8"], 1),
        "speedup": round(rates["int8"] / rates["bf16"], 3),
        "text_ctx_cosine": round(cosine(outs["bf16"][0], outs["int8"][0]), 6),
        "id_ctx_cosine": round(cosine(outs["bf16"][1], outs["int8"][1]), 6),
    }))

if __name__ == "__main__":
    main()
