import time, jax, jax.numpy as jnp, numpy as np, dataclasses
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from photoverse_tpu.models.vae import AutoencoderKL, VAEConfig
from photoverse_tpu.ops.flash_sdpa import flash_sdpa, flash_sdpa_stream
from photoverse_tpu.models.assembly import build_models, init_params, _numpy_fill

def timeit(f, *a, iters=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

B = 16
# --- VAE decode ---
lat = jnp.asarray(np.random.RandomState(0).randn(B, 64, 64, 4), jnp.float32)
for flash in (False, True):
    vae = AutoencoderKL(VAEConfig(use_flash_attention=flash), dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1,512,512,3)), jax.random.PRNGKey(1))["params"])
    params = _numpy_fill(shapes, 0)
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
    dt = timeit(dec, params, lat, iters=3)
    print(f"VAE decode batch {B} flash={flash}: {dt*1e3:.1f} ms")

# --- flash self-attention S=4096 d=40 ---
rng = np.random.RandomState(1)
q = jnp.asarray(rng.randn(B, 4096, 8, 40), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, 4096, 8, 40), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, 4096, 8, 40), jnp.bfloat16)
f_exact = jax.jit(lambda q,k,v: flash_sdpa(q,k,v))
f_fast  = jax.jit(lambda q,k,v: flash_sdpa(q,k,v,fast_scores=True))
print(f"flash d=40 exact: {timeit(f_exact,q,k,v)*1e3:.2f} ms")
print(f"flash d=40 fast : {timeit(f_fast,q,k,v)*1e3:.2f} ms")

# --- VAE-shape attention alone: stream kernel vs XLA materialized ---
C = 512
q2 = jnp.asarray(rng.randn(B, 4096, 1, C), jnp.bfloat16)
k2 = jnp.asarray(rng.randn(B, 4096, 1, C), jnp.bfloat16)
v2 = jnp.asarray(rng.randn(B, 4096, 1, C), jnp.bfloat16)
def xla_attn(q, k, v):
    qf, kf, vf = (x[:, :, 0, :] for x in (q, k, v))
    s = jnp.einsum("bqc,bkc->bqk", qf, kf, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (C ** -0.5), -1).astype(q.dtype)
    return jnp.einsum("bqk,bkc->bqc", p, vf, preferred_element_type=jnp.float32)
print(f"vae-attn XLA   : {timeit(jax.jit(xla_attn), q2, k2, v2)*1e3:.2f} ms")
f_str = jax.jit(lambda q,k,v: flash_sdpa_stream(q,k,v))
print(f"vae-attn stream: {timeit(f_str, q2, k2, v2)*1e3:.2f} ms")
f_strf = jax.jit(lambda q,k,v: flash_sdpa_stream(q,k,v,fast_scores=True))
print(f"vae-attn stream fast: {timeit(f_strf, q2, k2, v2)*1e3:.2f} ms")
for tq, tk in ((512, 1024), (512, 2048), (256, 2048), (1024, 1024)):
    f2 = jax.jit(lambda q,k,v,tq=tq,tk=tk: flash_sdpa_stream(q,k,v,q_tile=tq,k_tile=tk,fast_scores=True))
    print(f"vae-attn stream fast tq={tq} tk={tk}: {timeit(f2, q2, k2, v2)*1e3:.2f} ms")
