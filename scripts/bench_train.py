"""Training-step throughput at SD scale (BASELINE.md config 4): batch 16,
LoRA rank 128 on attn2, diffusion + regularizer losses (face loss off — its
cost is the inner 10-step generation, benchmarked separately via bench.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from photoverse_tpu.engine.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from photoverse_tpu.models.assembly import build_models, init_params
from photoverse_tpu.models.unet import UNetConfig

BATCH = 8  # per-chip; the 40k recipe batch 16 = 2 chips DP or grad-accum 2 (v5e 16GB)
ITERS = 10
REMAT = True


def main():
    modules = build_models(
        dtype=jnp.bfloat16,
        unet_config=UNetConfig(lora_rank=128, lora_dropout=0.1, remat=REMAT,
                               use_flash_attention=True),
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-5, max_train_steps=100, lr_warmup_steps=0)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx), donate_argnums=(0, 2))

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(BATCH, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (BATCH, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((BATCH,), 5, jnp.int32),
    }

    t0 = time.perf_counter()
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(metrics)
    print(f"# compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}")

    t0 = time.perf_counter()
    for i in range(ITERS):
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(2 + i)
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"train step (batch {BATCH}, lora 128, remat={REMAT}): {dt*1e3:.1f} ms "
        f"-> {BATCH / dt:.2f} imgs/s, loss={float(metrics['loss']):.4f}"
    )


if __name__ == "__main__":
    main()
