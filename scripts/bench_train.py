"""Training-step throughput at SD scale (BASELINE.md config 4): effective
batch 16, LoRA rank 128 on attn2, diffusion + regularizer losses (face loss
off — its cost is the inner 10-step generation, benchmarked via bench.py).

The canonical recipe (prepare_dataset_and_train.sh:1) trains batch 16 per
device; on a single v5e-16GB that micro-batch OOMs (26 GB), so the per-chip
fit is micro-batch 8 x grad-accum 2 — exactly what the train CLI's
--auto_grad_accum selects. Gradients accumulate inside optax.MultiSteps and
clipping applies to the accumulated gradient at the sync boundary. Reported
imgs/s is per OPTIMIZER step at the effective batch.

Usage: python scripts/bench_train.py [micro_batch] [accum]
"""

import sys
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

MICRO = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ACCUM = int(sys.argv[2]) if len(sys.argv) > 2 else 2
ITERS = 10  # optimizer steps
REMAT = True
REMAT_POLICY = sys.argv[3] if len(sys.argv) > 3 else ""  # "" | "dots" 


def main():
    modules = build_models(
        dtype=jnp.bfloat16,
        unet_config=UNetConfig(lora_rank=128, lora_dropout=0.1, remat=REMAT,
                               remat_policy=REMAT_POLICY,
                               use_flash_attention=True),
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-5, max_train_steps=100, lr_warmup_steps=0,
                      gradient_accumulation_steps=ACCUM)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx), donate_argnums=(0, 2))

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(MICRO, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(MICRO, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (MICRO, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((MICRO,), 5, jnp.int32),
    }

    t0 = time.perf_counter()
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(metrics)
    print(f"# compile+first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}")

    t0 = time.perf_counter()
    for i in range(ITERS * ACCUM):
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(2 + i)
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / ITERS
    eff = MICRO * ACCUM
    print(
        f"train step (effective batch {eff} = {MICRO}x{ACCUM}, lora 128, "
        f"remat={REMAT}): {dt*1e3:.1f} ms/optimizer-step "
        f"-> {eff / dt:.2f} imgs/s, loss={float(metrics['loss']):.4f}"
    )


if __name__ == "__main__":
    main()
