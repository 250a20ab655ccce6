"""Canonical-recipe training-step throughput: BASELINE.md config 4 WITH the
ArcFace face loss — the full `prepare_dataset_and_train.sh:1` recipe shape
(reference train.py:459-549 hot loop including the 10-inner-step face
generation, train.py:521-532).

Why this exists: the 200-step soak (TRAIN_SOAK_r04.json) measured
2.949 s/optimizer-step with the train CLI's --mixed_precision DEFAULT,
which is f32 compute; every headline inference number runs bf16. The
face-loss branch (20 no-grad UNet evals at guidance 2 + a grad-enabled
trailing step + a 512px VAE decode backward) dominates the canonical step
~5:1 over the plain diffusion step (610 ms bf16 without face loss,
scripts/bench_train.py), so compute dtype is the single biggest untested
knob on the recipe users actually run.

This script measures ONE arm per invocation (each arm is a process so the
arms never share a live HBM footprint or compilation cache state):

  python scripts/bench_train_face.py f32   # round-4 soak configuration
  python scripts/bench_train_face.py bf16  # mixed-precision recipe (r4 adopted)
  python scripts/bench_train_face.py fused # bf16 + fused face accumulation:
        # face branch only on each window's final micro-step, accum-x wider
        # sub-batch, accum-x weight (cli/train.py --fuse_face_accum) — same
        # expected gradient, half the inner-generation dispatches
  python scripts/bench_train_face.py wide  # bf16 + accum-x wider face
        # sub-batch on EVERY micro-step (isolates the marginal cost of
        # inner-loop width from the fusion's dispatch halving)

Step shape (exactly the soak's): micro-batch 8 x grad-accum 2 (effective 16),
512px, LoRA rank 128 dropout 0.1, flash attention, UNet-block + VAE-decoder
remat, arcface face loss on a ceil(0.25*8)=2-row face sub-batch, 10 inner
steps at guidance 2.0. Random weights (throughput is shape-dependent only).
Master/trainable params stay f32 either way — `dtype` is the module COMPUTE
dtype, exactly what `--mixed_precision bf16` selects in cli/train.py.

Timing protocol: per-optimizer-step wall times over WINDOWS windows of
STEPS_PER_WINDOW optimizer steps, blocking on the window's final metrics
(the honest-timing fix from round-4 session 3 — intermediate micro-steps
stay async, the clock never stops on a dispatch). Prints one JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# shared persistent compile cache (same dir as the CLIs and bench.py) so
# arms warm-start across processes and rounds
from photoverse_tpu.utils.platform import DEFAULT_CACHE_DIR, enable_compilation_cache

enable_compilation_cache(os.environ.get("PHOTOVERSE_COMPILE_CACHE", DEFAULT_CACHE_DIR))

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from photoverse_tpu.models.assembly import build_models, init_params
from photoverse_tpu.models.face_loss import load_face_loss, make_face_loss_fn
from photoverse_tpu.models.unet import UNetConfig
from photoverse_tpu.models.vae import VAEConfig

ARM = sys.argv[1] if len(sys.argv) > 1 else "bf16"
MICRO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ACCUM = int(sys.argv[3]) if len(sys.argv) > 3 else 2
WINDOWS = int(sys.argv[4]) if len(sys.argv) > 4 else 5
STEPS_PER_WINDOW = int(sys.argv[5]) if len(sys.argv) > 5 else 4
FACE = max(int(0.25 * MICRO), 1)  # cli/train.py --face_loss_sample_ratio 0.25


def main():
    assert ARM in ("f32", "bf16", "fused", "wide"), ARM
    dtype = jnp.float32 if ARM == "f32" else jnp.bfloat16
    fused = ARM == "fused"
    face_rows = FACE * ACCUM if ARM in ("fused", "wide") else FACE
    modules = build_models(
        dtype=dtype,
        unet_config=UNetConfig(
            lora_rank=128, lora_dropout=0.1, remat=True,
            use_flash_attention=True,
        ),
        # decoder remat: required for the 512px face-loss backward on 16 GB
        vae_config=VAEConfig(remat=True, use_flash_attention=True),
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    face_loss_obj = load_face_loss("arcface", None)  # random weights: perf only
    face_loss_fn = make_face_loss_fn("arcface", loss=face_loss_obj)
    face_solver = DPMSolverMultistep.create(
        modules.schedule, TrainConfig.face_loss_timesteps
    )
    cfg = TrainConfig(
        learning_rate=1e-5, max_train_steps=100, lr_warmup_steps=0,
        gradient_accumulation_steps=ACCUM,
    )
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(
        make_train_step(
            modules, cfg, tx, face_loss_fn=face_loss_fn, face_solver=face_solver,
            face_weight_scale=float(ACCUM) if fused else 1.0,
        ),
        donate_argnums=(0, 2),
    )
    step_noface = None
    if fused:
        step_noface = jax.jit(
            make_train_step(modules, cfg, tx), donate_argnums=(0, 2)
        )

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(MICRO, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(MICRO, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (MICRO, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((MICRO,), 5, jnp.int32),
        "face_pixel_values": jnp.asarray(
            rng.randn(face_rows, 512, 512, 3), jnp.float32
        ),
        "face_pixel_values_clip": jnp.asarray(
            rng.randn(face_rows, 224, 224, 3), jnp.float32
        ),
        "face_text_input_ids": jnp.asarray(
            rng.randint(0, 49408, (face_rows, 77)), jnp.int32
        ),
        "face_concept_placeholder_idx": jnp.full((face_rows,), 5, jnp.int32),
        "face_uncond_input_ids": jnp.asarray(
            rng.randint(0, 49408, (face_rows, 77)), jnp.int32
        ),
    }
    batch_noface = {
        k: v for k, v in batch.items() if not k.startswith("face_")
    }

    def micro(trainable, opt_state, i, seed):
        """One micro-step: with the fused schedule, only the window's last
        micro-step (i == ACCUM-1) runs the face branch."""
        fn, b = (
            (step_noface, batch_noface)
            if fused and i % ACCUM != ACCUM - 1
            else (step, batch)
        )
        return fn(trainable, frozen, opt_state, b, jax.random.PRNGKey(seed))

    t0 = time.perf_counter()
    trainable, opt_state, metrics = micro(trainable, opt_state, 0, 1)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    print(f"# [{ARM}] compile+first micro-step {compile_s:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)
    # finish the first optimizer step so windows start on a boundary
    for i in range(1, ACCUM):
        trainable, opt_state, metrics = micro(trainable, opt_state, i, 100 + i)
    jax.block_until_ready(metrics)

    window_rates = []
    k = 0
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS_PER_WINDOW * ACCUM):
            trainable, opt_state, metrics = micro(
                trainable, opt_state, k, 1000 + k
            )
            k += 1
        jax.block_until_ready(metrics)  # block only on the window boundary
        dt = (time.perf_counter() - t0) / STEPS_PER_WINDOW
        window_rates.append(dt)
        print(f"# [{ARM}] window {w}: {dt*1e3:.0f} ms/optimizer-step", flush=True)

    sec_per_step = float(np.median(window_rates))
    eff = MICRO * ACCUM
    print(json.dumps({
        "arm": ARM,
        "micro_batch": MICRO,
        "grad_accum": ACCUM,
        "face_batch": face_rows,
        "face_schedule": "window_final_only" if fused else "every_micro_step",
        "sec_per_optimizer_step": round(sec_per_step, 4),
        "imgs_per_sec": round(eff / sec_per_step, 3),
        "window_spread": round(
            (max(window_rates) - min(window_rates)) / sec_per_step, 4
        ),
        "compile_s": round(compile_s, 1),
        "final_loss": round(float(metrics["loss"]), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
