"""Trace one canonical-recipe (face-loss) optimizer step and dump the
op-level device-time breakdown — the training-step counterpart of
scripts/profile_unet.py. Reuses bench_train_face.py's exact construction
(same shapes/config -> compilation-cache hit).

Usage:  python scripts/profile_train_face.py [bf16|f32]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

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
MICRO, ACCUM = 8, 2
FACE = max(int(0.25 * MICRO), 1)
TRACE_DIR = f"/tmp/prof_train_{ARM}"


def main():
    dtype = jnp.bfloat16 if ARM == "bf16" else jnp.float32
    modules = build_models(
        dtype=dtype,
        unet_config=UNetConfig(
            lora_rank=128, lora_dropout=0.1, remat=True,
            use_flash_attention=True,
        ),
        vae_config=VAEConfig(remat=True, use_flash_attention=True),
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    face_loss_obj = load_face_loss("arcface", None)
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
            modules, cfg, tx, face_loss_fn=face_loss_fn, face_solver=face_solver
        ),
        donate_argnums=(0, 2),
    )

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(MICRO, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(MICRO, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (MICRO, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((MICRO,), 5, jnp.int32),
        "face_pixel_values": jnp.asarray(rng.randn(FACE, 512, 512, 3), jnp.float32),
        "face_pixel_values_clip": jnp.asarray(
            rng.randn(FACE, 224, 224, 3), jnp.float32
        ),
        "face_text_input_ids": jnp.asarray(
            rng.randint(0, 49408, (FACE, 77)), jnp.int32
        ),
        "face_concept_placeholder_idx": jnp.full((FACE,), 5, jnp.int32),
        "face_uncond_input_ids": jnp.asarray(
            rng.randint(0, 49408, (FACE, 77)), jnp.int32
        ),
    }

    k = 0
    for _ in range(ACCUM + 1):  # compile + settle on an optimizer boundary
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(k)
        )
        k += 1
    jax.block_until_ready(metrics)
    print("# warm", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(ACCUM):  # ONE optimizer step = ACCUM micro-steps
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(k)
        )
        k += 1
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()
    print("# traced", flush=True)

    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    tot = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            # device-op rows only: skip python/runtime threads by name shape
            if name.startswith(("Thread", "process_", "tsl::", "py_")):
                continue
            tot[name.split(".")[0]] += e["dur"]
    for name, us in tot.most_common(45):
        print(f"{us/1e3:10.1f} ms  {name}")


if __name__ == "__main__":
    main()
