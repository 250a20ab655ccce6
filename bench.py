"""Benchmark: 512px identity-conditioned generation throughput per chip.

Measures the BASELINE.json north-star config 1/2: SD-1.5-scale PhotoVerse
pipeline (dual CLIP conditioning + adapters + injected text encoder + dual
cross-attention UNet + DPM-Solver++ 50-step denoise + VAE decode) at 512px,
end to end, on the attached accelerator. Weights are random — throughput is
shape-dependent only.

Baseline: the torch reference publishes no numbers (SURVEY.md §6). The
`vs_baseline` denominator is the analytic A100 estimate of the torch
REFERENCE pipeline derived in BASELINE.md ("Analytic A100 baseline
estimate"): fp32 weights (train.py:422) + two UNet evals per step even at
guidance 1 (infer.py:103-116) -> ~70.5 TFLOP/image at ~20-39 TFLOPs
sustained = 0.28-0.55, central 0.4 imgs/s/GPU. The stricter comparison
against an OPTIMIZED diffusers fp16 pipeline (~1.0 imgs/s on A100) is
emitted as `vs_optimized_diffusers`.

Statistical protocol (round 4): N timed trials after warmup, each with a
fresh PRNGKey (the axon relay caches repeat executions of identical
programs — see PERFORMANCE.md "Round 2 findings"). A trial whose
throughput deviates from the median by more than 20% is a tunnel hiccup
(round 3 recorded one 46x-off trial from a ~5-minute stall), not chip
variance (~±4%): such trials are retried once and, if still off, DROPPED
and recorded in "discarded" so the spread stat reflects the chip.

The JSON additionally carries the other BASELINE.md configs under
"extras": training-step throughput (config 4), the batch-64 conditioning
stage (config 3), and batch-1 serving latency (config 1's latency view).

Output contract (round 5 — BENCH_r04.json was rc:124/parsed:null because
the extras' multi-minute compiles ran BEFORE the one JSON print and the
driver timeout swallowed it):
  1. The primary JSON line prints IMMEDIATELY after the pipeline trials,
     before any extra touches the compiler. Whatever happens afterwards
     (timeout, OOM, crash), the artifact exists.
  2. Extras run under an explicit wall-clock budget
     (BENCH_WALL_BUDGET_S, default 1500s measured from process start);
     an extra whose estimated cost exceeds the remaining budget is
     skipped with a recorded reason instead of risking the run.
  3. One final ENRICHED line (primary fields + extras) re-prints at the
     end. Both lines are complete, parseable artifacts — whichever line
     the driver takes (first JSON or last line), the metric is there.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

# share the CLIs' persistent compile cache (utils/platform.py) so a fresh
# driver process warm-starts from prior train/generate/bench compiles —
# /tmp/jax_cache did NOT survive into the round-4 driver run (146.9 s
# compile there vs 94.4 s in round 3)
from photoverse_tpu.utils.platform import DEFAULT_CACHE_DIR, enable_compilation_cache

enable_compilation_cache(os.environ.get("PHOTOVERSE_COMPILE_CACHE", DEFAULT_CACHE_DIR))

A100_TORCH_REFERENCE_IMGS_PER_SEC = 0.4  # BASELINE.md analytic derivation
A100_OPTIMIZED_DIFFUSERS_IMGS_PER_SEC = 1.0  # conservative comparison

# MFU accounting (VERDICT r4 #7): useful FLOPs per generated image at the
# primary config — 50 single-eval DPM-Solver++ steps x ~0.68 TFLOP/UNet eval
# (BASELINE.md "FLOPs per image", consistent with published ~0.7/eval)
# + VAE decode ~2.5 TFLOP = ~36.5 TFLOP/image. Peak: v5e bf16 197 TFLOP/s
# (public spec); the chip's MEASURED matmul ceiling here is 153 TFLOP/s
# (PERFORMANCE.md round 1), reported alongside as mfu_vs_measured_peak.
TFLOP_PER_IMAGE = 36.5
V5E_BF16_PEAK_TFLOPS = 197.0
MEASURED_MATMUL_PEAK_TFLOPS = 153.0

# wall-clock budget for the whole process (primary + extras). The driver's
# timeout is not knowable from here; the budget exists so extras stop
# *voluntarily* while the enriched line can still print.
WALL_BUDGET_S = float(os.environ.get("BENCH_WALL_BUDGET_S", "1500"))
T_PROCESS_START = time.perf_counter()

BATCH = 16  # conv MXU utilization needs batch >= 16 (PERFORMANCE.md)
STEPS = 50
GUIDANCE = 1.0  # reference default (generate.py:25, README.md:79)
WARMUP_ITERS = 2  # 2: the first post-compile dispatch occasionally eats a
# tunnel hiccup that would land in trial 1 and inflate the spread stat
TRIALS = 5  # median-of-N; each trial varies the PRNGKey (relay cache)
OUTLIER_REL_DEV = 0.20  # > 20% off the median = hiccup (chip variance ~4%)


def note(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def robust_trials(run_trial, n=TRIALS, label=""):
    """Run `n` timed trials; retry-once then drop tunnel-hiccup outliers.

    `run_trial(seed)` returns a throughput (or latency) sample. A sample
    deviating more than OUTLIER_REL_DEV from the median of the first pass
    is re-run with a fresh seed; if the retry is ALSO off it is discarded
    (a stall, not a signal). Returns (kept, discarded)."""
    samples = []
    for i in range(n):
        samples.append(run_trial(10 + i))
        note(f"{label} trial {i + 1}/{n}: {samples[-1]:.4f}")
    med = float(np.median(samples))
    kept, discarded = [], []
    next_seed = 10 + n
    for s in samples:
        if med and abs(s - med) / med <= OUTLIER_REL_DEV:
            kept.append(s)
            continue
        note(f"{label} outlier {s:.4f} (median {med:.4f}) — retrying once")
        retry = run_trial(next_seed)
        next_seed += 1
        note(f"{label} retry: {retry:.4f}")
        if med and abs(retry - med) / med <= OUTLIER_REL_DEV:
            kept.append(retry)
            discarded.append(round(s, 4))
        else:
            discarded.append(round(s, 4))
            discarded.append(round(retry, 4))
    if not kept:  # every trial disagreed with the median — report raw
        kept, discarded = samples, []
    return kept, discarded


def bench_pipeline(modules, params):
    """Primary metric: batch-16 50-step generation throughput."""
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference

    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(BATCH, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(
            rng.randint(0, 49408, (BATCH, 77)), jnp.int32
        ),
        "concept_placeholder_idx": jnp.full((BATCH,), 5, jnp.int32),
    }

    def gen(params, rng_key):
        return run_inference(
            modules, params, solver, example, rng_key,
            guidance_scale=GUIDANCE, token_index=0,
        )

    jgen = jax.jit(gen)
    t_c = time.perf_counter()
    out = jgen(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    note(f"pipeline compiled+first run in {time.perf_counter() - t_c:.1f}s")
    for i in range(WARMUP_ITERS):
        # fetch a value like the timed trials so warmup really drains the
        # pipeline (block_until_ready is ACK-only through the tunnel)
        float(jnp.sum(jgen(params, jax.random.PRNGKey(2 + i))[0]))

    def run_trial(seed):
        t0 = time.perf_counter()
        out = jgen(params, jax.random.PRNGKey(seed))
        # fetch a VALUE, not just the ready-signal: through the axon tunnel
        # block_until_ready resolves on the remote ACK for small programs
        # (PERFORMANCE.md round-2 findings); summing forces real completion
        float(jnp.sum(out[0]))
        # the pipeline is an unsharded jax.jit — it executes on ONE device,
        # so per-chip throughput divides by 1 regardless of attached chips
        return BATCH / (time.perf_counter() - t0)

    return robust_trials(run_trial, TRIALS, "pipeline")


def bench_serving_latency(modules, params):
    """BASELINE config 1 as latency: batch-1, 50 steps, guidance 1."""
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference

    solver = DPMSolverMultistep.create(modules.schedule, STEPS)
    rng = np.random.RandomState(0)
    example = {
        "pixel_values": jnp.asarray(rng.randn(1, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(1, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (1, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((1,), 5, jnp.int32),
    }

    def gen(params, rng_key):
        return run_inference(modules, params, solver, example, rng_key,
                             guidance_scale=GUIDANCE, token_index=0)

    jgen = jax.jit(gen)
    t_c = time.perf_counter()
    float(jnp.sum(jgen(params, jax.random.PRNGKey(1))[0]))
    note(f"serving(b1) compiled+first run in {time.perf_counter() - t_c:.1f}s")
    float(jnp.sum(jgen(params, jax.random.PRNGKey(2))[0]))

    def run_trial(seed):
        t0 = time.perf_counter()
        float(jnp.sum(jgen(params, jax.random.PRNGKey(seed))[0]))
        return time.perf_counter() - t0

    kept, discarded = robust_trials(run_trial, 3, "serving_b1")
    return {
        "sec_per_image_b1_50step_g1": round(float(np.median(kept)), 4),
        "serving_discarded": discarded,
    }


def bench_conditioning(modules, params):
    """BASELINE config 3: CLIP image+text encoders + adapters at batch 64."""
    from photoverse_tpu.engine.inference import encode_condition

    rng = np.random.RandomState(0)
    px_clip = jnp.asarray(rng.randn(64, 224, 224, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 49408, (64, 77)), jnp.int32)
    pidx = jnp.full((64,), 5, jnp.int32)

    def cond(params, jitter):
        # vary the operand ON DEVICE: a fresh host array ships 38 MB through
        # the tunnel per trial; identical args hit the relay cache
        px = px_clip + jitter * 1e-3
        concept, id_ctx = encode_condition(modules, params, px, None)
        text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, ids, concept, pidx
        )
        return text_ctx, id_ctx

    f = jax.jit(cond)
    t_c = time.perf_counter()
    float(jnp.sum(f(params, jnp.float32(0))[0]))
    note(f"conditioning compiled+first run in {time.perf_counter() - t_c:.1f}s")
    float(jnp.sum(f(params, jnp.float32(100))[0]))

    def run_trial(seed):
        t0 = time.perf_counter()
        float(jnp.sum(f(params, jnp.float32(seed))[0]))
        return 64 / (time.perf_counter() - t0)

    kept, discarded = robust_trials(run_trial, 3, "conditioning_b64")
    return {
        "identities_per_sec_b64": round(float(np.median(kept)), 1),
        "conditioning_discarded": discarded,
    }


def bench_train_step():
    """BASELINE config 4: effective batch 16 (micro 8 x accum 2), LoRA 128.

    Built fresh (its own modules carry LoRA slots + remat); face loss off —
    its cost is the inner 10-step generation already covered by the
    pipeline metric. Reported imgs/s is per OPTIMIZER step."""
    from photoverse_tpu.engine.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from photoverse_tpu.models.assembly import build_models, init_params
    from photoverse_tpu.models.unet import UNetConfig

    micro, accum = 8, 2
    modules = build_models(
        dtype=jnp.bfloat16,
        unet_config=UNetConfig(lora_rank=128, lora_dropout=0.1, remat=True,
                               use_flash_attention=True),
    )
    params = init_params(modules, jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-5, max_train_steps=100,
                      lr_warmup_steps=0, gradient_accumulation_steps=accum)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx), donate_argnums=(0, 2))

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(micro, 512, 512, 3), jnp.float32),
        "pixel_values_clip": jnp.asarray(rng.randn(micro, 224, 224, 3), jnp.float32),
        "text_input_ids": jnp.asarray(rng.randint(0, 49408, (micro, 77)), jnp.int32),
        "concept_placeholder_idx": jnp.full((micro,), 5, jnp.int32),
    }

    t_c = time.perf_counter()
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(1)
    )
    jax.block_until_ready(metrics)
    note(f"train step compiled+first run in {time.perf_counter() - t_c:.1f}s")

    def run_trial(seed):
        nonlocal trainable, opt_state
        t0 = time.perf_counter()
        iters = 4  # optimizer steps per trial
        m = metrics
        for i in range(iters * accum):
            trainable, opt_state, m = step(
                trainable, frozen, opt_state, batch,
                jax.random.PRNGKey(seed * 100 + i),
            )
        float(jnp.sum(m["loss"]))
        return micro * accum * iters / (time.perf_counter() - t0)

    run_trial(5)  # warmup trial (drains the pipeline with a value fetch)
    kept, discarded = robust_trials(run_trial, 3, "train_step")
    return {
        "train_imgs_per_sec_eff_batch16_lora128": round(float(np.median(kept)), 2),
        "train_discarded": discarded,
    }


def _remaining_budget():
    return WALL_BUDGET_S - (time.perf_counter() - T_PROCESS_START)


def main():
    from photoverse_tpu.models.assembly import build_models, init_params

    note("building models")
    modules = build_models(dtype=jnp.bfloat16, fast_attention_scores=True,
                           use_flash_attention=True, fast_norms=True,
                           fused_blocks=True)
    params = init_params(modules, jax.random.PRNGKey(0))
    note("params initialized")

    trials, discarded = bench_pipeline(modules, params)
    med = float(np.median(trials))
    spread = (max(trials) - min(trials)) / med if med else 0.0
    achieved_tflops = med * TFLOP_PER_IMAGE

    record = {
        "metric": "512px imgs/sec/chip (50-step DPM-Solver++, PhotoVerse pipeline)",
        "value": round(med, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(med / A100_TORCH_REFERENCE_IMGS_PER_SEC, 4),
        "vs_optimized_diffusers": round(
            med / A100_OPTIMIZED_DIFFUSERS_IMGS_PER_SEC, 4
        ),
        "median": round(med, 4),
        "trials": [round(t, 4) for t in trials],
        "discarded": discarded,
        "spread": round(spread, 4),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu": round(achieved_tflops / V5E_BF16_PEAK_TFLOPS, 4),
        "mfu_vs_measured_peak": round(
            achieved_tflops / MEASURED_MATMUL_PEAK_TFLOPS, 4
        ),
        "extras": {},
    }
    # the INDESTRUCTIBLE print: the primary metric is on stdout before any
    # extra touches the compiler — a driver timeout during the extras can
    # no longer produce an artifact with parsed:null (BENCH_r04.json)
    print(json.dumps(record), flush=True)

    # Best-effort extras: the remaining BASELINE.md configs, each gated on
    # the remaining wall budget (estimates are warm-cache compile + trials;
    # a cold train-step compile alone can run ~25 min, so it goes last and
    # is the first to be skipped).
    extras = {}
    for name, fn, est_s in (
        ("serving", lambda: bench_serving_latency(modules, params), 120),
        ("conditioning", lambda: bench_conditioning(modules, params), 90),
    ):
        left = _remaining_budget()
        if left < est_s:
            note(f"extras[{name}] skipped: {left:.0f}s budget left < ~{est_s}s")
            extras[f"{name}_skipped"] = f"wall budget ({left:.0f}s left, ~{est_s}s est)"
            continue
        try:
            extras.update(fn())
        except Exception as e:  # noqa: BLE001 — diagnostics only
            note(f"extras[{name}] failed: {type(e).__name__}: {e}")
            extras[f"{name}_error"] = f"{type(e).__name__}: {e}"
    # free the inference params before the train bench builds its own full
    # state (frozen backbone + trainables + Adam moments) — both resident
    # at once risks HBM exhaustion on a 16 GB chip
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "delete"):
            leaf.delete()
    del params, modules
    left = _remaining_budget()
    if left < 420:
        note(f"extras[train] skipped: {left:.0f}s budget left < ~420s")
        extras["train_skipped"] = f"wall budget ({left:.0f}s left, ~420s est)"
    else:
        try:
            extras.update(bench_train_step())
        except Exception as e:  # noqa: BLE001 — diagnostics only
            note(f"extras[train] failed: {type(e).__name__}: {e}")
            extras["train_error"] = f"{type(e).__name__}: {e}"

    # final ENRICHED line: same primary fields + the extras. If the driver
    # takes the last line it gets everything; if the process dies before
    # reaching here, the first print above already carries the metric.
    record["extras"] = extras
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
