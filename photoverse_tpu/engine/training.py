"""Training engine: the jitted PhotoVerse train step.

TPU-native counterpart of the reference hot loop (/root/reference/
train.py:459-549):

  loss = MSE(eps_pred, eps)                                (train.py:516)
       + 0.01  * mean|concept_text_embeddings|             (train.py:509,535)
       + 0.001 * mean ||v_ip||                             (train.py:512-513)
       + 0.01  * face_loss                                 (train.py:532,535)

Design:
  - gradients flow only into the trainable partition (adapters + attn2
    ip-projections + LoRA) — the frozen backbone partition is a closure
    constant, so there is no need for requires_grad bookkeeping;
  - per-group gradient clipping to norm 1 for text_adapter / image_adapter /
    unet, exactly mirroring the three clip_grad_norm_ calls
    (train.py:541-544);
  - AdamW + constant/constant-with-warmup schedule (train.py:373-385);
  - gradient accumulation via optax.MultiSteps (accelerator.accumulate
    equivalent, train.py:464);
  - optional face loss: an inner N-step generation where only the final
    solver step carries gradients (run_inference training_mode,
    infer.py:99), embedded through engine.inference.denoise(num_grad_steps=1).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from photoverse_tpu.ckpt.checkpoint import combine_params, partition_params
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import denoise, encode_condition
from photoverse_tpu.models.assembly import PhotoVerseModules, PhotoVerseParams

__all__ = [
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "clip_groups",
    "normalize_pixel_batch",
]


def normalize_pixel_batch(batch: Dict) -> Dict:
    """Normalize uint8-transferred pixel batches ON DEVICE.

    The uint8 transfer path (--uint8_transfer; data/preprocessing.py
    *_u8) ships raw uint8 crops — 4x fewer host->device bytes — and
    defers the normalization here: VAE keys to [-1,1], CLIP keys through
    CLIP mean/std. Exact vs the float32 host pipeline because PIL's RGB
    resize already emits uint8 before the host would have normalized.
    Float inputs pass through untouched (dtype is static under jit, so
    the flag-off path traces to the identical HLO as before)."""
    from photoverse_tpu.data.preprocessing import CLIP_MEAN, CLIP_STD

    out = dict(batch)
    for k in ("pixel_values", "face_pixel_values"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) / 127.5 - 1.0
    for k in ("pixel_values_clip", "face_pixel_values_clip"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = (
                out[k].astype(jnp.float32) / 255.0 - jnp.asarray(CLIP_MEAN)
            ) / jnp.asarray(CLIP_STD)
    return out


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    lr_scheduler: str = "constant"  # constant | constant_with_warmup | linear | cosine
    lr_warmup_steps: int = 500
    max_train_steps: int = 5000
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    concept_reg_weight: float = 0.01
    visual_reg_weight: float = 0.001
    face_loss_weight: float = 0.01
    # face-loss inner generation (train.py:526-530)
    face_loss_timesteps: int = 10
    face_loss_guidance: float = 2.0


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """diffusers get_scheduler equivalents (train.py:380-385)."""
    base = cfg.learning_rate
    warm = cfg.lr_warmup_steps
    total = cfg.max_train_steps
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(base)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm), optax.constant_schedule(base)],
            [warm],
        )
    if cfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base, warm),
                optax.linear_schedule(base, 0.0, max(total - warm, 1)),
            ],
            [warm],
        )
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(0.0, base, warm, total)
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler}")


def clip_groups(grads_flat: Dict, max_norm: float) -> Dict:
    """Per-model-group global-norm clipping (the reference clips each of
    text_adapter / image_adapter / unet separately, train.py:541-544)."""
    groups: Dict[str, list] = {}
    for key in grads_flat:
        groups.setdefault(key[0], []).append(key)
    out = dict(grads_flat)
    for _, keys in groups.items():
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(grads_flat[k].astype(jnp.float32))) for k in keys)
        )
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
        for k in keys:
            out[k] = grads_flat[k] * scale
    return out


def clip_groups_tx(max_norm: float) -> optax.GradientTransformation:
    """`clip_groups` as an optax transformation so it can sit INSIDE
    MultiSteps — clipping then applies to the fully-accumulated gradient at
    the sync boundary, exactly like the reference's clip_grad_norm_ calls
    under accelerator.sync_gradients (train.py:540-544), not per micro-batch."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return clip_groups(updates, max_norm), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    sched = make_lr_schedule(cfg)
    tx = optax.chain(
        clip_groups_tx(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, sched


def make_train_step(
    modules: PhotoVerseModules,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    face_loss_fn: Optional[Callable] = None,
    face_solver: Optional[DPMSolverMultistep] = None,
    latent_size: int = 64,
    text_act_sharding=None,
    face_weight_scale: float = 1.0,
):
    """Build the jittable train step.

    `face_weight_scale` multiplies the face-loss weight; it exists for the
    fused-face-accumulation schedule (cli/train.py --fuse_face_accum): with
    gradient accumulation the face branch runs only on the LAST micro-step
    of each window, on a sub-batch `accum`x wider, with weight scaled by
    `accum`. optax.MultiSteps averages the window's gradients, so
    (0 + ... + accum*w*g_face(accum*n rows)) / accum == w*g_face — the same
    expected (and, with i.i.d. rows, same-variance) gradient as the
    reference's per-micro-batch face loss (train.py:521-535), at half the
    inner-generation UNet dispatches (the evals are weight-read-bound at
    these tiny batches, so doubling their width is nearly free —
    PERFORMANCE.md round-5 A/B).

    `text_act_sharding` (optional NamedSharding, normally
    parallel.mesh.batch_sharding(mesh)) pins the CLIP text encoder's
    activations to batch-over-data on multi-axis meshes — without it the
    SPMD partitioner invents model-axis shardings in the text backward and
    pays involuntary full-rematerialization reshards (models/clip.py
    _CLIPLayer docstring; VERDICT round-3 weak #4).

    step(trainable, frozen, opt_state, batch, rng) ->
        (new_trainable, new_opt_state, metrics)

    batch keys (NHWC device arrays): pixel_values (B,512,512,3),
    pixel_values_clip (B,224,224,3), text_input_ids (B,77),
    concept_placeholder_idx (B,), and — when face loss is on —
    face_pixel_values / face_pixel_values_clip / face_text_input_ids /
    face_concept_placeholder_idx for the pre-sliced face sub-batch
    (reference random_batch_slicing, train.py:522-525).
    """
    # Int8Dense (ops/quant.py) rounds its operands — round() has ZERO
    # gradient, so adapter gradients flowing through the text encoder
    # would silently vanish: the loss stays finite while training stalls.
    # Refuse loudly instead of failing invisibly.
    if getattr(modules.text_encoder.config, "int8_dense", False) or getattr(
        modules.vision_encoder.config, "int8_dense", False
    ):
        raise ValueError(
            "int8_conditioning/int8_dense is inference-only: the quantizer's "
            "round() has zero gradient and would silently stall adapter "
            "training. Build the training modules without it."
        )
    schedule = modules.schedule

    def loss_fn(trainable: Dict, frozen: Dict, batch: Dict, rng: jax.Array):
        params = combine_params(trainable, frozen)
        px = batch["pixel_values"]
        px_clip = batch["pixel_values_clip"]
        ids = batch["text_input_ids"]
        pidx = batch["concept_placeholder_idx"].reshape(-1)
        B = px.shape[0]
        k_vae, k_noise, k_t, k_fusion, k_face, k_drop = jax.random.split(rng, 6)

        latents = modules.vae.apply(
            {"params": params.vae}, px, k_vae, method="encode_sample"
        )
        latents = jax.lax.stop_gradient(latents) * modules.scaling_factor
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)

        concept, id_ctx = encode_condition(modules, params, px_clip, token_index=None)
        text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, ids, concept, pidx,
            act_sharding=text_act_sharding,
        )

        eps_pred, v_norms = modules.unet.apply(
            {"params": params.unet},
            noisy,
            t,
            text_ctx,
            id_ctx,
            train=True,
            fusion_rng=k_fusion,
            rngs={"dropout": k_drop},  # LoRA dropout (train.py lora_dropout 0.1)
        )

        diffusion_loss = jnp.mean(
            jnp.square(eps_pred.astype(jnp.float32) - noise.astype(jnp.float32))
        )
        concept_reg = jnp.mean(jnp.abs(concept.astype(jnp.float32)))
        visual_reg = jnp.mean(v_norms.astype(jnp.float32))

        floss = jnp.zeros((), jnp.float32)
        if face_loss_fn is not None:
            floss = _face_loss(params, batch, k_face)

        total = (
            diffusion_loss
            + cfg.concept_reg_weight * concept_reg
            + cfg.visual_reg_weight * visual_reg
            + cfg.face_loss_weight * face_weight_scale * floss
        )
        # the OPTIMIZED objective carries face_weight_scale (the fused
        # schedule's window reweighting); the REPORTED total uses the
        # unscaled face term so 'loss' is comparable across schedules —
        # loss_face below is likewise unscaled. With the default scale of
        # 1.0 the two are the same expression.
        reported = (
            diffusion_loss
            + cfg.concept_reg_weight * concept_reg
            + cfg.visual_reg_weight * visual_reg
            + cfg.face_loss_weight * floss
        )
        metrics = {
            "loss": reported,
            "loss_mle": diffusion_loss,
            "loss_reg_concept_text": concept_reg,
            "loss_reg_cross_attn_visual": visual_reg,
            "loss_face": floss,
        }
        return total, metrics

    def _face_loss(params: PhotoVerseParams, batch: Dict, rng: jax.Array):
        """In-training generation on the face sub-batch with last-step-only
        grad, then identity cosine loss (train.py:521-532)."""
        fpx = batch["face_pixel_values"]
        fpx_clip = batch["face_pixel_values_clip"]
        fids = batch["face_text_input_ids"]
        fpidx = batch["face_concept_placeholder_idx"].reshape(-1)
        n = fpx.shape[0]
        k_noise, k_vae, k_fusion, k_drop = jax.random.split(rng, 4)
        in_ch = modules.unet.config.in_channels
        noise = jax.random.normal(k_noise, (n, latent_size, latent_size, in_ch))

        lat = modules.vae.apply(
            {"params": params.vae}, fpx, k_vae, method="encode_sample"
        )
        lat = jax.lax.stop_gradient(lat) * modules.scaling_factor
        latents = face_solver.add_noise(lat, noise, 0) * face_solver.init_noise_sigma

        concept, id_ctx = encode_condition(modules, params, fpx_clip, token_index=0)
        text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, fids, concept, fpidx,
            act_sharding=text_act_sharding,
        )
        uncond_text_ctx = uncond_id_ctx = None
        if cfg.face_loss_guidance != 1.0:
            _, uncond_id_ctx = encode_condition(
                modules, params, jnp.zeros_like(fpx_clip), token_index=0
            )
            uncond_text_ctx, _ = modules.text_encoder.apply(
                {"params": params.text_encoder}, batch["face_uncond_input_ids"],
                act_sharding=text_act_sharding,
            )
        # the grad-enabled trailing step runs with stochastic fusion + LoRA
        # dropout active, matching the reference where is_grad_enabled() is
        # True on exactly that step (attention_processor.py:410-420)
        latents = denoise(
            modules, params, face_solver, latents,
            text_ctx, id_ctx, uncond_text_ctx, uncond_id_ctx,
            cfg.face_loss_guidance, num_grad_steps=1,
            train=True, fusion_rng=k_fusion, dropout_rng=k_drop,
        )
        gen = modules.vae.apply(
            {"params": params.vae}, latents / modules.scaling_factor, method="decode"
        )
        gen = jnp.clip(gen, -1.0, 1.0)
        # reference calls FaceLoss(x, x_gen, normalize=False) with maximize
        # (1 - cos); x is the [-1,1] training image (train.py:532)
        return face_loss_fn(params, fpx, gen)

    def train_step(trainable, frozen, opt_state, batch, rng):
        batch = normalize_pixel_batch(batch)  # no-op HLO for float batches
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, rng
        )
        # clipping lives inside tx (clip_groups_tx chained before adamw, and
        # inside MultiSteps when accumulating) so it acts on the accumulated
        # gradient at the sync boundary, like the reference
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return train_step


def init_train_state(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    tx: optax.GradientTransformation,
):
    trainable, frozen = partition_params(params)
    opt_state = tx.init(trainable)
    return trainable, frozen, opt_state
