"""Training CLI — flag surface of the reference train.py
(/root/reference/train.py:37-285), TPU data-parallel execution.

The hot path is one jitted train step over a GSPMD mesh: batch sharded on
the data axis, params replicated by default, optionally FSDP/ZeRO-3-sharded
over the data axis (--fsdp, parallel/fsdp.py) and/or Megatron-style
tensor-parallel over a model axis (--tensor_parallel, parallel/tp.py).
Periodic sample grids, face-similarity metric, checkpointing and metric
logging mirror train.py:551-628.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np

# --recipe presets: the measured-best knob bundles, applied as argparse
# DEFAULTS (explicit flags on the command line still win). `canonical` is
# the reference's one-liner ops recipe (prepare_dataset_and_train.sh:1 —
# 40k steps, batch 16, LoRA 128, arcface, lr 1e-5) plus every knob this
# repo's A/Bs adopted for it: bf16 compute (+8.4%), flash attention + remat
# (required at 512px/16GB), auto grad accumulation (OOM-free effective
# batch 16), async checkpointing, the fused face-accumulation schedule
# (+12.3%), and uint8 pixel transfer (+28.9% on the real loop — both
# PERFORMANCE.md round-5 A/Bs). Pass --face_model_weights (or
# --allow_random_face_model for smoke tests) alongside.
RECIPE_PRESETS = {
    "canonical": dict(
        mixed_precision="bf16",
        flash_attention=True,
        remat=True,
        use_lora=True,
        lora_rank=128,
        lora_alpha=1.0,
        lora_dropout=0.1,
        learning_rate=1e-5,
        lr_scheduler="constant",
        lr_warmup_steps=500,
        train_batch_size=16,
        max_train_steps=40000,
        auto_grad_accum=True,
        face_loss="arcface",
        fuse_face_accum=True,
        async_checkpointing=True,
        use_random_prompts=True,
        uint8_transfer=True,
    ),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PhotoVerse TPU training")
    p.add_argument("--recipe", type=str, default=None,
                   choices=sorted(RECIPE_PRESETS),
                   help="Apply a measured-best preset as flag DEFAULTS "
                        "(explicit flags still override; preset booleans "
                        "are disabled with their --no-* forms, e.g. "
                        "--no-flash_attention). 'canonical' = the reference "
                        "40k recipe with every adopted TPU knob")
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="runwayml/stable-diffusion-v1-5",
                   help="Local diffusers-layout SD checkpoint directory")
    p.add_argument("--pretrained_photoverse_path", type=str, default=None)
    p.add_argument("--data_root_path", type=str, required=True)
    p.add_argument("--img_subfolder", type=str, default="images")
    p.add_argument("--mask_subfolder", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="results")
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=5000)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--checkpoint_save_steps", type=int, default=2000)
    p.add_argument("--samples_save_steps", type=int, default=500)
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=["no", "fp16", "bf16"])
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--extra_num_tokens", type=int, default=4)
    p.add_argument("--image_encoder_layers_idx", nargs="+", type=int,
                   default=[4, 8, 12, 16])
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--auto_grad_accum", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="When the per-chip micro-batch would exceed "
                        "--max_microbatch_per_chip (v5e-16GB fits ~8 at "
                        "512px), automatically split the train batch into "
                        "accumulation micro-steps instead of OOMing")
    p.add_argument("--max_microbatch_per_chip", type=int, default=8)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--denoise_timesteps", type=int, default=10)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--num_of_samples_to_save", type=int, default=4)
    p.add_argument("--save_samples_with_various_prompts", action="store_true")
    p.add_argument("--use_random_prompts", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--face_loss", type=str, default=None,
                   choices=["arcface", "facenet"])
    p.add_argument("--face_model_weights", type=str, default=None,
                   help="Pretrained ArcFace/FaceNet .pt weights for the face "
                        "loss (converted on load). Required for a meaningful "
                        "identity signal; the reference downloads these "
                        "automatically (utils/arcface_utils.py:159-177)")
    p.add_argument("--allow_random_face_model", action="store_true",
                   help="Run --face_loss with randomly-initialized embedder "
                        "weights anyway (testing only; the identity loss is "
                        "meaningless without pretrained weights)")
    p.add_argument("--face_loss_sample_ratio", type=float, default=0.25)
    p.add_argument("--fuse_face_accum", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="With gradient accumulation, run the face-loss "
                        "inner generation only on the LAST micro-step of "
                        "each window, on an accum-x wider face sub-batch "
                        "with accum-x weight — the same expected gradient "
                        "(MultiSteps averages the window) at half the "
                        "weight-read-bound inner UNet dispatches "
                        "(engine/training.py face_weight_scale)")
    p.add_argument("--use_lora", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--lora_alpha", type=float, default=1)
    p.add_argument("--lora_dropout", type=float, default=0.1)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--native_loader", action="store_true",
                   help="Use the C++ batch data loader (plain and masked "
                        "datasets; native/dataloader.cc)")
    p.add_argument("--uint8_transfer", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="Ship training pixels host->device as raw uint8 "
                        "crops and normalize on device (4x fewer transfer "
                        "bytes per batch; numerically exact — PIL resize "
                        "already emits uint8). Not supported with "
                        "--native_loader")
    p.add_argument("--resume_from", type=str, default=None,
                   help="Native .msgpack checkpoint to fully resume from "
                        "(weights + optimizer state + global step)")
    p.add_argument("--checkpoint_format", type=str, default="native",
                   choices=["native", "pt", "both"],
                   help="native: msgpack with optimizer state (full resume); "
                        "pt: reference-format photoverse_{step}.pt "
                        "(modeling_utils.py:29-50, torch-loadable); both")
    p.add_argument("--async_checkpointing", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="Write checkpoints on a background thread so the "
                        "train step never waits on checkpoint I/O")
    p.add_argument("--shard_optimizer_state", action="store_true",
                   help="ZeRO-1-style: shard the Adam moments over the data "
                        "axis (each chip holds 1/N of the optimizer state)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style (parallel/fsdp.py): shard ALL "
                        "parameters — frozen backbone, trainables, optimizer "
                        "state — over the data axis; XLA all-gathers weights "
                        "where used and reduce-scatters gradients. Cuts "
                        "per-chip parameter memory ~Nx (the frozen f32 "
                        "backbone alone is ~5 GB at SD-1.5 scale)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron-style UNet tensor parallelism over a "
                        "model mesh axis (parallel/tp.py), composing with "
                        "data parallelism on a 2-D mesh. Must divide "
                        "num_heads (8 for SD-1.5). --flash_attention stays "
                        "available through its shard_map wrapper "
                        "(parallel/flash.py); --fused_blocks is not")
    p.add_argument("--flash_attention", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="Pallas flash self-attention (exact; TPU fast path)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="Rematerialize UNet blocks and (with --face_loss) "
                        "the VAE decoder (activation checkpointing); "
                        "required at 512px on 16 GB chips")
    p.add_argument("--profile_steps", type=str, default=None,
                   help="'start,stop' step range to capture a jax.profiler "
                        "trace into {output_dir}/profile")
    args = p.parse_args(argv)
    if args.recipe:
        # re-parse with the preset as defaults: flags the user typed are in
        # argv and still win; everything else takes the preset value
        p.set_defaults(**RECIPE_PRESETS[args.recipe])
        args = p.parse_args(argv)
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank != -1 and env_local_rank != args.local_rank:
        args.local_rank = env_local_rank
    return args


def check_args(args):
    """Reference check_args (train.py:287-298)."""
    if args.extra_num_tokens < 0:
        raise ValueError("extra_num_tokens should be greater than or equal to 0")
    if len(args.image_encoder_layers_idx) != args.extra_num_tokens:
        raise ValueError(
            "The number of image encoder layers to use as tokens should be "
            "equal to extra_num_tokens"
        )
    if 0 in args.image_encoder_layers_idx:
        raise ValueError(
            "The image encoder extra tokens layers cant be the last layer "
            "since we always use the last layer"
        )
    if getattr(args, "uint8_transfer", False) and args.native_loader:
        raise ValueError(
            "--uint8_transfer is not supported with --native_loader (the "
            "C++ loader emits normalized float32 batches); drop one of "
            "them (--recipe canonical users: pass --no-uint8_transfer)"
        )


def main(argv=None):
    args = parse_args(argv)
    check_args(args)
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import signal
    import time

    import jax

    if args.cpu:
        from photoverse_tpu.utils.platform import force_cpu

        force_cpu()
    else:
        # SD-scale programs take 10-20 min through the TPU compile service;
        # the persistent cache makes restart-after-preemption (--resume_from)
        # pay that once per program shape (utils/platform.py)
        from photoverse_tpu.utils.platform import (
            DEFAULT_CACHE_DIR,
            enable_compilation_cache,
        )

        enable_compilation_cache(
            os.environ.get("PHOTOVERSE_COMPILE_CACHE", DEFAULT_CACHE_DIR)
        )
    import jax.numpy as jnp

    from photoverse_tpu.ckpt.checkpoint import (
        AsyncCheckpointer,
        combine_params,
        host_save_snapshot,
        partition_params,
        save_progress,
        save_progress_pt,
    )
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.data.dataset import (
        BatchLoader,
        CustomDataset,
        CustomDatasetWithMasks,
    )
    from photoverse_tpu.data.prompts import prepare_prompt, random_batch_slicing
    from photoverse_tpu.engine.inference import run_inference
    from photoverse_tpu.engine.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from photoverse_tpu.models.assembly import load_models
    from photoverse_tpu.parallel.mesh import (
        batch_sharding,
        host_batch_slice,
        make_mesh,
        replicated,
        shard_batch,
        zero1_sharding,
    )
    from photoverse_tpu.utils.image import (
        denormalize,
        denormalize_clip,
        save_images_grid,
        to_pil,
    )
    from photoverse_tpu.utils.metrics import MetricsWriter

    seed = args.seed if args.seed is not None else 0
    if args.mixed_precision == "fp16":
        # fp16 has no native TPU compute path (the MXU computes in bf16/f32);
        # accepting it silently would run f32 — refuse instead of lying
        raise ValueError(
            "--mixed_precision fp16 is not supported on TPU; use bf16 "
            "(the TPU-native half precision) or no"
        )
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

    tokenizer, modules, params, lora_config = load_models(
        args.pretrained_model_name_or_path,
        extra_num_tokens=args.extra_num_tokens,
        photoverse_path=args.pretrained_photoverse_path,
        use_lora=args.use_lora,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        lora_dropout=args.lora_dropout,
        image_encoder_layers_idx=tuple(args.image_encoder_layers_idx),
        dtype=dtype,
        use_flash_attention=args.flash_attention,
        tp_friendly_ffn=args.tensor_parallel > 1,
        seed=seed,
    )
    if args.remat:
        import dataclasses as _dc

        modules = _dc.replace(
            modules,
            unet=modules.unet.clone(
                config=_dc.replace(modules.unet.config, remat=True)
            ),
            # the face loss backprops through vae.decode at full resolution;
            # without decoder remat that backward alone holds ~10 GB of f32
            # temps at 512px/batch-8 and OOMs a 16 GB chip (models/vae.py
            # VAEConfig.remat)
            vae=modules.vae.clone(
                config=_dc.replace(modules.vae.config, remat=True)
            ),
        )
    latent_factor = 2 ** (len(modules.vae.config.block_out_channels) - 1)
    latent_size = args.resolution // latent_factor

    # face loss
    face_loss_fn = None
    face_solver = None
    face_metric = None
    if args.face_loss:
        from photoverse_tpu.models.face_loss import load_face_loss, make_face_loss_fn

        if args.face_model_weights is None and not args.allow_random_face_model:
            raise ValueError(
                f"--face_loss {args.face_loss} requires --face_model_weights "
                "(pretrained embedder .pt); a randomly-initialized embedder "
                "produces a meaningless identity signal. Pass "
                "--allow_random_face_model to override for testing."
            )
        if args.face_model_weights is None:
            print(
                "WARNING: --face_loss with RANDOM embedder weights "
                "(--allow_random_face_model): the identity loss is noise."
            )
        face_loss_obj = load_face_loss(args.face_loss, args.face_model_weights)
        face_loss_fn = make_face_loss_fn(args.face_loss, loss=face_loss_obj)
        # the reference hardcodes 10 inner steps (train.py:530); the
        # TrainConfig field is the single source of truth for that constant
        face_solver = DPMSolverMultistep.create(
            modules.schedule, TrainConfig.face_loss_timesteps
        )
        # in-training identity metric at sample steps (train.py:569-573):
        # cosine similarity of real vs generated faces, maximize=False
        face_metric = jax.jit(
            lambda x, g: face_loss_obj(x, g, maximize=False, normalize=False)
        )

    # auto grad-accum: split the train batch into micro-steps when the
    # per-chip slice would exceed HBM (v5e-16GB fits ~8 at 512px). Gradients
    # accumulate inside optax.MultiSteps; clipping applies to the
    # accumulated gradient at the sync boundary (engine.training).
    tp = args.tensor_parallel
    if tp > 1 and jax.device_count() % tp:
        raise ValueError(
            f"--tensor_parallel {tp} must divide the device count "
            f"{jax.device_count()}"
        )
    n_mesh_pre = jax.device_count() // max(tp, 1)
    while args.train_batch_size % n_mesh_pre:
        n_mesh_pre -= 1
    accum = args.gradient_accumulation_steps
    micro_batch = args.train_batch_size
    if args.auto_grad_accum and accum == 1:
        per_chip = args.train_batch_size // n_mesh_pre
        if per_chip > args.max_microbatch_per_chip:
            for cand in range(2, per_chip + 1):
                micro = args.train_batch_size // cand
                if (
                    args.train_batch_size % cand == 0
                    and micro % n_mesh_pre == 0
                    and micro // n_mesh_pre <= args.max_microbatch_per_chip
                ):
                    accum = cand
                    micro_batch = micro
                    break
            print(
                f"auto_grad_accum: micro-batch {micro_batch} x {accum} "
                f"accumulation steps ({micro_batch // n_mesh_pre}/chip)"
            )
    # (manual --gradient_accumulation_steps keeps micro_batch == the loader
    # batch: each loader batch is one micro-step, reference accelerate
    # semantics)

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        gradient_accumulation_steps=accum,
        face_loss_guidance=args.guidance_scale,
    )
    tx, lr_sched = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    start_step = 0
    if args.resume_from:
        from photoverse_tpu.ckpt.checkpoint import load_progress, partition_params

        params, opt_restored, start_step = load_progress(
            args.resume_from, combine_params(trainable, frozen), opt_state
        )
        trainable, frozen = partition_params(params)
        if opt_restored is not None:
            opt_state = opt_restored
        print(f"resumed from {args.resume_from} at step {start_step}")

    # data
    ds_kw = dict(
        tokenizer=tokenizer, size=args.resolution,
        use_random_templates=args.use_random_prompts, seed=seed,
        img_subfolder=args.img_subfolder,
        clip_size=modules.vision_encoder.config.image_size,
        uint8_pixels=args.uint8_transfer,
    )
    if args.mask_subfolder is None:
        dataset = CustomDataset(args.data_root_path, **ds_kw)
    else:
        dataset = CustomDatasetWithMasks(
            args.data_root_path, mask_subfolder=args.mask_subfolder, **ds_kw
        )
    # multi-host: every process decodes only its rows of each global batch
    # (all hosts share the shuffle seed, so slices tile the global batch)
    host_slice = (
        host_batch_slice(micro_batch) if jax.process_count() > 1 else None
    )
    host_bs = micro_batch // jax.process_count()
    loader = BatchLoader(
        dataset, micro_batch, shuffle=True, seed=seed,
        num_workers=args.dataloader_num_workers,
        native=args.native_loader,
        host_slice=host_slice,
        host_id=jax.process_index(),
    )

    # mesh: data axis over the largest device count dividing the batch,
    # optional model axis for tensor parallelism (parallel/tp.py)
    n_mesh = n_mesh_pre
    while micro_batch % n_mesh:
        n_mesh -= 1
    if tp > 1:
        from photoverse_tpu.parallel.tp import (
            make_mesh_2d,
            tree_tp_shardings,
            validate_tp,
        )

        mesh = make_mesh_2d(n_mesh, tp)
        if args.flash_attention:
            # keep the Pallas fast path under TP: heads-sharded shard_map
            # wrapper, differentiable per-shard (parallel/flash.py)
            from photoverse_tpu.parallel.flash import enable_sharded_flash

            modules = enable_sharded_flash(modules, mesh, "tensor")
        validate_tp(modules.unet.config, tp)
        t_sh = tree_tp_shardings(mesh, trainable)
        f_sh = tree_tp_shardings(mesh, frozen)
        o_base = tree_tp_shardings(mesh, opt_state)
    else:
        mesh = make_mesh(n_mesh)
        t_sh = f_sh = o_base = None
    # sample-grid generation runs on gathered (replicated) params and small
    # batches (num_of_samples_to_save can be < the data axis), so it must
    # NOT inherit the shard_map flash wrapper's mesh-divisibility
    # constraint — strip it back to the bare Pallas kernel for sampling
    sample_modules = modules
    if getattr(modules.unet.config, "flash_fn", None) is not None:
        import dataclasses as _dc

        sample_modules = _dc.replace(
            modules,
            unet=modules.unet.clone(
                config=_dc.replace(modules.unet.config, flash_fn=None)
            ),
        )
    repl = replicated(mesh)
    as_tree = lambda sh, t: (
        sh if sh is not None else jax.tree.map(lambda _: repl, t)
    )
    t_sh, f_sh = as_tree(t_sh, trainable), as_tree(f_sh, frozen)
    use_fsdp = args.fsdp and n_mesh > 1
    if use_fsdp:
        # ZeRO-3: shard every param tree (and below, the optimizer state)
        # over the data axis; XLA all-gathers weights at their use sites
        # and reduce-scatters the gradients (parallel/fsdp.py)
        from photoverse_tpu.parallel.fsdp import fsdp_shardings

        t_sh = fsdp_shardings(mesh, trainable, base=t_sh)
        f_sh = fsdp_shardings(mesh, frozen, base=f_sh)
    trainable = jax.tree.map(jax.device_put, trainable, t_sh)
    frozen = jax.tree.map(jax.device_put, frozen, f_sh)
    if use_fsdp or (args.shard_optimizer_state and n_mesh > 1):
        # ZeRO-1/3: each chip holds 1/n_mesh of the Adam moments; GSPMD
        # inserts the gather/scatter around the optimizer update. The
        # classic leading-dim zero1 spec is kept for the plain data-
        # parallel case (bit-for-bit with prior rounds); FSDP/TP use the
        # largest-free-dim spec that composes with the param shardings.
        if use_fsdp or tp > 1:
            from photoverse_tpu.parallel.fsdp import fsdp_shardings

            opt_sharding = fsdp_shardings(
                mesh, opt_state, base=as_tree(o_base, opt_state)
            )
        else:
            opt_sharding = zero1_sharding(mesh, opt_state)
    else:
        opt_sharding = as_tree(o_base, opt_state)
    opt_state = jax.tree.map(jax.device_put, opt_state, opt_sharding)
    # tp > 1 model-axis-shards the Adam moments via o_base even without
    # --fsdp/--shard_optimizer_state, so it needs the pre-save gather too
    opt_is_sharded = (
        use_fsdp or tp > 1 or (args.shard_optimizer_state and n_mesh > 1)
    )
    params_are_sharded = use_fsdp or tp > 1

    # fused face accumulation: the face branch runs only on each window's
    # final micro-step, accum-x wider and accum-x weighted — same expected
    # gradient through the MultiSteps average, ~half the inner-generation
    # UNet dispatches (engine/training.py make_train_step docstring)
    fuse_face = bool(args.fuse_face_accum and args.face_loss and accum > 1)
    _text_sh = batch_sharding(mesh) if n_mesh * tp > 1 else None
    step_fn = make_train_step(
        modules, cfg, tx, face_loss_fn=face_loss_fn, face_solver=face_solver,
        latent_size=latent_size,
        # pin CLIP text activations batch-over-data on multi-device meshes
        # (stops involuntary-remat reshards in the text backward under
        # dp x model; engine/training.py docstring)
        text_act_sharding=_text_sh,
        face_weight_scale=float(accum) if fuse_face else 1.0,
    )
    _jit_kw = dict(
        in_shardings=(t_sh, f_sh, opt_sharding, batch_sharding(mesh), repl),
        out_shardings=(t_sh, opt_sharding, repl),
        donate_argnums=(0, 2),
    )
    jstep = jax.jit(step_fn, **_jit_kw)
    jstep_noface = None
    if fuse_face:
        # the window's non-final micro-steps run the plain diffusion step
        # (a second compiled program; both share trainable/opt donation)
        jstep_noface = jax.jit(
            make_train_step(
                modules, cfg, tx, latent_size=latent_size,
                text_act_sharding=_text_sh,
            ),
            **_jit_kw,
        )

    writer = None
    hub_repo_name = None
    if jax.process_index() == 0:
        os.makedirs(args.output_dir, exist_ok=True)
        if args.push_to_hub:
            # reference train.py:315-321: resolve the repo name and set up
            # the hub repo on the main process before training
            from photoverse_tpu.utils.hub import create_hub_repo, get_full_repo_name

            hub_repo_name = args.hub_model_id or get_full_repo_name(
                os.path.basename(os.path.normpath(args.output_dir)),
                token=args.hub_token,
            )
            create_hub_repo(hub_repo_name, token=args.hub_token)
        writer = MetricsWriter(
            args.output_dir, report_to=args.report_to, config=vars(args)
        )

    num_update_steps_per_epoch = math.ceil(len(loader) / accum)
    num_epochs = math.ceil(args.max_train_steps / max(num_update_steps_per_epoch, 1))
    print(
        f"~~~~~ Running training ~~~~~\n"
        f"  Num examples = {len(dataset)}\n  Num Epochs = {num_epochs}\n"
        f"  Batch size per step = {args.train_batch_size}\n"
        f"  Devices = {jax.device_count()}\n"
        f"  Total optimization steps = {args.max_train_steps}"
    )

    ckpt_async = AsyncCheckpointer() if args.async_checkpointing else None
    if args.checkpoint_format == "pt":
        print(
            "WARNING: --checkpoint_format pt has no optimizer state / step "
            "counter; --resume_from and run_train_resumable.sh need the "
            "native format (a native checkpoint is still written on "
            "SIGTERM/SIGINT so preemption never loses progress)"
        )

    # ZeRO-1/3 under multi-host: gathering sharded state is a CROSS-HOST
    # COLLECTIVE, so every process must run it (calling it only on
    # process 0 would deadlock the pod); the jitted identities are built
    # once to avoid a recompile per checkpoint
    _gather_opt = (
        jax.jit(lambda t: t, out_shardings=repl)
        if opt_is_sharded and jax.process_count() > 1
        else (lambda t: t)
    )
    _gather_params = (
        jax.jit(lambda t: t, out_shardings=repl)
        if params_are_sharded and jax.process_count() > 1
        else (lambda t: t)
    )

    def gather_opt_for_save(opt_state_):
        """Run on ALL processes at every checkpoint boundary."""
        return _gather_opt(opt_state_) if opt_state_ is not None else None

    def gathered_params():
        """Full param bundle for sampling/checkpointing. With FSDP/TP under
        multi-host this is a cross-host all-gather — run on ALL processes
        (single-process sharded arrays gather locally in np.asarray)."""
        return _gather_params(combine_params(trainable, frozen))

    def save_ckpt(params_, opt_state_, step_, force_native=False, final=False):
        # one host snapshot shared by all writers (AsyncCheckpointer.submit
        # would otherwise copy the full tree once per format) — of the
        # trainable partition plus the frozen attn2 base kernels the .pt
        # exporter needs; host_save_snapshot drops the rest of the ~3.2 GB
        # frozen backbone so NO writer path (sync or async) ever fetches it
        # over the device link (measured 5-7 min/checkpoint via the tunnel)
        params_ = host_save_snapshot(params_)
        if args.checkpoint_format in ("native", "both") or force_native:
            kw = dict(step=step_, lora_config=lora_config, opt_state=opt_state_,
                      final=final)
            if ckpt_async is not None:
                ckpt_async.submit(save_progress, args.output_dir, params_, **kw)
            else:
                save_progress(args.output_dir, params_, **kw)
        if args.checkpoint_format in ("pt", "both"):
            kw = dict(step=step_, lora_config=lora_config, final=final)
            if ckpt_async is not None:
                ckpt_async.submit(save_progress_pt, args.output_dir, params_, **kw)
            else:
                save_progress_pt(args.output_dir, params_, **kw)

    def finalize_io(push=False):
        """Shared shutdown epilogue (process 0 only): drain/close the async
        checkpoint writer, flush the metrics writer, optionally push to hub.
        One home for this sequence — the SIGTERM, boundary-promote, and
        normal-end paths all exit through it."""
        if ckpt_async is not None:
            ckpt_async.close()
        if writer is not None:
            writer.close()
        if push and args.push_to_hub and hub_repo_name is not None:
            from photoverse_tpu.utils.hub import push_to_hub

            push_to_hub(args.output_dir, hub_repo_name, token=args.hub_token)

    # preemption/SIGTERM-safe: checkpoint and exit cleanly at the next step
    # boundary (the recovery story for elastic TPU capacity, SURVEY.md 5.3)
    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    rng = np.random.RandomState(seed)
    face_rng = np.random.RandomState(seed + 1)
    global_step = start_step
    last_ckpt_step = -1
    micro_step = 0
    accum_time = 0.0
    profiling_active = False
    key = jax.random.PRNGKey(seed + start_step)
    profile_range = None
    if args.profile_steps:
        start, stop = (int(x) for x in args.profile_steps.split(","))
        profile_range = (start, stop)
    eval_solver = DPMSolverMultistep.create(modules.schedule, args.denoise_timesteps)

    for epoch in range(num_epochs):
        for batch in loader:
            host_batch = {
                k: v for k, v in batch.items() if k != "text"
            }
            host_batch["concept_placeholder_idx"] = host_batch[
                "concept_placeholder_idx"
            ].reshape(-1)
            window_final = (micro_step + 1) % accum == 0
            if args.face_loss and (not fuse_face or window_final):
                # the face sub-batch is sliced per host from this host's rows;
                # round n_face up to a multiple of the local device count so
                # the assembled global face batch shards evenly over the mesh
                n_face = max(int(args.face_loss_sample_ratio * host_bs), 1)
                dev_per_host = max(n_mesh // jax.process_count(), 1)
                n_face = -(-n_face // dev_per_host) * dev_per_host
                if fuse_face:
                    # the whole window's face samples in one sub-batch
                    n_face = min(n_face * accum, host_bs)
                ex = prepare_prompt(
                    tokenizer, "a photo of {}", "*",
                    num_of_samples=host_bs,
                )
                merged = dict(batch)
                merged["text_input_ids"] = ex["text_input_ids"]
                merged["concept_placeholder_idx"] = ex["concept_placeholder_idx"]
                sliced = random_batch_slicing(merged, host_bs, n_face, face_rng)
                host_batch["face_pixel_values"] = sliced["pixel_values"]
                host_batch["face_pixel_values_clip"] = sliced["pixel_values_clip"]
                host_batch["face_text_input_ids"] = sliced["text_input_ids"]
                host_batch["face_concept_placeholder_idx"] = sliced[
                    "concept_placeholder_idx"
                ].reshape(-1)
                host_batch["face_uncond_input_ids"] = np.asarray(
                    tokenizer([""] * n_face), np.int32
                )
            dev_batch = shard_batch(mesh, host_batch)
            key, step_key = jax.random.split(key)
            # start once at the first micro-step of the window (global_step
            # holds its value for `accum` micro-steps, so guard on the flag)
            if (
                profile_range
                and global_step == profile_range[0]
                and not profiling_active
            ):
                jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))
                profiling_active = True
            t_step = time.perf_counter()
            _step = jstep_noface if (fuse_face and not window_final) else jstep
            trainable, opt_state, metrics = _step(
                trainable, frozen, opt_state, dev_batch, step_key
            )
            # global_step counts OPTIMIZER steps: with accumulation the
            # update (and clip) applies inside MultiSteps every accum-th
            # micro-batch (reference sync_gradients boundary)
            micro_step += 1
            if micro_step % accum:
                # intermediate micro-steps stay async (no pipeline stall);
                # only their dispatch cost lands here
                accum_time += time.perf_counter() - t_step
                continue
            global_step += 1
            # block on the window's last metrics BEFORE stopping the clock:
            # jstep dispatches asynchronously, so without this the timer
            # records ~50 ms of dispatch while the device spends seconds —
            # the device queue is in-order, so this waits for the whole
            # accumulation window
            metrics = jax.block_until_ready(metrics)
            accum_time += time.perf_counter() - t_step
            step_s, accum_time = accum_time, 0.0
            if profiling_active and global_step >= profile_range[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling_active = False

            if writer is not None:
                logs = {
                    "loss_mle": metrics["loss_mle"],
                    "loss_reg_concept_text": metrics["loss_reg_concept_text"],
                    "loss_reg_cross_attn_visual": metrics["loss_reg_cross_attn_visual"],
                    "lr": lr_sched(global_step),
                    "step_time_s": step_s,
                    "imgs_per_sec": micro_batch * accum / max(step_s, 1e-9),
                }
                if args.face_loss:
                    logs["loss_face"] = metrics["loss_face"]
                writer.log(logs, global_step)

            if stop_requested["flag"]:
                full = gathered_params()  # all processes
                opt_save = gather_opt_for_save(opt_state)  # all processes
                if jax.process_index() == 0:
                    print(f"termination requested — checkpointing at step {global_step}")
                    save_ckpt(full, opt_save, global_step, force_native=True)
                    # flush buffered TB events / finish the wandb run — this
                    # IS the preemption path, don't lose the tail (no hub
                    # push mid-run)
                    finalize_io(push=False)
                return

            is_sample_step = global_step % args.samples_save_steps == 0 and (
                writer is not None or params_are_sharded
            )
            is_ckpt_step = global_step % args.checkpoint_save_steps == 0
            if is_sample_step or is_ckpt_step:
                # ONE gather serves both boundaries (under FSDP on a pod
                # this is a full cross-host all-gather of the backbone)
                full = gathered_params()  # all processes (collective if sharded)
            if is_sample_step and writer is not None:
                sample_params = full
                if jax.process_count() > 1:
                    # process-0-only inference cannot run on arrays committed
                    # to the global mesh (not fully addressable); the gather
                    # left them fully replicated, so a local host fetch is
                    # legal on every process
                    sample_params = jax.tree.map(np.asarray, full)
                _save_samples(
                    args, sample_modules, sample_params, tokenizer,
                    eval_solver, batch, global_step, writer, run_inference,
                    prepare_prompt, denormalize, denormalize_clip, to_pil,
                    save_images_grid, jnp, jax, latent_size,
                    face_metric=face_metric,
                )
            if is_ckpt_step:
                opt_save = gather_opt_for_save(opt_state)  # all processes
                if jax.process_index() == 0:
                    save_ckpt(full, opt_save, global_step)
                last_ckpt_step = global_step
            if global_step >= args.max_train_steps:
                break
        if global_step >= args.max_train_steps:
            break

    if profiling_active:
        jax.profiler.stop_trace()
    if last_ckpt_step == global_step and global_step > 0:
        # the last boundary save already snapshotted this exact state —
        # promote those files to the unstepped names instead of paying the
        # device fetch + serialization again (every process skips the
        # gather collectives together, so multi-host stays in lockstep)
        if jax.process_index() == 0:
            if ckpt_async is not None:
                ckpt_async.wait()  # the stepped files must be fully on disk
            _promote_final_ckpt(args, global_step)
    else:
        full = gathered_params()  # all processes
        opt_save = gather_opt_for_save(opt_state)  # all processes
        if jax.process_index() == 0:
            # final=True: unstepped filenames, but the step IS embedded — a
            # later --resume_from photoverse.msgpack continues at this step
            # whether or not the run happened to end on a save boundary
            save_ckpt(full, opt_save, global_step, final=True)
    if jax.process_index() == 0:
        finalize_io(push=True)


def _promote_final_ckpt(args, step):
    """Copy the just-written photoverse_{step:06}.* files to the unstepped
    final names (photoverse.msgpack / photoverse.pt) — the training ended
    exactly on a checkpoint boundary, so a second snapshot would fetch and
    serialize identical state. Sidecar lands before the checkpoint file,
    mirroring save_progress's write ordering."""
    import shutil

    def promote(src, dst):
        if not os.path.exists(src):
            return
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)

    stem = os.path.join(args.output_dir, f"photoverse_{step:06d}")
    final = os.path.join(args.output_dir, "photoverse")
    if args.checkpoint_format in ("native", "both"):
        promote(stem + ".msgpack.lora.json", final + ".msgpack.lora.json")
        promote(stem + ".msgpack", final + ".msgpack")
    if args.checkpoint_format in ("pt", "both"):
        promote(stem + ".pt", final + ".pt")


def _save_samples(
    args, modules, params, tokenizer, solver, batch, step, writer, run_inference,
    prepare_prompt, denormalize, denormalize_clip, to_pil, save_images_grid, jnp, jax,
    latent_size, face_metric=None,
):
    """Periodic sample grid + optional face-similarity metric
    (reference train.py:555-605).

    Mirrors the reference: the first generation runs over the full batch
    (train.py:561-566 — the grid then shows only the first
    num_of_samples_to_save); with --use_random_prompts the batch prompts are
    swapped for the fixed template "a photo of {}" first (train.py:558-560)
    so grids stay prompt-comparable across steps; with --face_loss the
    cosine similarity of real vs generated faces is logged as
    `face_similarity` (train.py:569-573,602-605). One deliberate deviation:
    the generation batch is capped at 16 (with CFG that is a 32-wide UNet
    denoise inside a process already holding the training state) — for the
    canonical batch<=16 recipes this IS the full batch, and the metric is
    over the same rows either way."""
    from photoverse_tpu.data.prompts import EVAL_PROMPTS

    if batch["pixel_values"].dtype == np.uint8:
        # --uint8_transfer batches defer normalization to the device; the
        # sampling path (and the PIL grid below) wants the normalized
        # float host views, so convert here (host numpy — rare boundary)
        from photoverse_tpu.data.preprocessing import CLIP_MEAN, CLIP_STD

        batch = dict(batch)
        batch["pixel_values"] = (
            batch["pixel_values"].astype(np.float32) / 127.5 - 1.0
        )
        batch["pixel_values_clip"] = (
            batch["pixel_values_clip"].astype(np.float32) / 255.0 - CLIP_MEAN
        ) / CLIP_STD

    B = min(batch["pixel_values"].shape[0], 16)
    n = min(args.num_of_samples_to_save, B)
    text_ids = batch["text_input_ids"][:B]
    pidx = batch["concept_placeholder_idx"][:B]
    grid_prompt = batch["text"][0]
    if args.use_random_prompts:
        ex = prepare_prompt(tokenizer, "a photo of {}", "*", num_of_samples=B)
        text_ids, pidx = ex["text_input_ids"], ex["concept_placeholder_idx"]
        grid_prompt = ex["text"][0]
    example = {
        "pixel_values": jnp.asarray(batch["pixel_values"][:B]),
        "pixel_values_clip": jnp.asarray(batch["pixel_values_clip"][:B]),
        "text_input_ids": jnp.asarray(text_ids),
        "concept_placeholder_idx": jnp.asarray(np.asarray(pidx).reshape(-1)),
    }
    uncond_full = jnp.asarray(tokenizer([""] * B), jnp.int32)
    gen = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(step),
        guidance_scale=args.guidance_scale, token_index=0,
        latent_size=latent_size, uncond_input_ids=uncond_full,
    )
    similarity_metric = None
    if face_metric is not None:
        similarity_metric = float(
            face_metric(example["pixel_values"], gen)
        )

    input_images = [to_pil(denormalize(img)) for img in batch["pixel_values"][:n]]
    clip_images = [
        to_pil(denormalize_clip(img)).resize((args.resolution, args.resolution))
        for img in batch["pixel_values_clip"][:n]
    ]
    gen_images = [to_pil(denormalize(img)) for img in np.asarray(gen[:n])]
    grid_data = [
        ("Input Images", input_images),
        ("Condition Images", clip_images),
        (grid_prompt, gen_images),
    ]
    if args.save_samples_with_various_prompts:
        example_n = {
            "pixel_values": example["pixel_values"][:n],
            "pixel_values_clip": example["pixel_values_clip"][:n],
        }
        uncond_n = uncond_full[:n]
        for prompt in EVAL_PROMPTS:
            ex = prepare_prompt(tokenizer, prompt, "*", num_of_samples=n)
            example2 = dict(example_n)
            example2["text_input_ids"] = jnp.asarray(ex["text_input_ids"])
            example2["concept_placeholder_idx"] = jnp.asarray(
                ex["concept_placeholder_idx"].reshape(-1)
            )
            g = run_inference(
                modules, params, solver, example2, jax.random.PRNGKey(step),
                guidance_scale=args.guidance_scale, token_index=0,
                latent_size=latent_size, uncond_input_ids=uncond_n,
            )
            grid_data.append((prompt, [to_pil(denormalize(i)) for i in np.asarray(g)]))
    path = os.path.join(args.output_dir, f"{step:05d}.jpg")
    save_images_grid(grid_data, path)
    logs = {}
    if similarity_metric is not None:
        logs["face_similarity"] = similarity_metric
        writer.log(logs, step)
    writer.log_image(
        "Generated images vs input images", path, "Generated images vs input images",
        step,
    )


if __name__ == "__main__":
    main()
