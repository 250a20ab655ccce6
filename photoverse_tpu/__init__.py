"""photoverse_tpu — TPU-native PhotoVerse framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the full capability
surface of the PhotoVerse reference (tuning-free single-photo identity
personalization for Stable Diffusion 1.5): dual-branch CLIP conditioning,
adapter MLPs, identity-token cross-attention, LoRA training, ArcFace/FaceNet
identity loss, CelebA-HQ data pipeline, and train/generate CLIs.

Layering (bottom-up):
  core/      pure diffusion math: DDPM noise schedule, DPM-Solver++ multistep
  ops/       compute kernels: dual-context attention (jnp + fused Pallas)
  models/    flax modules: UNet, VAE, CLIP text/vision, adapters, face nets
  convert/   torch-checkpoint -> JAX pytree converters (offline, keymap-based)
  data/      prompt prep, image preprocessing, datasets, CelebA-HQ prep
  engine/    inference (CFG scan denoiser) and training step
  parallel/  GSPMD mesh + shardings (data-parallel batch over ICI)
  ckpt/      trainable-only checkpoint save/load (orbax + torch .pt compat)
  utils/     image grids, metrics writer, face similarity eval
  cli/       train / generate / prepare_celebhqmasks with reference flags
"""

__version__ = "0.1.0"
