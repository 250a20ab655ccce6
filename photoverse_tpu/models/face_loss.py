"""Facial identity loss — ArcFace / FaceNet cosine embedding loss.

Capability parity with FaceLoss (/root/reference/models/loss.py:9-78):
  - arcface: grayscale (Rec.601 weights), bilinear resize to 128px;
  - facenet: RGB, bilinear resize to 160px;
  - optional /127.5 - 1 normalization (off in the training loop, which feeds
    [-1,1] images — train.py:532 `normalize=False`);
  - loss = CosineEmbeddingLoss(emb(x), emb(x_gen), target):
      target=+1 (training, "maximize")  -> 1 - cos
      target=-1 (eval metric)           -> max(0, cos)  [torch semantics]

All of it is jit-compatible; the embedder parameters ride inside the loss
closure so the face network shards/replicates with everything else.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from photoverse_tpu.models.arcface import ArcFaceConfig, ArcFaceResNet18
from photoverse_tpu.models.facenet import InceptionResnetV1

__all__ = ["rgb_to_grayscale", "face_preprocess", "FaceLoss", "make_face_loss_fn"]

_REC601 = jnp.array([0.2989, 0.5870, 0.1140], dtype=jnp.float32)


def rgb_to_grayscale(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H, W, 1), Rec.601 weights (loss.py:51)."""
    return jnp.tensordot(images, _REC601, axes=[[-1], [0]])[..., None]


def face_preprocess(
    images: jnp.ndarray, model_name: str, normalize: bool = True,
    size: Optional[int] = None,
) -> jnp.ndarray:
    """Resize (+grayscale for arcface) to the embedder's input
    (loss.py:26-36). `images` NHWC; bilinear resize without antialias to
    match torch F.interpolate(align_corners=False)."""
    if size is None:
        size = 128 if model_name == "arcface" else 160
    if model_name == "arcface" and images.shape[-1] == 3:
        images = rgb_to_grayscale(images)
    B, _, _, C = images.shape
    out = jax.image.resize(images, (B, size, size, C), "bilinear", antialias=False)
    if normalize:
        out = out / 127.5 - 1.0
    return out


class FaceLoss:
    """Callable bundle: (x, x_gen) -> cosine embedding loss."""

    def __init__(self, model_name: str, params):
        assert model_name in ("arcface", "facenet"), model_name
        self.model_name = model_name
        self.params = params
        self.model = (
            ArcFaceResNet18(ArcFaceConfig())
            if model_name == "arcface"
            else InceptionResnetV1()
        )

    @property
    def input_size(self) -> int:
        if self.model_name == "arcface":
            return self.model.config.input_size
        return 160

    def embed(self, images: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        x = face_preprocess(images, self.model_name, normalize, size=self.input_size)
        return self.model.apply({"params": self.params}, x)

    def __call__(
        self,
        x: jnp.ndarray,
        x_gen: jnp.ndarray,
        maximize: bool = True,
        normalize: bool = True,
    ) -> jnp.ndarray:
        e1 = self.embed(x, normalize).astype(jnp.float32)
        e2 = self.embed(x_gen, normalize).astype(jnp.float32)
        cos = jnp.sum(e1 * e2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(e1, axis=-1) * jnp.linalg.norm(e2, axis=-1), 1e-8
        )
        if maximize:  # target=+1: loss = 1 - cos
            return jnp.mean(1.0 - cos)
        # target=-1: torch CosineEmbeddingLoss default margin 0 -> max(0, cos)
        return jnp.mean(jnp.maximum(cos, 0.0))


def make_face_loss_fn(
    model_name: str, weights_path: Optional[str] = None,
    loss: Optional["FaceLoss"] = None,
) -> Callable:
    """Training-loss closure for engine.training.make_train_step.

    Loads converted weights when available; otherwise uses random init (the
    published ArcFace/FaceNet weights are downloads in the reference —
    utils/arcface_utils.py:159-177 — and can be converted offline with
    convert_arcface / convert_facenet). Pass a preloaded `loss` to share one
    FaceLoss between the training closure and the eval metric."""
    if loss is None:
        loss = load_face_loss(model_name, weights_path)

    def fn(params_unused, x, x_gen):
        return loss(x, x_gen, maximize=True, normalize=False)

    return fn


def load_face_loss(model_name: str, weights_path: Optional[str] = None) -> FaceLoss:
    if weights_path is not None:
        import torch

        from photoverse_tpu.models.arcface import convert_arcface
        from photoverse_tpu.models.facenet import convert_facenet

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items()}
        params = (
            convert_arcface(sd) if model_name == "arcface" else convert_facenet(sd)
        )
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    else:
        model = (
            ArcFaceResNet18(ArcFaceConfig())
            if model_name == "arcface"
            else InceptionResnetV1()
        )
        size = 128 if model_name == "arcface" else 160
        ch = 1 if model_name == "arcface" else 3
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, ch))
        )["params"]
    return FaceLoss(model_name, params)
