"""Offline eval: face-detection + identity cosine similarity.

Capability parity with FaceSimilarity (/root/reference/utils/
face_similarity.py:12-124): detect the largest face in both images (MTCNN
cascade, photoverse_tpu.utils.mtcnn), crop, preprocess per embedder
(grayscale+128px for arcface, 160px RGB for facenet), cosine similarity of
embeddings; 0.0 when no face is found in either image.

Detection is host-side (data-dependent control flow); only the embedder runs
on device. When no MTCNN weights are provided the detector degrades to the
full image (similarity still computed, a warning is printed once).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from photoverse_tpu.models.face_loss import FaceLoss, load_face_loss

__all__ = ["FaceSimilarity"]


class FaceSimilarity:
    def __init__(
        self,
        model_name: str = "arcface",
        face_loss: Optional[FaceLoss] = None,
        weights_path: Optional[str] = None,
        mtcnn_weights_path: Optional[str] = None,
    ):
        self.model_name = model_name
        self.face_loss = face_loss or load_face_loss(model_name, weights_path)
        self.detector = None
        if mtcnn_weights_path is not None:
            from photoverse_tpu.utils.mtcnn import MTCNN

            self.detector = MTCNN.from_torch_weights(mtcnn_weights_path)
        self._warned = False

    # ------------------------------------------------------------------
    def _largest_face(self, image: np.ndarray) -> Optional[np.ndarray]:
        """Crop of the largest detected face, or None (reference
        face_similarity.py:96-105 picks the max-area box)."""
        if self.detector is None:
            if not self._warned:
                warnings.warn(
                    "no MTCNN weights configured — face similarity uses the "
                    "full image instead of a detected crop"
                )
                self._warned = True
            return image
        boxes, probs = self.detector.detect(image)
        if boxes is None or len(boxes) == 0:
            return None
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        x1, y1, x2, y2 = boxes[int(np.argmax(areas))].astype(int)
        h, w = image.shape[:2]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w), min(y2, h)
        if x2 <= x1 or y2 <= y1:
            return None
        return image[y1:y2, x1:x2]

    def face_embedding(self, image):
        """Identity embedding of the largest detected face, or None when no
        face is found. Use this to embed a reference photo ONCE when
        comparing it against many generations."""
        face = self._largest_face(_to_array(image))
        if face is None:
            return None
        # embedder expects [-1,1] floats (the loss path feeds normalize=False)
        fa = jnp.asarray(face, jnp.float32)[None] / 127.5 - 1.0
        return np.asarray(self.face_loss.embed(fa, normalize=False))[0]

    @staticmethod
    def cosine(e1, e2) -> float:
        denom = max(float(np.linalg.norm(e1) * np.linalg.norm(e2)), 1e-8)
        return float(np.dot(e1, e2) / denom)

    def calculate_face_similarity(self, image1, image2) -> float:
        """Images: paths, PIL images, or (H, W, 3) uint8 arrays. Returns the
        identity cosine similarity in [-1, 1]; 0.0 if no face found."""
        e1 = self.face_embedding(image1)
        e2 = self.face_embedding(image2)
        if e1 is None or e2 is None:
            return 0.0
        return self.cosine(e1, e2)


def _to_array(image) -> np.ndarray:
    if isinstance(image, str):
        image = Image.open(image)
    if isinstance(image, Image.Image):
        if image.mode != "RGB":
            image = image.convert("RGB")
        return np.asarray(image)
    return np.asarray(image)
