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

__all__ = [
    "FaceSimilarity",
    "crop_face_from_image",
    "get_largest_bbox_face_analysis",
    "cosine_similarity_between_images",
]


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


# ---------------------------------------------------------------------------
# insightface-style helpers (reference utils/arcface_utils.py:36-126).
# They operate on "face analysis" dicts with 'bbox' (x1,y1,x2,y2) and
# 'embedding' keys — the contract of insightface's FaceAnalysis results —
# so an external detector's output plugs in directly. Vestigial in the
# reference (no main-path consumer); kept for drop-in API parity.
# ---------------------------------------------------------------------------

def crop_face_from_image(image: np.ndarray, face_analysis: dict) -> np.ndarray:
    """Bbox crop clamped to the image bounds (arcface_utils.py:36-62)."""
    x1, y1, x2, y2 = np.asarray(face_analysis["bbox"]).astype(int)
    h, w = image.shape[:2]
    x1, y1 = max(0, x1), max(0, y1)
    x2, y2 = min(w, x2), min(h, y2)
    return image[y1:y2, x1:x2]


def get_largest_bbox_face_analysis(face_analyses):
    """The analysis dict with the max-area bbox, or [] when the list is
    empty (arcface_utils.py:65-88, including its empty-list quirk)."""
    if not face_analyses:
        return []
    return max(
        face_analyses,
        key=lambda fa: (fa["bbox"][2] - fa["bbox"][0])
        * (fa["bbox"][3] - fa["bbox"][1]),
    )


def cosine_similarity_between_images(image1, image2, face_analysis_func):
    """Cosine similarity of the largest-face embeddings of two images via a
    user-supplied detector/embedder callable; 0 when either image has no
    face (arcface_utils.py:91-126)."""
    a1 = face_analysis_func(_to_array(image1))
    a2 = face_analysis_func(_to_array(image2))
    best1 = get_largest_bbox_face_analysis(a1)
    best2 = get_largest_bbox_face_analysis(a2)
    if not best1 or not best2:
        return 0
    e1, e2 = best1["embedding"], best2["embedding"]
    return float(
        np.dot(e1, e2) / (np.linalg.norm(e1) * np.linalg.norm(e2))
    )
