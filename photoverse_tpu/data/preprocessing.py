"""Host-side image preprocessing (numpy/PIL) — VAE + CLIP input pipelines.

Equivalents of:
  - preprocess_image (torchvision Resize/CenterCrop/Normalize[-1,1],
    /root/reference/datasets/utils.py:139-157)
  - transformers CLIPImageProcessor defaults (224px shortest-edge resize,
    center crop, CLIP mean/std), used at datasets/custom.py:72,91
  - the mask -> face-crop geometry of CustomDatasetWithMasks
    (datasets/custom.py:118-173)

All outputs are NHWC float32 numpy (the TPU layout); the reference's NCHW
only ever existed for torch convs.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

__all__ = [
    "CLIP_MEAN",
    "CLIP_STD",
    "preprocess_image",
    "clip_preprocess",
    "preprocess_image_u8",
    "clip_preprocess_u8",
    "crop_to_mask_and_scale",
    "apply_mask_and_crop",
]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

_PIL_INTERP = {
    "nearest": Image.NEAREST,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
}


def _resize_shortest(img: Image.Image, size: int, interpolation: str) -> Image.Image:
    # the long edge TRUNCATES (int(size * long / short)) — both torchvision
    # Resize and transformers get_resize_output_image_size do, so rounding
    # here would shift the center crop by 1px on many aspect ratios
    w, h = img.size
    if w < h:
        nw, nh = size, max(int(h * size / w), size)
    else:
        nw, nh = max(int(w * size / h), size), size
    return img.resize((nw, nh), _PIL_INTERP[interpolation])


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


def preprocess_image(
    raw_image: Image.Image, size: int = 512, interpolation: str = "bicubic"
) -> np.ndarray:
    """PIL -> (size, size, 3) float32 in [-1, 1] (VAE input)."""
    if raw_image.mode != "RGB":
        raw_image = raw_image.convert("RGB")
    img = _resize_shortest(raw_image, size, interpolation)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = _center_crop(arr, size)
    return arr * 2.0 - 1.0


def preprocess_image_u8(
    raw_image: Image.Image, size: int = 512, interpolation: str = "bicubic"
) -> np.ndarray:
    """PIL -> (size, size, 3) uint8 — the VAE crop BEFORE normalization.

    Exact, not lossy: PIL's RGB resize emits uint8, so the float32 pipeline
    (preprocess_image) quantizes through the very same uint8 array before
    its /255*2-1. Shipping the uint8 crop moves the normalization onto the
    device (engine.training.normalize_pixel_batch) and cuts host->device
    batch bytes 4x — the train loop's dominant overhead on hosts where the
    device link is the bottleneck (PERFORMANCE.md round 5)."""
    if raw_image.mode != "RGB":
        raw_image = raw_image.convert("RGB")
    img = _resize_shortest(raw_image, size, interpolation)
    return _center_crop(np.asarray(img, dtype=np.uint8), size)


def clip_preprocess_u8(image, size: int = 224) -> np.ndarray:
    """PIL image or (H, W, 3) uint8 array -> (size, size, 3) uint8 CLIP crop
    (CLIP mean/std normalization deferred to the device — see
    preprocess_image_u8)."""
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image.astype(np.uint8))
    if image.mode != "RGB":
        image = image.convert("RGB")
    img = _resize_shortest(image, size, "bicubic")
    return _center_crop(np.asarray(img, dtype=np.uint8), size)


def clip_preprocess(image, size: int = 224) -> np.ndarray:
    """PIL image or (H, W, 3) uint8 array -> (size, size, 3) CLIP-normalized."""
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image.astype(np.uint8))
    if image.mode != "RGB":
        image = image.convert("RGB")
    img = _resize_shortest(image, size, "bicubic")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = _center_crop(arr, size)
    return (arr - CLIP_MEAN) / CLIP_STD


def crop_to_mask_and_scale(
    image: np.ndarray, mask: np.ndarray, scale: float = 0.15
) -> np.ndarray:
    """Crop to the mask bbox scaled by 1.3 and squared
    (reference datasets/custom.py:145-173, same rounding/clamping)."""
    m = np.where(mask > 0, 255, 0).astype(np.uint8)
    rows = np.any(m, axis=1)
    cols = np.any(m, axis=0)
    if not rows.any():
        # an all-zero mask means the prep pipeline produced garbage (e.g.
        # wrong --dataset_src_masks_folder); fail loudly instead of the
        # reference's bare IndexError — and match the native loader, which
        # rejects the sample for the same reason (dataloader.cc)
        raise ValueError(
            "crop_to_mask_and_scale: mask is empty (all zeros) — no face "
            "region to crop; check the mask files"
        )
    ymin, ymax = np.where(rows)[0][[0, -1]]
    xmin, xmax = np.where(cols)[0][[0, -1]]

    height = ymax - ymin
    width = xmax - xmin
    ymin = max(0, int(ymin - height * scale))
    ymax = min(m.shape[0], int(ymax + height * scale))
    xmin = max(0, int(xmin - width * scale))
    xmax = min(m.shape[1], int(xmax + width * scale))

    crop_w = xmax - xmin
    crop_h = ymax - ymin
    if crop_w > crop_h:
        crop_h = crop_w
        ymax = min(m.shape[0], ymax + crop_h // 2)
        ymin = max(0, ymin - crop_h // 2)
    elif crop_h > crop_w:
        crop_w = crop_h
        xmax = min(m.shape[1], xmax + crop_w // 2)
        xmin = max(0, xmin - crop_w // 2)
    return image[ymin:ymax, xmin:xmax]


def apply_mask_and_crop(
    raw_image: Image.Image, raw_mask: Image.Image
) -> np.ndarray:
    """Zero the background, crop to the scaled mask bbox — the masked-face
    CLIP input of CustomDatasetWithMasks (datasets/custom.py:118-136)."""
    if raw_image.mode != "RGB":
        raw_image = raw_image.convert("RGB")
    if raw_mask.mode != "L":
        raw_mask = raw_mask.convert("L")
    reshaped = np.asarray(raw_image.resize(raw_mask.size))
    mask_np = np.asarray(raw_mask)
    clip_image = np.zeros_like(reshaped)
    sel = mask_np != 0
    clip_image[sel] = reshaped[sel]
    return crop_to_mask_and_scale(clip_image, mask_np)
