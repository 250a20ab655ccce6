"""Image utilities: denormalization, PIL conversion, captioned sample grids.

Equivalents of /root/reference/utils/image_utils.py:6-70, operating on NHWC
numpy arrays (the framework layout) instead of torch CHW tensors.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from photoverse_tpu.data.preprocessing import CLIP_MEAN, CLIP_STD

__all__ = [
    "denormalize",
    "denormalize_clip",
    "to_pil",
    "save_images_grid",
    "rebuild_gallery_grid",
]


def denormalize(img: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] (reference image_utils.py:6-11)."""
    return np.clip(np.asarray(img) / 2.0 + 0.5, 0.0, 1.0)


def denormalize_clip(img: np.ndarray) -> np.ndarray:
    """Invert CLIP normalization -> [0,1] (reference image_utils.py:14-20)."""
    return np.clip(np.asarray(img) * CLIP_STD + CLIP_MEAN, 0.0, 1.0)


def to_pil(img: np.ndarray) -> Image.Image:
    """(H,W,3) float in [0,1] -> PIL (reference image_utils.py:23-29)."""
    arr = (np.asarray(img) * 255.0).round().astype(np.uint8)
    return Image.fromarray(arr)


def save_images_grid(
    grid_data: Sequence[Tuple[str, List[Image.Image]]], output_path: str,
    header_height: int = 50,
) -> None:
    """Rows of images, each row prefixed with a caption header strip
    (reference image_utils.py:32-70). Template captions render their "{}"
    placeholder as "S*" — text.format("S*"), reference image_utils.py:61;
    captions without a placeholder (e.g. the gallery prompts, which already
    contain "S*") are drawn verbatim."""
    if not grid_data:
        return
    rows = []
    max_w = 0
    for caption, images in grid_data:
        if not images:
            continue
        h = max(im.height for im in images)
        w = sum(im.width for im in images)
        row = Image.new("RGB", (w, h + header_height), "white")
        draw = ImageDraw.Draw(row)
        text = caption.format("S*") if "{}" in caption else caption
        draw.text((10, header_height // 3), text, fill="black")
        x = 0
        for im in images:
            row.paste(im, (x, header_height))
            x += im.width
        rows.append(row)
        max_w = max(max_w, w)
    total_h = sum(r.height for r in rows)
    grid = Image.new("RGB", (max_w, total_h), "white")
    y = 0
    for r in rows:
        grid.paste(r, (0, y))
        y += r.height
    grid.save(output_path)


# README gallery rebuild (reference image_utils.py:73-112). The reference
# hardcodes its figs/ layout: {base_dir}/{i}/{file_stem}{i}.png for i in
# 1..num_columns, one row per (caption, file_stem) pair. Exposed as a
# function (and a small CLI below) instead of hardcoded paths.
GALLERY_PROMPTS = [
    ("Input Image", "input_image"),
    ("A photo of S*", "photo"),
    ("S* in Ghibli anime style", "ghibli"),
    ("S* wears a red hat", "red_hat"),
    ("S* on the beach", "beach"),
    ("Manga drawing of S*", "manga"),
    ("S* as a Funko Pop figure", "funko_pop"),
    ("S* stained glass window", "stained_glass"),
    ("Watercolor painting of S*", "watercolor"),
]


def rebuild_gallery_grid(
    base_dir: str, output_path: str,
    prompts: Sequence[Tuple[str, str]] = GALLERY_PROMPTS,
    num_columns: int = 5,
) -> None:
    import os

    grid_data = []
    for caption, stem in prompts:
        images = [
            Image.open(os.path.join(base_dir, str(i), f"{stem}{i}.png"))
            for i in range(1, num_columns + 1)
        ]
        grid_data.append((caption, images))
    save_images_grid(grid_data, output_path)


if __name__ == "__main__":
    import argparse

    _p = argparse.ArgumentParser(description="Rebuild the README image grid")
    _p.add_argument("--base_dir", default="../figs")
    _p.add_argument("--output", default="image_grid.png")
    _p.add_argument("--num_columns", type=int, default=5)
    _a = _p.parse_args()
    rebuild_gallery_grid(_a.base_dir, _a.output, num_columns=_a.num_columns)
