"""Prompt preparation — templates, placeholder indexing, batch slicing.

Host-side numpy equivalents of /root/reference/datasets/utils.py:160-234 and
the template list at /root/reference/datasets/custom.py:10-38.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = [
    "IMAGENET_TEMPLATES_SMALL",
    "EVAL_PROMPTS",
    "prepare_prompt",
    "find_placeholder_index",
    "random_batch_slicing",
]

# 27 training templates (reference datasets/custom.py:10-38)
IMAGENET_TEMPLATES_SMALL = [
    "a photo of a {}",
    "a rendering of a {}",
    "a cropped photo of the {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a photo of a dirty {}",
    "a dark photo of the {}",
    "a photo of my {}",
    "a photo of the cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a photo of the {}",
    "a good photo of the {}",
    "a photo of one {}",
    "a close-up photo of the {}",
    "a rendition of the {}",
    "a photo of the clean {}",
    "a rendition of a {}",
    "a photo of a nice {}",
    "a good photo of a {}",
    "a photo of the nice {}",
    "a photo of the small {}",
    "a photo of the weird {}",
    "a photo of the large {}",
    "a photo of a cool {}",
    "a photo of a small {}",
]

# 7 fixed in-training eval prompts (reference train.py:28-34)
EVAL_PROMPTS = [
    "{} in Ghibli anime style",
    "{} in Disney & Pixar style",
    "{} wears a red hat",
    "{} on the beach",
    "Manga drawing of {}",
    "{} Funko Pop",
    "{} latte art",
]


def find_placeholder_index(text: str, placeholder_token: str = "*") -> int:
    """Word index of the placeholder + 1 (BOS offset); 0 if absent
    (reference datasets/utils.py:215-220)."""
    for idx, word in enumerate(text.strip().split(" ")):
        if word == placeholder_token:
            return idx + 1
    return 0


def prepare_prompt(
    tokenizer,
    template: str = "a photo of a {}",
    placeholder_token: str = "*",
    negative_prompt: Optional[str] = None,
    num_of_samples: Optional[int] = None,
) -> Dict:
    """Tokenized prompt batch matching the reference contract
    (datasets/utils.py:160-199): keys text / text_input_ids /
    concept_placeholder_idx / negative_text_input_ids."""
    text = template.format(placeholder_token)
    input_ids = np.asarray(
        tokenizer(
            text,
            padding="max_length",
            truncation=True,
            max_length=tokenizer.model_max_length,
        ),
        dtype=np.int32,
    )
    negative_input_ids = None
    if negative_prompt:
        negative_input_ids = np.asarray(
            tokenizer(
                negative_prompt,
                padding="max_length",
                truncation=True,
                max_length=tokenizer.model_max_length,
            ),
            dtype=np.int32,
        )
    idx = np.asarray([[find_placeholder_index(text, placeholder_token)]], dtype=np.int32)
    out_text = text
    if num_of_samples:
        out_text = [text] * num_of_samples
        input_ids = np.repeat(input_ids, num_of_samples, axis=0)
        idx = np.repeat(idx, num_of_samples, axis=0)
        if negative_input_ids is not None:
            negative_input_ids = np.repeat(negative_input_ids, num_of_samples, axis=0)
    return {
        "text": out_text,
        "text_input_ids": input_ids,
        "concept_placeholder_idx": idx,
        "negative_text_input_ids": negative_input_ids,
    }


def random_batch_slicing(
    example: Dict, batch_size: int, num_of_samples: int, rng: np.random.RandomState
) -> Dict:
    """Random sub-batch selection for the face loss
    (reference datasets/utils.py:223-234)."""
    assert batch_size >= num_of_samples, "batch smaller than requested sample count"
    indices = rng.permutation(batch_size)[:num_of_samples]
    out = {}
    for key, value in example.items():
        if isinstance(value, np.ndarray) or hasattr(value, "shape"):
            out[key] = value[indices]
        elif isinstance(value, list):
            out[key] = [value[i] for i in indices]
        else:
            out[key] = value
    return out
