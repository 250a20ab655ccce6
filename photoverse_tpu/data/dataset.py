"""Datasets + input pipeline — host-side numpy loader.

Equivalents of CustomDataset / CustomDatasetWithMasks / collate_fn
(/root/reference/datasets/custom.py:45-189), emitting NHWC numpy batches
with exactly the reference's batch-dict contract:
  pixel_values (B,512,512,3 in [-1,1]), pixel_values_clip (B,224,224,3),
  text_input_ids (B,77), concept_placeholder_idx (B,1), text (list[str]).

The loader prefetches batches on background threads (replacing torch
DataLoader worker processes, train.py:397-403) — decode/resize stay on host,
the TPU only ever sees fixed-shape arrays.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List

import numpy as np
from PIL import Image

from photoverse_tpu.data.preprocessing import (
    apply_mask_and_crop,
    clip_preprocess,
    clip_preprocess_u8,
    preprocess_image,
    preprocess_image_u8,
)
from photoverse_tpu.data.prompts import (
    IMAGENET_TEMPLATES_SMALL,
    prepare_prompt,
)

__all__ = ["CustomDataset", "CustomDatasetWithMasks", "collate_fn", "BatchLoader"]


def _is_image(f: str) -> bool:
    return f.lower().endswith((".jpg", ".jpeg", ".png"))


def _numeric_sort(paths: List[str]) -> List[str]:
    """Numeric-stem order like the reference (CelebA-HQ files are 0..N.jpg,
    custom.py:63-66); non-numeric stems sort lexicographically after the
    numeric block instead of crashing dataset construction."""

    def key(x):
        stem = os.path.basename(x).split(".")[0]
        try:
            return (0, int(stem), "")
        except ValueError:
            return (1, 0, stem)

    return sorted(paths, key=key)


class CustomDataset:
    """Single-image identity dataset (reference datasets/custom.py:45-93)."""

    def __init__(
        self,
        data_root: str,
        tokenizer,
        img_subfolder: str = "images",
        size: int = 512,
        interpolation: str = "bicubic",
        placeholder_token: str = "*",
        template: str = "a photo of {}",
        use_random_templates: bool = False,
        seed: int = 0,
        clip_size: int = 224,
        uint8_pixels: bool = False,
    ):
        self.tokenizer = tokenizer
        self.size = size
        self.clip_size = clip_size
        self.interpolation = interpolation
        # uint8_pixels: emit uint8 crops and defer normalization to the
        # device (engine.training.normalize_pixel_batch) — 4x fewer
        # host->device bytes per batch, numerically exact (PIL resize
        # already emits uint8; see data/preprocessing.py)
        self.uint8_pixels = uint8_pixels
        self.placeholder_token = placeholder_token
        self.template = template
        self.use_random_templates = use_random_templates
        self.rng = np.random.RandomState(seed)
        img_dir = os.path.join(data_root, img_subfolder)
        self.image_paths = _numeric_sort(
            [os.path.join(img_dir, f) for f in os.listdir(img_dir) if _is_image(f)]
        )

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> Dict:
        return self.example(idx)

    def example(self, idx: int, rng: np.random.RandomState = None) -> Dict:
        """Like __getitem__ but with an explicit RandomState for template
        sampling — np.random.RandomState is not thread-safe, so concurrent
        BatchLoader workers each pass their own (seeded) state instead of
        racing on self.rng."""
        template = self.template
        if self.use_random_templates:
            template = (rng or self.rng).choice(IMAGENET_TEMPLATES_SMALL)
        example = prepare_prompt(self.tokenizer, template, self.placeholder_token)
        return self._prepare_image(example, idx)

    def _prepare_image(self, example: Dict, idx: int) -> Dict:
        raw = Image.open(self.image_paths[idx])
        if raw.mode != "RGB":
            raw = raw.convert("RGB")
        if self.uint8_pixels:
            example["pixel_values"] = preprocess_image_u8(
                raw, self.size, self.interpolation
            )
            example["pixel_values_clip"] = clip_preprocess_u8(raw, self.clip_size)
        else:
            example["pixel_values"] = preprocess_image(
                raw, self.size, self.interpolation
            )
            example["pixel_values_clip"] = clip_preprocess(raw, self.clip_size)
        return example


class CustomDatasetWithMasks(CustomDataset):
    """Masked variant: CLIP branch sees only the background-zeroed face crop
    (reference datasets/custom.py:96-173)."""

    def __init__(self, data_root: str, tokenizer, mask_subfolder: str = "masks", **kw):
        super().__init__(data_root, tokenizer, **kw)
        mask_dir = os.path.join(data_root, mask_subfolder)
        self.masks_paths = _numeric_sort(
            [os.path.join(mask_dir, f) for f in os.listdir(mask_dir) if _is_image(f)]
        )

    def _prepare_image(self, example: Dict, idx: int) -> Dict:
        raw = Image.open(self.image_paths[idx])
        mask = Image.open(self.masks_paths[idx])
        if raw.mode != "RGB":
            raw = raw.convert("RGB")
        face_crop = apply_mask_and_crop(raw, mask)
        if self.uint8_pixels:
            example["pixel_values"] = preprocess_image_u8(
                raw, self.size, self.interpolation
            )
            example["pixel_values_clip"] = clip_preprocess_u8(
                face_crop, self.clip_size
            )
        else:
            example["pixel_values"] = preprocess_image(
                raw, self.size, self.interpolation
            )
            example["pixel_values_clip"] = clip_preprocess(face_crop, self.clip_size)
        return example


def _stack_pixels(arrs: List[np.ndarray]) -> np.ndarray:
    """Stack, keeping uint8 batches uint8 (the deferred-normalization
    transfer path) and casting everything else to float32 as before."""
    out = np.stack(arrs)
    return out if out.dtype == np.uint8 else out.astype(np.float32)


def collate_fn(batch: List[Dict]) -> Dict:
    """Stack per-example dicts (reference datasets/custom.py:176-189)."""
    return {
        "pixel_values": _stack_pixels([e["pixel_values"] for e in batch]),
        "pixel_values_clip": _stack_pixels(
            [e["pixel_values_clip"] for e in batch]
        ),
        "text_input_ids": np.concatenate(
            [np.asarray(e["text_input_ids"]).reshape(1, -1) for e in batch]
        ).astype(np.int32),
        "concept_placeholder_idx": np.concatenate(
            [np.asarray(e["concept_placeholder_idx"]).reshape(1, -1) for e in batch]
        ).astype(np.int32),
        "text": [e["text"] for e in batch],
    }


class BatchLoader:
    """Shuffling, prefetching batch iterator (drop_last).

    With native=True, image decode/resize/normalize (and for masked
    datasets the background-zero + face-crop geometry) runs through the C++
    loader (native/dataloader.cc) — one call per batch, multithreaded in
    C++ — instead of per-item PIL.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        native: bool = False,
        host_slice: slice = None,
        host_id: int = 0,
    ):
        """`batch_size` is the GLOBAL batch size; with `host_slice` set
        (multi-host training, parallel.mesh.host_batch_slice) each process
        decodes only its slice of every global batch — all hosts share the
        same seed so the global shuffle ORDER is identical and the host
        slices tile the global batch's images/ids exactly. Random template
        sampling draws from per-(host, worker) streams (pass the process
        index as `host_id`): distinct across hosts, statistically
        equivalent to — but not bitwise identical with — a single-host
        run."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.host_slice = host_slice
        self.host_id = host_id
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.native = native
        self._native_loader = None
        if native:
            from photoverse_tpu.data.native_loader import get_loader

            self._native_loader = get_loader(num_threads=self.num_workers)

    def _native_batch(self, idxs, rng: np.random.RandomState) -> Dict:
        ds = self.dataset
        paths = [ds.image_paths[int(i)] for i in idxs]
        if isinstance(ds, CustomDatasetWithMasks):
            masks = [ds.masks_paths[int(i)] for i in idxs]
            pv, pc = self._native_loader.load_batch_masked(
                paths, masks, size=ds.size, clip_size=ds.clip_size
            )
        else:
            pv, pc = self._native_loader.load_batch(
                paths, size=ds.size, clip_size=ds.clip_size
            )
        prompts = []
        for _ in idxs:
            template = ds.template
            if ds.use_random_templates:
                template = rng.choice(IMAGENET_TEMPLATES_SMALL)
            prompts.append(prepare_prompt(ds.tokenizer, template, ds.placeholder_token))
        return {
            "pixel_values": pv,
            "pixel_values_clip": pc,
            "text_input_ids": np.concatenate(
                [np.asarray(p["text_input_ids"]).reshape(1, -1) for p in prompts]
            ).astype(np.int32),
            "concept_placeholder_idx": np.concatenate(
                [np.asarray(p["concept_placeholder_idx"]).reshape(1, -1) for p in prompts]
            ).astype(np.int32),
            "text": [p["text"] for p in prompts],
        }

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # per-(host, worker) RandomStates (seeded from the epoch-level rng,
        # mixed with host_id) keep template sampling race-free,
        # seed-reproducible, and distinct across multi-host processes;
        # the golden-ratio mix keeps seeds inside RandomState's 2**32 range
        # for any process count
        worker_seeds = (
            self.rng.randint(0, 2**31 - 1, size=self.num_workers).astype(np.uint64)
            + np.uint64(self.host_id) * np.uint64(0x9E3779B1)
        ) % np.uint64(2**32)

        # producers stay within `window` batches of the consumer cursor so
        # the in-order reorder buffer is bounded (a stalled worker cannot
        # make the others fill host RAM with out-of-order batches), and all
        # blocking waits are stop-aware so closing the generator early
        # (max_train_steps break, SIGTERM) releases every worker thread
        window = self.prefetch + self.num_workers
        cursor = {"nxt": 0}
        cv = threading.Condition()

        def put_stop_aware(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer(worker_id: int):
            wrng = np.random.RandomState(worker_seeds[worker_id])
            try:
                for b in range(worker_id, n_batches, self.num_workers):
                    with cv:
                        while (
                            b >= cursor["nxt"] + window and not stop.is_set()
                        ):
                            cv.wait(timeout=0.1)
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if self.host_slice is not None:
                        idxs = idxs[self.host_slice]
                    if self._native_loader is not None:
                        batch = self._native_batch(idxs, wrng)
                    else:
                        batch = collate_fn(
                            [self.dataset.example(int(i), wrng) for i in idxs]
                        )
                    if not put_stop_aware((b, batch)):
                        return
            except BaseException as e:  # surface to the consumer — a dead
                # producer must not leave the training loop blocked forever
                put_stop_aware((-1, e))

        threads = [
            threading.Thread(target=producer, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            pending: Dict[int, Dict] = {}
            nxt = 0
            received = 0
            while received < n_batches:
                b, batch = q.get()
                if b < 0:  # producer exception
                    raise batch
                pending[b] = batch
                received += 1
                while nxt in pending:
                    yield pending.pop(nxt)
                    nxt += 1
                    with cv:
                        cursor["nxt"] = nxt
                        cv.notify_all()
            while nxt in pending:
                yield pending.pop(nxt)
                nxt += 1
        finally:
            stop.set()
            with cv:
                cv.notify_all()
