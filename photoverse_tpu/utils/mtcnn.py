"""MTCNN face detection — P/R/O-Net cascade, host-driven.

Capability parity with facenet_pytorch.MTCNN as used by the reference eval
(/root/reference/utils/face_similarity.py:5,14,96-105). The three tiny
convnets run as jitted JAX functions; the cascade (image pyramid, NMS,
box regression/refinement) is data-dependent and stays in numpy on the host
— detection is an offline eval path, not a training hot loop.

Weights convert from facenet_pytorch's pnet.pt / rnet.pt / onet.pt state
dicts (`MTCNN.from_torch_weights` accepts a directory containing them or a
single file with {"pnet": ..., "rnet": ..., "onet": ...}).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

__all__ = ["MTCNN"]


# ---------------------------------------------------------------------------
# functional nets (params = converted torch state dicts)
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _prelu(x, w):
    return jnp.where(x >= 0, x, x * w)


def _maxpool_ceil(x, size, stride):
    """torch MaxPool2d(ceil_mode=True): pad bottom/right as needed."""
    B, H, W, C = x.shape
    out_h = -(-(H - size) // stride) + 1
    out_w = -(-(W - size) // stride) + 1
    pad_h = max((out_h - 1) * stride + size - H, 0)
    pad_w = max((out_w - 1) * stride + size - W, 0)
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1),
        "VALID",
    )


def _pnet(params, x):
    x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
    x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
    probs = jax.nn.softmax(_conv(x, params["conv4_1"]), axis=-1)
    reg = _conv(x, params["conv4_2"])
    return probs, reg


def _flatten_torch_whc(x):
    """facenet_pytorch flattens permute(0,3,2,1) = (B, W, H, C); match it so
    the dense weights convert 1:1."""
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(x.shape[0], -1)


def _rnet(params, x):
    x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
    x = _flatten_torch_whc(x)
    x = _prelu(x @ params["dense4"]["kernel"] + params["dense4"]["bias"],
               params["prelu4"])
    probs = jax.nn.softmax(x @ params["dense5_1"]["kernel"] + params["dense5_1"]["bias"], axis=-1)
    reg = x @ params["dense5_2"]["kernel"] + params["dense5_2"]["bias"]
    return probs, reg


def _onet(params, x):
    x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv(x, params["conv4"]), params["prelu4"])
    x = _flatten_torch_whc(x)
    x = _prelu(x @ params["dense5"]["kernel"] + params["dense5"]["bias"],
               params["prelu5"])
    probs = jax.nn.softmax(x @ params["dense6_1"]["kernel"] + params["dense6_1"]["bias"], axis=-1)
    reg = x @ params["dense6_2"]["kernel"] + params["dense6_2"]["bias"]
    lms = x @ params["dense6_3"]["kernel"] + params["dense6_3"]["bias"]
    return probs, reg, lms


def _convert_net(sd: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in sd.items():
        v = np.asarray(v)
        name, leaf = k.rsplit(".", 1)
        if leaf == "weight" and v.ndim == 4:
            out.setdefault(name, {})["kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and v.ndim == 2:
            out.setdefault(name, {})["kernel"] = v.T
        elif leaf == "bias":
            out.setdefault(name, {})["bias"] = v
        elif leaf == "weight":  # PReLU slope, per-channel
            out[name] = v.reshape(1, 1, 1, -1) if "conv" in name or name.startswith("prelu") else v
    # PReLU after dense layers must stay 1-D
    for k in list(out.keys()):
        if isinstance(out[k], np.ndarray) and k in ("prelu4", "prelu5"):
            out[k] = out[k].reshape(-1)
    return out


# ---------------------------------------------------------------------------
# host-side cascade helpers
# ---------------------------------------------------------------------------


def _nms(boxes: np.ndarray, scores: np.ndarray, thresh: float, mode: str = "union"):
    order = scores.argsort()[::-1]
    keep = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        if mode == "min":
            ov = inter / np.minimum(area[i], area[order[1:]])
        else:
            ov = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][ov <= thresh]
    return np.asarray(keep, dtype=np.int64)


def _bbreg(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + reg[:, 0] * w
    out[:, 1] = boxes[:, 1] + reg[:, 1] * h
    out[:, 2] = boxes[:, 2] + reg[:, 2] * w
    out[:, 3] = boxes[:, 3] + reg[:, 3] * h
    return out


def _rerec(boxes: np.ndarray) -> np.ndarray:
    """Square the boxes around their centers."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + w * 0.5 - side * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    crops = []
    for x1, y1, x2, y2 in boxes[:, :4].astype(int):
        x1c, y1c = max(x1, 0), max(y1, 0)
        x2c, y2c = min(x2, w), min(y2, h)
        patch = np.zeros((max(y2 - y1, 1), max(x2 - x1, 1), 3), dtype=img.dtype)
        if x2c > x1c and y2c > y1c:
            patch[y1c - y1 : y2c - y1, x1c - x1 : x2c - x1] = img[y1c:y2c, x1c:x2c]
        crops.append(
            np.asarray(Image.fromarray(patch.astype(np.uint8)).resize((size, size)))
        )
    return np.stack(crops).astype(np.float32)


def _norm(x: np.ndarray) -> np.ndarray:
    return (x - 127.5) * 0.0078125


def _pad_pow2(x: np.ndarray) -> Tuple[np.ndarray, int]:
    """Zero-pad the batch dim to the next power of two. The R/O-Net batch
    sizes equal per-image detection counts, so without bucketing nearly
    every image would trigger a fresh XLA compile of the jitted nets;
    padded rows are sliced off after the call."""
    n = x.shape[0]
    b = 1
    while b < n:
        b *= 2
    if b == n:
        return x, n
    pad = np.zeros((b - n, *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0), n


class MTCNN:
    def __init__(self, pnet_params, rnet_params, onet_params,
                 thresholds=(0.6, 0.7, 0.7), min_face_size: int = 20,
                 factor: float = 0.709):
        self.pnet = jax.jit(lambda x: _pnet(pnet_params, x))
        self.rnet = jax.jit(lambda x: _rnet(rnet_params, x))
        self.onet = jax.jit(lambda x: _onet(onet_params, x))
        self.thresholds = thresholds
        self.min_face_size = min_face_size
        self.factor = factor

    @classmethod
    def from_torch_weights(cls, path: str, **kw) -> "MTCNN":
        import torch

        # weights_only=True: the facenet_pytorch files are plain tensor
        # state dicts; full unpickling would execute arbitrary code from an
        # untrusted weights file
        def load(p):
            sd = torch.load(p, map_location="cpu", weights_only=True)
            return _convert_net({k: v.numpy() for k, v in sd.items()})

        if os.path.isdir(path):
            return cls(
                load(os.path.join(path, "pnet.pt")),
                load(os.path.join(path, "rnet.pt")),
                load(os.path.join(path, "onet.pt")),
                **kw,
            )
        blob = torch.load(path, map_location="cpu", weights_only=True)
        conv = lambda sd: _convert_net({k: v.numpy() for k, v in sd.items()})
        return cls(conv(blob["pnet"]), conv(blob["rnet"]), conv(blob["onet"]), **kw)

    # ------------------------------------------------------------------
    def detect(self, image: np.ndarray) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """(H, W, 3) uint8 -> (boxes (N,4), probs (N,)) or (None, None)."""
        img = np.asarray(image).astype(np.float32)
        h, w = img.shape[:2]
        m = 12.0 / self.min_face_size

        # stage 1: pyramid + PNet
        scales = []
        scale = m
        while min(h, w) * scale >= 12:
            scales.append(scale)
            scale *= self.factor
        total_boxes = []
        for s in scales:
            hs, ws = int(np.ceil(h * s)), int(np.ceil(w * s))
            im = np.asarray(
                Image.fromarray(image.astype(np.uint8)).resize((ws, hs))
            ).astype(np.float32)
            probs, reg = self.pnet(_norm(im)[None])
            probs = np.asarray(probs)[0, :, :, 1]
            reg = np.asarray(reg)[0]
            mask = probs >= self.thresholds[0]
            if not mask.any():
                continue
            yy, xx = np.nonzero(mask)
            score = probs[yy, xx]
            r = reg[yy, xx]  # (n, 4)
            stride, cell = 2, 12
            x1 = np.round((stride * xx + 1) / s)
            y1 = np.round((stride * yy + 1) / s)
            x2 = np.round((stride * xx + cell) / s)
            y2 = np.round((stride * yy + cell) / s)
            boxes = np.stack([x1, y1, x2, y2], axis=1)
            keep = _nms(boxes, score, 0.5)
            total_boxes.append(
                np.concatenate([boxes[keep], score[keep, None], r[keep]], axis=1)
            )
        if not total_boxes:
            return None, None
        tb = np.concatenate(total_boxes, axis=0)
        keep = _nms(tb[:, :4], tb[:, 4], 0.7)
        tb = tb[keep]
        tb[:, :4] = _rerec(_bbreg(tb[:, :4], tb[:, 5:9]))

        # stage 2: RNet (bucket-padded so the jit compiles per power-of-two
        # batch, not per detection count)
        crops, n = _pad_pow2(_norm(_crop_resize(img, tb, 24)))
        probs, reg = self.rnet(crops)
        probs = np.asarray(probs)[:n, 1]
        reg = np.asarray(reg)[:n]
        mask = probs >= self.thresholds[1]
        if not mask.any():
            return None, None
        tb = np.concatenate([tb[mask, :4], probs[mask, None]], axis=1)
        reg = reg[mask]
        keep = _nms(tb[:, :4], tb[:, 4], 0.7)
        tb, reg = tb[keep], reg[keep]
        tb[:, :4] = _rerec(_bbreg(tb[:, :4], reg))

        # stage 3: ONet (bucket-padded, like stage 2)
        crops, n = _pad_pow2(_norm(_crop_resize(img, tb, 48)))
        probs, reg, _ = self.onet(crops)
        probs = np.asarray(probs)[:n, 1]
        reg = np.asarray(reg)[:n]
        mask = probs >= self.thresholds[2]
        if not mask.any():
            return None, None
        tb = np.concatenate([tb[mask, :4], probs[mask, None]], axis=1)
        tb[:, :4] = _bbreg(tb[:, :4], reg[mask])
        keep = _nms(tb[:, :4], tb[:, 4], 0.7, mode="min")
        tb = tb[keep]
        return tb[:, :4], tb[:, 4]
