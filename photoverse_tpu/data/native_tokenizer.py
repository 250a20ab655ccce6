"""ctypes binding for the native C++ CLIP BPE tokenizer (native/tokenizer.cc).

Same encode contract as photoverse_tpu.data.tokenizer.CLIPTokenizer
(__call__ -> (B, max_len) int32, BOS + ids + EOS, EOS padding). Builds the
shared library on first use; non-ASCII texts (Unicode lowercasing / letter
classes the byte-oriented C++ scanner approximates) fall back to the Python
implementation per text, so outputs always match the reference tokenizer.
ASCII — including '&' and HTML-entity-looking text, which both paths treat
as literal punctuation (no unescape; the reference env has no ftfy) — runs
fully native.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Sequence, Union

import numpy as np

from photoverse_tpu.data.tokenizer import CLIPTokenizer

__all__ = ["NativeTokenizerUnavailable", "NativeCLIPTokenizer"]

from photoverse_tpu.data._native_build import NativeBuildError, build_native_lib

_lock = threading.Lock()
_lib = None


class NativeTokenizerUnavailable(RuntimeError):
    pass


def _build() -> str:
    try:
        return build_native_lib("tokenizer.cc", "libpvtokenizer.so")
    except NativeBuildError as e:
        raise NativeTokenizerUnavailable(str(e)) from e


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.pvtok_create.restype = ctypes.c_void_p
            lib.pvtok_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.pvtok_destroy.argtypes = [ctypes.c_void_p]
            lib.pvtok_encode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            _lib = lib
    return _lib


class NativeCLIPTokenizer:
    """Drop-in CLIPTokenizer with the hot encode path in C++.

    Construction also builds the Python tokenizer (for decode and the
    entity-containing fallback), so all attributes (`model_max_length`,
    `bos_token_id`, ...) are available and identical."""

    def __init__(self, vocab_path: str, merges_path: str, py_tok: CLIPTokenizer):
        lib = _get_lib()
        self._lib = lib
        self._handle = lib.pvtok_create(
            vocab_path.encode(), merges_path.encode()
        )
        if not self._handle:
            raise NativeTokenizerUnavailable(
                f"pvtok_create failed for {vocab_path!r}"
            )
        self._py = py_tok
        self.model_max_length = py_tok.model_max_length
        self.bos_token_id = py_tok.bos_token_id
        self.eos_token_id = py_tok.eos_token_id
        self.pad_token_id = py_tok.pad_token_id

    @classmethod
    def from_pretrained(cls, path: str, subfolder: str = "tokenizer"):
        d = os.path.join(path, subfolder)
        if not os.path.isdir(d):
            d = path
        vocab = os.path.join(d, "vocab.json")
        merges = os.path.join(d, "merges.txt")
        if not os.path.exists(merges):
            raise NativeTokenizerUnavailable(
                "native tokenizer needs an uncompressed merges.txt"
            )
        return cls(vocab, merges, CLIPTokenizer.from_pretrained(path, subfolder))

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        padding: str = "max_length",
        truncation: bool = True,
        max_length: int = None,
        **_: object,
    ) -> np.ndarray:
        if isinstance(text, str):
            text = [text]
        L = max_length or self.model_max_length
        if not truncation:
            # keep the Python tokenizer's loud over-long contract (the C++
            # encoder always truncates). The check requires full Python BPE
            # anyway, so return its output directly instead of paying both
            # tokenizers on this (cold, non-batch-hot) path.
            return self._py(text, truncation=False, max_length=L)
        # the C++ path covers ASCII exactly (incl. '&': no unescape on
        # either path); non-ASCII falls back to Python
        native_ok = lambda t: t.isascii()
        native_idx = [i for i, t in enumerate(text) if native_ok(t)]
        out = np.empty((len(text), L), np.int32)
        if native_idx:
            arr = (ctypes.c_char_p * len(native_idx))(
                *[text[i].encode("utf-8") for i in native_idx]
            )
            buf = np.empty((len(native_idx), L), np.int32)
            self._lib.pvtok_encode_batch(
                self._handle, arr, len(native_idx),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), L,
            )
            out[native_idx] = buf
        # non-ASCII: the Python path handles Unicode classes exactly
        for i, t in enumerate(text):
            if not native_ok(t):
                out[i] = self._py([t], max_length=L)[0]
        return out

    def decode(self, ids) -> str:
        return self._py.decode(ids)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.pvtok_destroy(self._handle)
        except Exception:
            pass
