"""C++ tokenizer parity vs the Python CLIP BPE tokenizer (and transformers
when available) on the tiny test vocab and on the real-ish prompt corpus."""

import numpy as np
import pytest

from tests.test_data import _tiny_tokenizer

try:
    from photoverse_tpu.data.native_tokenizer import (
        NativeCLIPTokenizer,
        NativeTokenizerUnavailable,
    )
    _toolchain = True
except Exception:  # pragma: no cover
    _toolchain = False

pytestmark = pytest.mark.skipif(not _toolchain, reason="no native toolchain")

PROMPTS = [
    "a photo of the *",
    "the photo of a photo",
    "photo   of  the   *",  # whitespace collapse
    "PHOTO OF THE *",  # lowercase
    "photo, of. the! *?",  # punctuation runs
    "photo 1 2 34 of",  # digits split individually
    "photo's of the *",  # contraction
    "photo_of the *",  # underscore = punctuation in the CLIP regex
    "photo ## of _*_",  # '#' runs and mixed underscore/punct runs
    "  photo of the *  ",  # strip
    "<|startoftext|> photo <|endoftext|>",  # special tokens
    "",
]


def _make(tmp_path):
    py = _tiny_tokenizer(tmp_path)
    try:
        nat = NativeCLIPTokenizer.from_pretrained(str(tmp_path))
    except NativeTokenizerUnavailable as e:
        pytest.skip(str(e))
    return py, nat


def test_native_matches_python_on_corpus(tmp_path):
    py, nat = _make(tmp_path)
    for prompt in PROMPTS:
        want = py(prompt)
        got = nat(prompt)
        np.testing.assert_array_equal(got, want, err_msg=repr(prompt))


def test_native_batch_and_entities_fallback(tmp_path):
    py, nat = _make(tmp_path)
    batch = ["a photo of the *", "photo &amp; photo", "the photo"]
    want = py(batch)
    got = nat(batch)
    np.testing.assert_array_equal(got, want)


def test_native_matches_transformers(tmp_path):
    """Byte-level mechanics vs transformers CLIPTokenizer on the tiny vocab."""
    _, nat = _make(tmp_path)
    try:
        from transformers import CLIPTokenizer as HFTok

        hf = HFTok(
            vocab_file=str(tmp_path / "tokenizer" / "vocab.json"),
            merges_file=str(tmp_path / "tokenizer" / "merges.txt"),
            bos_token="<|startoftext|>",
            eos_token="<|endoftext|>",
            pad_token="<|endoftext|>",
            model_max_length=16,
        )
    except Exception:
        pytest.skip("transformers tokenizer unavailable")
    for prompt in ["a photo of the *", "photo, of. the!", "photo 12 of"]:
        want = hf(
            prompt, padding="max_length", truncation=True, max_length=16
        )["input_ids"]
        got = nat(prompt, max_length=16)[0].tolist()
        assert got == list(want), prompt


def test_native_punctuation_run_consumes_apostrophe(tmp_path):
    """The CLIP regex tries the alternation once per scan position, so a
    punctuation run greedily consumes ' and < (\"!!'s\" -> [\"!!'\", \"s\"],
    not [\"!!\", \"'s\"]) — the C++ pretokenizer must match."""
    py, nat = _make(tmp_path)
    for prompt in ["photo!!'s of", "photo!<the", "photo ''of", "photo <of"]:
        np.testing.assert_array_equal(nat(prompt), py(prompt), err_msg=prompt)


def test_native_non_ascii_falls_back(tmp_path):
    py, nat = _make(tmp_path)
    for prompt in ["Ünified photo", "photo of", "café photo"]:
        np.testing.assert_array_equal(nat(prompt), py(prompt), err_msg=repr(prompt))
