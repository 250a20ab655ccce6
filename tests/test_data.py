"""Data layer tests: tokenizer BPE, prompt prep, preprocessing geometry,
dataset/loader, celebahq mask fusion + split."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from photoverse_tpu.data.preprocessing import (
    CLIP_MEAN,
    CLIP_STD,
    apply_mask_and_crop,
    clip_preprocess,
    crop_to_mask_and_scale,
    preprocess_image,
)
from photoverse_tpu.data.prompts import (
    EVAL_PROMPTS,
    IMAGENET_TEMPLATES_SMALL,
    find_placeholder_index,
    prepare_prompt,
    random_batch_slicing,
)
from photoverse_tpu.data.tokenizer import CLIPTokenizer


def _tiny_tokenizer(tmp_path):
    """Synthesize a minimal CLIP-style vocab/merges pair."""
    chars = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    for m in ["p h", "ph o", "pho t", "phot o</w>", "o f</w>", "t h", "th e</w>", "a</w> b"]:
        merged = m.replace(" ", "")
        if merged not in vocab:
            vocab[merged] = len(vocab)
    vocab["*</w>"] = len(vocab)
    for c in "0123456789,.!?'":
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["'s</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    d = tmp_path / "tokenizer"
    d.mkdir(parents=True, exist_ok=True)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(["p h", "ph o", "pho t", "phot o</w>",
                                       "o f</w>", "t h", "th e</w>"])
    )
    (d / "tokenizer_config.json").write_text(json.dumps({"model_max_length": 16}))
    return CLIPTokenizer.from_pretrained(str(tmp_path))


def test_tokenizer_bpe_and_padding(tmp_path):
    tok = _tiny_tokenizer(tmp_path)
    assert tok.model_max_length == 16
    ids = tok("the photo of *")
    assert ids.shape == (1, 16)
    assert ids[0, 0] == tok.bos_token_id
    toks = [int(i) for i in ids[0]]
    eos_pos = toks.index(tok.eos_token_id)
    # "the" and "photo" and "of" merged to single tokens
    assert tok.decode(toks[1:eos_pos]) == "the photo of *"
    # padding with EOS
    assert all(t == tok.eos_token_id for t in toks[eos_pos:])


def test_tokenizer_parity_with_transformers(tmp_path):
    """Byte-level BPE mechanics vs transformers CLIPTokenizer on the same
    tiny vocab files."""
    _tiny_tokenizer(tmp_path)  # writes the files
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
        pytest.skip("transformers CLIPTokenizer unavailable")
    ours = CLIPTokenizer.from_pretrained(str(tmp_path))
    for text in [
        "the photo of a cat",
        "photo photo",
        "of the a b c",
        # '_' is punctuation in CLIP's regex ([^\s\p{L}\p{N}]+), not \w
        "a_b photo",
        # no html.unescape without ftfy (the reference's environment):
        # '&amp;' must stay its literal characters
        "&amp; photo",
        "photo!!' of",
    ]:
        want = hf(text, padding="max_length", truncation=True, max_length=16)[
            "input_ids"
        ]
        got = ours(text, max_length=16)[0].tolist()
        assert got == want, (text, got, want)


def test_find_placeholder_index():
    assert find_placeholder_index("a photo of *") == 4
    assert find_placeholder_index("* on the beach") == 1
    assert find_placeholder_index("no placeholder here") == 0


def test_prepare_prompt_contract(tmp_path):
    tok = _tiny_tokenizer(tmp_path)
    ex = prepare_prompt(tok, "the photo of {}", "*", num_of_samples=3,
                        negative_prompt="bad")
    assert ex["text_input_ids"].shape == (3, 16)
    assert ex["concept_placeholder_idx"].shape == (3, 1)
    assert int(ex["concept_placeholder_idx"][0, 0]) == 4
    assert ex["negative_text_input_ids"].shape == (3, 16)
    assert ex["text"] == ["the photo of *"] * 3


def test_random_batch_slicing():
    rng = np.random.RandomState(0)
    ex = {"a": np.arange(8).reshape(8, 1), "b": list(range(8)), "c": "keep"}
    out = random_batch_slicing(ex, 8, 3, rng)
    assert out["a"].shape == (3, 1)
    assert len(out["b"]) == 3
    assert out["c"] == "keep"
    assert [int(x) for x in out["a"].ravel()] == out["b"]


def test_preprocess_image_range_and_shape():
    img = Image.fromarray(
        (np.random.RandomState(0).rand(300, 400, 3) * 255).astype(np.uint8)
    )
    out = preprocess_image(img, size=64)
    assert out.shape == (64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_clip_preprocess_matches_transformers():
    try:
        from transformers import CLIPImageProcessor
    except Exception:
        pytest.skip("transformers unavailable")
    rng = np.random.RandomState(1)
    img = Image.fromarray((rng.rand(280, 300, 3) * 255).astype(np.uint8))
    want = CLIPImageProcessor()(images=img, return_tensors="np")["pixel_values"]
    got = clip_preprocess(img)
    np.testing.assert_allclose(
        got.transpose(2, 0, 1)[None], want, rtol=1e-3, atol=2e-2
    )


def test_crop_to_mask_geometry():
    mask = np.zeros((100, 100), np.uint8)
    mask[40:60, 30:50] = 1
    img = np.arange(100 * 100 * 3).reshape(100, 100, 3).astype(np.uint8)
    crop = crop_to_mask_and_scale(img, mask)
    h, w = crop.shape[:2]
    # squared-ish crop at least the 1.3-scaled bbox
    assert h >= 24 and w >= 24
    assert abs(h - w) <= max(h, w) // 2


def test_apply_mask_and_crop_zeros_background():
    img = Image.fromarray(np.full((64, 64, 3), 200, np.uint8))
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 20:40] = 255
    out = apply_mask_and_crop(img, Image.fromarray(mask))
    assert out.max() == 200
    assert (out == 0).any()  # background zeroed inside the scaled crop


def test_dataset_and_loader(tmp_path):
    from photoverse_tpu.data.dataset import BatchLoader, CustomDataset

    tok = _tiny_tokenizer(tmp_path)
    img_dir = tmp_path / "data" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray((rng.rand(80, 80, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
    ds = CustomDataset(str(tmp_path / "data"), tok, size=32, template="the photo of {}")
    assert len(ds) == 6
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["pixel_values"].shape == (2, 32, 32, 3)
    assert b["pixel_values_clip"].shape == (2, 224, 224, 3)
    assert b["text_input_ids"].shape == (2, 16)
    assert b["concept_placeholder_idx"].shape == (2, 1)
    assert len(b["text"]) == 2


def test_masked_dataset(tmp_path):
    from photoverse_tpu.data.dataset import CustomDatasetWithMasks

    tok = _tiny_tokenizer(tmp_path)
    root = tmp_path / "data2"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{i}.jpg"
        )
        m = np.zeros((64, 64), np.uint8)
        m[16:48, 16:48] = 255
        Image.fromarray(m).save(root / "masks" / f"{i}.png")
    ds = CustomDatasetWithMasks(str(root), tok, size=32)
    ex = ds[0]
    assert ex["pixel_values"].shape == (32, 32, 3)
    assert ex["pixel_values_clip"].shape == (224, 224, 3)


def test_celebahq_mask_fusion_and_split(tmp_path):
    from photoverse_tpu.data.celebahq import (
        create_celebahq_masks,
        split_celebhqmasks_train_test,
    )

    anno = tmp_path / "anno" / "0"
    anno.mkdir(parents=True)
    n = 10
    for k in range(n):
        skin = np.zeros((512, 512), np.uint8)
        skin[10:20, 10:20] = 255
        Image.fromarray(skin).save(anno / f"{str(k).rjust(5, '0')}_skin.png")
        hair = np.zeros((512, 512), np.uint8)
        hair[15:25, 15:25] = 255
        Image.fromarray(hair).save(anno / f"{str(k).rjust(5, '0')}_hair.png")
        # skipped label must not appear
        cloth = np.zeros((512, 512), np.uint8)
        cloth[0:5, 0:5] = 255
        Image.fromarray(cloth).save(anno / f"{str(k).rjust(5, '0')}_cloth.png")
    masks_out = tmp_path / "fused"
    create_celebahq_masks(str(tmp_path / "anno"), str(masks_out), num_of_images=n)
    m0 = np.asarray(Image.open(masks_out / "0.png"))
    assert m0[12, 12] == 1  # skin -> label index 0 + 1
    assert m0[22, 22] == 13  # hair -> index 12 + 1
    assert m0[2, 2] == 0  # cloth skipped

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for k in range(n):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(imgs / f"{k}.jpg")
    train, test = split_celebhqmasks_train_test(
        str(imgs), str(masks_out), str(tmp_path / "split"), train_ratio=0.8, seed=0
    )
    assert len(os.listdir(os.path.join(train, "images"))) == 8
    assert len(os.listdir(os.path.join(test, "images"))) == 2
    assert len(os.listdir(os.path.join(train, "masks"))) == 8


def test_template_lists_match_reference():
    assert len(IMAGENET_TEMPLATES_SMALL) == 27
    assert len(EVAL_PROMPTS) == 7
    assert IMAGENET_TEMPLATES_SMALL[0] == "a photo of a {}"
    assert EVAL_PROMPTS[0] == "{} in Ghibli anime style"


def test_native_loader_matches_python(tmp_path):
    pytest_mod = pytest  # keep import used
    try:
        from photoverse_tpu.data.native_loader import get_loader
        loader = get_loader()
    except Exception as e:
        pytest.skip(f"native loader unavailable: {e}")
    rng = np.random.RandomState(0)
    x, y = np.meshgrid(np.linspace(0, 1, 96), np.linspace(0, 1, 120))
    img = np.stack(
        [np.sin(6 * x) * 127 + 128, np.cos(4 * y) * 127 + 128, x * y * 255], -1
    ).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    pv, pc = loader.load_batch([str(p)], size=64, clip_size=48)
    ref_pv = preprocess_image(Image.open(p), 64)
    ref_pc = clip_preprocess(Image.open(p), 48)
    assert np.abs(pv[0] - ref_pv).max() < 0.02
    assert np.abs(pc[0] - ref_pc).max() < 0.06


def test_native_batch_loader(tmp_path):
    try:
        from photoverse_tpu.data.native_loader import get_loader
        get_loader()
    except Exception as e:
        pytest.skip(f"native loader unavailable: {e}")
    from photoverse_tpu.data.dataset import BatchLoader, CustomDataset

    tok = _tiny_tokenizer(tmp_path)
    img_dir = tmp_path / "data3" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(80, 80, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
    ds = CustomDataset(str(tmp_path / "data3"), tok, size=32)
    nat = list(BatchLoader(ds, 2, shuffle=False, native=True, num_workers=1))
    py = list(BatchLoader(ds, 2, shuffle=False, num_workers=1))
    assert len(nat) == len(py) == 2
    np.testing.assert_array_equal(nat[0]["text_input_ids"], py[0]["text_input_ids"])
    # jpeg decode differs slightly between libjpeg paths; loose pixel check
    assert np.abs(nat[0]["pixel_values"] - py[0]["pixel_values"]).max() < 0.25
    assert nat[0]["pixel_values_clip"].shape == py[0]["pixel_values_clip"].shape


def test_native_masked_loader_matches_python(tmp_path):
    """pv_load_batch_masked reproduces the CustomDatasetWithMasks pipeline
    (background zeroing + scaled/squared bbox crop + CLIP preprocessing)."""
    try:
        from photoverse_tpu.data.native_loader import get_loader
        loader = get_loader()
    except Exception as e:
        pytest.skip(f"native loader unavailable: {e}")
    from photoverse_tpu.data.preprocessing import apply_mask_and_crop

    rng = np.random.RandomState(3)
    x, y = np.meshgrid(np.linspace(0, 1, 96), np.linspace(0, 1, 96))
    img = np.stack(
        [np.sin(5 * x) * 120 + 128, np.cos(3 * y) * 120 + 128, (x + y) * 120], -1
    ).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[18:50, 22:44] = 255  # off-center face region
    ip = tmp_path / "img.png"
    mp = tmp_path / "mask.png"
    Image.fromarray(img).save(ip)
    Image.fromarray(mask).save(mp)

    pv, pc = loader.load_batch_masked([str(ip)], [str(mp)], size=48, clip_size=32)
    ref_pv = preprocess_image(Image.open(ip), 48)
    face = apply_mask_and_crop(Image.open(ip), Image.open(mp))
    ref_pc = clip_preprocess(face, 32)
    assert np.abs(pv[0] - ref_pv).max() < 0.02
    # the image->mask-size resize goes uint8->float in C++ vs PIL uint8;
    # plus CLIP normalization amplification — loose pixel tolerance
    assert np.abs(pc[0] - ref_pc).max() < 0.12
    # the background must be zeroed identically: compare the crop's support
    assert pc.shape == (1, 32, 32, 3)


def test_native_masked_batchloader(tmp_path):
    try:
        from photoverse_tpu.data.native_loader import get_loader
        get_loader()
    except Exception as e:
        pytest.skip(f"native loader unavailable: {e}")
    from photoverse_tpu.data.dataset import BatchLoader, CustomDatasetWithMasks

    tok = _tiny_tokenizer(tmp_path)
    root = tmp_path / "data4"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(80, 80, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{i}.png"
        )
        m = np.zeros((80, 80), np.uint8)
        m[20 + i : 60, 25 : 55 + i] = 255
        Image.fromarray(m).save(root / "masks" / f"{i}.png")
    ds = CustomDatasetWithMasks(str(root), tok, size=32, clip_size=32)
    nat = list(BatchLoader(ds, 2, shuffle=False, native=True, num_workers=1))
    py = list(BatchLoader(ds, 2, shuffle=False, num_workers=1))
    assert len(nat) == len(py) == 2
    for b_nat, b_py in zip(nat, py):
        np.testing.assert_array_equal(
            b_nat["text_input_ids"], b_py["text_input_ids"]
        )
        assert np.abs(b_nat["pixel_values"] - b_py["pixel_values"]).max() < 0.02
        assert (
            np.abs(b_nat["pixel_values_clip"] - b_py["pixel_values_clip"]).max()
            < 0.2
        )


def test_batchloader_propagates_producer_errors(tmp_path):
    """A corrupt image must raise in the consumer, not hang the training
    loop forever on q.get() (the producer thread used to die silently)."""
    from photoverse_tpu.data.dataset import BatchLoader, CustomDataset

    tok = _tiny_tokenizer(tmp_path)
    root = tmp_path / "data_bad"
    (root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{i}.jpg"
        )
    (root / "images" / "3.jpg").write_bytes(b"this is not a jpeg")
    ds = CustomDataset(str(root), tok, size=32, clip_size=32)
    with pytest.raises(Exception):
        list(BatchLoader(ds, 2, shuffle=False, num_workers=2))


def test_batchloader_early_close_releases_workers(tmp_path):
    """Breaking out of iteration (max_train_steps / SIGTERM paths) must
    release every producer thread — they used to block in q.put forever."""
    import threading
    import time as _time

    from photoverse_tpu.data.dataset import BatchLoader, CustomDataset

    tok = _tiny_tokenizer(tmp_path)
    root = tmp_path / "data_close"
    (root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(16):
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{i}.jpg"
        )
    ds = CustomDataset(str(root), tok, size=32, clip_size=32)
    baseline = threading.active_count()
    it = iter(BatchLoader(ds, 2, shuffle=False, num_workers=4, prefetch=1))
    next(it)
    it.close()  # generator close -> finally -> stop.set()
    deadline = _time.monotonic() + 10
    while threading.active_count() > baseline and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= baseline


def test_dataset_ignores_non_image_files(tmp_path):
    """Stray non-image files ('notes_jpg.txt', '5.jpg.bak') and non-numeric
    stems must not crash dataset construction or reach the decoder."""
    from photoverse_tpu.data.dataset import CustomDataset

    tok = _tiny_tokenizer(tmp_path)
    root = tmp_path / "data_mixed"
    (root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"{i}.jpg"
        )
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
        root / "images" / "face_01.jpg"
    )
    (root / "images" / "notes_jpg.txt").write_text("not an image")
    (root / "images" / "5.jpg.bak").write_bytes(b"backup")
    ds = CustomDataset(str(root), tok, size=32, clip_size=32)
    names = [__import__("os").path.basename(p) for p in ds.image_paths]
    # numeric stems first (reference order), non-numeric after, junk excluded
    assert names == ["0.jpg", "1.jpg", "face_01.jpg"]
    for i in range(len(ds)):
        ds[i]
