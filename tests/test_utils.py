"""Utility-layer tests: MTCNN cascade mechanics, image grids, metrics writer,
face similarity fallback."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _mtcnn_state_dicts(seed=0):
    """Synthetic P/R/O-net state dicts with facenet_pytorch key names."""
    rng = np.random.RandomState(seed)

    def conv(cin, cout, k):
        kh, kw = (k, k) if isinstance(k, int) else k
        return rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.1

    def lin(cin, cout):
        return rng.randn(cout, cin).astype(np.float32) * 0.1

    b = lambda c: rng.randn(c).astype(np.float32) * 0.01
    pnet = {
        "conv1.weight": conv(3, 10, 3), "conv1.bias": b(10),
        "prelu1.weight": np.full(10, 0.25, np.float32),
        "conv2.weight": conv(10, 16, 3), "conv2.bias": b(16),
        "prelu2.weight": np.full(16, 0.25, np.float32),
        "conv3.weight": conv(16, 32, 3), "conv3.bias": b(32),
        "prelu3.weight": np.full(32, 0.25, np.float32),
        "conv4_1.weight": conv(32, 2, 1), "conv4_1.bias": b(2),
        "conv4_2.weight": conv(32, 4, 1), "conv4_2.bias": b(4),
    }
    rnet = {
        "conv1.weight": conv(3, 28, 3), "conv1.bias": b(28),
        "prelu1.weight": np.full(28, 0.25, np.float32),
        "conv2.weight": conv(28, 48, 3), "conv2.bias": b(48),
        "prelu2.weight": np.full(48, 0.25, np.float32),
        "conv3.weight": conv(48, 64, 2), "conv3.bias": b(64),
        "prelu3.weight": np.full(64, 0.25, np.float32),
        "dense4.weight": lin(576, 128), "dense4.bias": b(128),
        "prelu4.weight": np.full(128, 0.25, np.float32),
        "dense5_1.weight": lin(128, 2), "dense5_1.bias": b(2),
        "dense5_2.weight": lin(128, 4), "dense5_2.bias": b(4),
    }
    onet = {
        "conv1.weight": conv(3, 32, 3), "conv1.bias": b(32),
        "prelu1.weight": np.full(32, 0.25, np.float32),
        "conv2.weight": conv(32, 64, 3), "conv2.bias": b(64),
        "prelu2.weight": np.full(64, 0.25, np.float32),
        "conv3.weight": conv(64, 64, 3), "conv3.bias": b(64),
        "prelu3.weight": np.full(64, 0.25, np.float32),
        "conv4.weight": conv(64, 128, 2), "conv4.bias": b(128),
        "prelu4.weight": np.full(128, 0.25, np.float32),
        "dense5.weight": lin(1152, 256), "dense5.bias": b(256),
        "prelu5.weight": np.full(256, 0.25, np.float32),
        "dense6_1.weight": lin(256, 2), "dense6_1.bias": b(2),
        "dense6_2.weight": lin(256, 4), "dense6_2.bias": b(4),
        "dense6_3.weight": lin(256, 10), "dense6_3.bias": b(10),
    }
    return pnet, rnet, onet


def test_mtcnn_cascade_runs():
    from photoverse_tpu.utils.mtcnn import MTCNN, _convert_net

    pnet, rnet, onet = _mtcnn_state_dicts()
    det = MTCNN(
        _convert_net(pnet), _convert_net(rnet), _convert_net(onet),
        thresholds=(0.3, 0.3, 0.3),
    )
    rng = np.random.RandomState(0)
    img = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
    boxes, probs = det.detect(img)
    # random weights may or may not detect; contract: None or valid arrays
    if boxes is not None:
        assert boxes.shape[1] == 4
        assert probs.shape[0] == boxes.shape[0]


def test_mtcnn_nms_and_bbreg():
    from photoverse_tpu.utils.mtcnn import _bbreg, _nms, _rerec

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.95], np.float32)
    keep = _nms(boxes, scores, 0.3)
    assert set(keep.tolist()) == {2, 0}  # overlapping pair collapses to best
    reg = np.array([[0.1, 0.1, -0.1, -0.1]], np.float32)
    out = _bbreg(np.array([[0.0, 0.0, 10.0, 10.0]], np.float32), reg)
    np.testing.assert_allclose(out[0], [1.1, 1.1, 8.9, 8.9])
    sq = _rerec(np.array([[0.0, 0.0, 20.0, 10.0]], np.float32))
    assert sq[0, 2] - sq[0, 0] == sq[0, 3] - sq[0, 1]


def test_face_similarity_fallback_without_detector():
    from photoverse_tpu.models.arcface import ArcFaceConfig, ArcFaceResNet18
    from photoverse_tpu.models.face_loss import FaceLoss
    from photoverse_tpu.utils.face_similarity import FaceSimilarity

    import jax
    import jax.numpy as jnp

    cfg = ArcFaceConfig(input_size=32)
    model = ArcFaceResNet18(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    fl = FaceLoss("arcface", params)
    fl.model = model
    fs = FaceSimilarity(face_loss=fl)
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    sim = fs.calculate_face_similarity(img, img)
    assert sim == pytest.approx(1.0, abs=1e-4)


def test_save_images_grid(tmp_path):
    from photoverse_tpu.utils.image import save_images_grid, to_pil, denormalize

    rng = np.random.RandomState(0)
    imgs = [to_pil(denormalize(rng.rand(16, 16, 3) * 2 - 1)) for _ in range(3)]
    out = tmp_path / "grid.jpg"
    save_images_grid(
        [("Input Images", imgs), ("a photo of *", imgs)], str(out)
    )
    grid = Image.open(out)
    assert grid.width == 3 * 16
    assert grid.height == 2 * (16 + 50)


def test_metrics_writer(tmp_path):
    from photoverse_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), report_to="none", config={"lr": 1e-4})
    w.log({"loss": 0.5, "lr": 1e-4, "text": "skipped"}, step=1)
    w.log({"loss": 0.25}, step=2)
    w.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 0.25
    assert json.loads((tmp_path / "config.json").read_text())["lr"] == "0.0001"
