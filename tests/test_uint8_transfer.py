"""uint8 host->device transfer path (--uint8_transfer).

The train loop's dominant loop overhead on link-bound hosts is shipping
~75 MB of float32 pixels per optimizer step (PERFORMANCE.md round 5); the
uint8 path ships the raw resized crops (4x fewer bytes) and normalizes on
device (engine.training.normalize_pixel_batch). These tests pin the two
claims that make it safe: (1) it is numerically equivalent to the float32
host pipeline — PIL's RGB resize emits uint8 before either path
normalizes — and (2) the float path is untouched (dtype-gated at trace
time). Reference context: the torch loop transfers normalized float
tensors per batch (/root/reference/train.py:459-475); there is no
reference counterpart to defer normalization, this is a TPU-tunnel/PCIe
bandwidth optimization.
"""

import numpy as np
import pytest
from PIL import Image

from tests.tiny_models import LATENT, RES, SEQ, VOCAB, tiny_bundle


def _rand_image(seed, w=70, h=55):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))


# ------------------------------------------------- preprocessing parity
def test_u8_crops_normalize_to_the_f32_pipeline():
    import jax.numpy as jnp

    from photoverse_tpu.data.preprocessing import (
        CLIP_MEAN,
        CLIP_STD,
        clip_preprocess,
        clip_preprocess_u8,
        preprocess_image,
        preprocess_image_u8,
    )

    img = _rand_image(0)
    f32 = preprocess_image(img, 32)
    u8 = preprocess_image_u8(img, 32)
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    dev = np.asarray(jnp.asarray(u8).astype(jnp.float32) / 127.5 - 1.0)
    assert np.max(np.abs(dev - f32)) < 1e-5

    c32 = clip_preprocess(img, 16)
    cu8 = clip_preprocess_u8(img, 16)
    assert cu8.dtype == np.uint8
    cdev = np.asarray(
        (jnp.asarray(cu8).astype(jnp.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    )
    assert np.max(np.abs(cdev - c32)) < 1e-5


def test_dataset_uint8_pixels_and_collate_preserve_dtype(tmp_path):
    from photoverse_tpu.data.dataset import CustomDataset, collate_fn
    from tests.test_data import _tiny_tokenizer

    imgs = tmp_path / "images"
    imgs.mkdir()
    for i in range(2):
        _rand_image(i).save(imgs / f"{i}.jpg")
    tok = _tiny_tokenizer(tmp_path)
    kw = dict(size=32, clip_size=16)
    ds8 = CustomDataset(str(tmp_path), tok, uint8_pixels=True, **kw)
    dsf = CustomDataset(str(tmp_path), tok, **kw)
    b8 = collate_fn([ds8[0], ds8[1]])
    bf = collate_fn([dsf[0], dsf[1]])
    assert b8["pixel_values"].dtype == np.uint8
    assert b8["pixel_values_clip"].dtype == np.uint8
    assert bf["pixel_values"].dtype == np.float32
    # same source decode: the u8 VAE crop re-normalized equals the f32 crop
    assert np.max(
        np.abs(b8["pixel_values"].astype(np.float32) / 127.5 - 1.0
               - bf["pixel_values"])
    ) < 1e-5


# ------------------------------------------------- train-step equivalence
def test_train_step_identical_loss_under_uint8_batch():
    """The jitted step normalizes u8 inputs itself; feeding the u8 batch
    must produce the same loss/metrics as the pre-normalized f32 batch."""
    import jax
    import jax.numpy as jnp

    from photoverse_tpu.data.preprocessing import CLIP_MEAN, CLIP_STD
    from photoverse_tpu.engine.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    modules, params = tiny_bundle(seed=3)
    cfg = TrainConfig(max_train_steps=4, lr_warmup_steps=0)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx))

    rng = np.random.RandomState(1)
    B = 2
    px_u8 = (rng.rand(B, RES, RES, 3) * 255).astype(np.uint8)
    pxc_u8 = (rng.rand(B, 16, 16, 3) * 255).astype(np.uint8)
    ids = rng.randint(0, VOCAB, (B, SEQ)).astype(np.int32)
    pidx = np.full((B,), 3, np.int32)

    b_u8 = {
        "pixel_values": jnp.asarray(px_u8),
        "pixel_values_clip": jnp.asarray(pxc_u8),
        "text_input_ids": jnp.asarray(ids),
        "concept_placeholder_idx": jnp.asarray(pidx),
    }
    b_f32 = dict(
        b_u8,
        pixel_values=jnp.asarray(px_u8.astype(np.float32) / 127.5 - 1.0),
        pixel_values_clip=jnp.asarray(
            (pxc_u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        ),
    )
    key = jax.random.PRNGKey(0)
    _, _, m8 = step(trainable, frozen, opt_state, b_u8, key)
    _, _, mf = step(trainable, frozen, opt_state, b_f32, key)
    for k in ("loss", "loss_mle", "loss_reg_cross_attn_visual"):
        assert abs(float(m8[k]) - float(mf[k])) < 1e-5, k


def test_uint8_batch_shards_over_the_data_mesh():
    """uint8 batches must shard and train under SPMD exactly like f32 ones
    (the device-side normalize sits inside the jitted step, after the
    sharded transfer): same loss as the replicated single-device step."""
    import jax
    import jax.numpy as jnp

    from photoverse_tpu.engine.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from photoverse_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
        shard_batch,
    )

    modules, params = tiny_bundle(seed=5)
    cfg = TrainConfig(max_train_steps=4, lr_warmup_steps=0)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = make_train_step(modules, cfg, tx)

    rng = np.random.RandomState(2)
    B = 8
    batch = {
        "pixel_values": (rng.rand(B, RES, RES, 3) * 255).astype(np.uint8),
        "pixel_values_clip": (rng.rand(B, 16, 16, 3) * 255).astype(np.uint8),
        "text_input_ids": rng.randint(0, VOCAB, (B, SEQ)).astype(np.int32),
        "concept_placeholder_idx": np.full((B,), 3, np.int32),
    }
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(8)
    repl = replicated(mesh)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, repl), t)
    jstep = jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_sharding(mesh), repl),
        out_shardings=(repl, repl, repl),
    )
    dev_batch = shard_batch(mesh, batch)
    assert dev_batch["pixel_values"].dtype == jnp.uint8
    _, _, m_sharded = jstep(
        put(trainable), put(frozen), put(opt_state), dev_batch, key
    )

    jstep1 = jax.jit(step)
    _, _, m_single = jstep1(
        trainable, frozen, opt_state,
        {k: jnp.asarray(v) for k, v in batch.items()}, key,
    )
    assert float(m_sharded["loss"]) == pytest.approx(
        float(m_single["loss"]), rel=2e-5
    )


def test_uint8_transfer_refused_with_native_loader(tmp_path):
    from photoverse_tpu.cli.train import check_args, parse_args

    args = parse_args([
        "--data_root_path", str(tmp_path),
        "--uint8_transfer", "--native_loader",
    ])
    with pytest.raises(ValueError, match="uint8_transfer"):
        check_args(args)
    # either alone is fine
    check_args(parse_args(["--data_root_path", str(tmp_path),
                           "--uint8_transfer"]))
    check_args(parse_args(["--data_root_path", str(tmp_path),
                           "--native_loader"]))
