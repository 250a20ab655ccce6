"""W8A8 dynamic-int8 dense path (ops/quant.py): numerics + wiring.

The conditioning encoders are frozen in the reference
(/root/reference/models/modeling_utils.py:63-66), so an inference-only
quantized path is legal there; these tests pin (a) the quantized matmul's
error envelope, (b) that Int8Dense is a parameter-compatible drop-in for
nn.Dense, and (c) that the int8_dense flag threads from build_models into
both CLIP encoders without changing the param tree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from photoverse_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
)
from photoverse_tpu.ops.quant import Int8Dense, int8_matmul


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_matmul_error_envelope():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 128) / 16.0, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.1, jnp.float32)
    want = np.asarray(x @ w + b)
    got = np.asarray(int8_matmul(x, w, b, jnp.float32))
    assert _cos(want, got) > 0.999
    # per-tensor activation scale: error is bounded by the quantization
    # step of the largest activation
    step = float(np.abs(np.asarray(x)).max()) / 127.0
    assert np.max(np.abs(want - got)) < step * np.abs(np.asarray(w)).sum(0).max() + 0.1


def test_int8_dense_param_compat():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)
    d = nn.Dense(16)
    q = Int8Dense(16)
    pd = d.init(jax.random.PRNGKey(0), x)["params"]
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # same params through both paths agree closely
    out_d = d.apply({"params": pd}, x)
    out_q = q.apply({"params": pd}, x)
    assert _cos(out_d, out_q) > 0.999


def test_int8_flag_threads_and_encoders_stay_close():
    from photoverse_tpu.models.assembly import build_models

    mods = build_models(int8_conditioning=True)
    assert mods.text_encoder.config.int8_dense
    assert mods.vision_encoder.config.int8_dense
    assert not build_models().text_encoder.config.int8_dense

    tcfg = dict(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                intermediate_size=32, max_position_embeddings=12)
    vcfg = dict(hidden_size=16, num_layers=2, num_heads=2,
                intermediate_size=32, image_size=16, patch_size=8)
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, 64, (2, 12)), jnp.int32)
    px = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)

    te = CLIPTextEncoder(CLIPTextConfig(**tcfg))
    te_q = CLIPTextEncoder(CLIPTextConfig(int8_dense=True, **tcfg))
    p = te.init(jax.random.PRNGKey(0), ids)["params"]
    p_q = te_q.init(jax.random.PRNGKey(0), ids)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_q)
    h, _ = te.apply({"params": p}, ids)
    h_q, _ = te_q.apply({"params": p}, ids)
    assert _cos(h, h_q) > 0.99

    ve = CLIPVisionEncoder(CLIPVisionConfig(**vcfg))
    ve_q = CLIPVisionEncoder(CLIPVisionConfig(int8_dense=True, **vcfg))
    pv = ve.init(jax.random.PRNGKey(0), px)["params"]
    hv, _ = ve.apply({"params": pv}, px, collect_layers=(1,))
    hv_q, _ = ve_q.apply({"params": pv}, px, collect_layers=(1,))
    assert _cos(hv, hv_q) > 0.99


def test_training_refuses_int8_modules():
    """round() has zero gradient — make_train_step must refuse int8 builds
    loudly instead of letting adapter training stall silently."""
    import optax
    import pytest

    from photoverse_tpu.engine.training import TrainConfig, make_train_step
    from photoverse_tpu.models.assembly import build_models

    mods = build_models(int8_conditioning=True)
    with pytest.raises(ValueError, match="inference-only"):
        make_train_step(mods, TrainConfig(), optax.sgd(1e-3))
