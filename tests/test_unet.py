"""UNet parity vs torch golden replica + train-mode behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from photoverse_tpu.convert.torch_to_jax import convert_unet
from photoverse_tpu.models.unet import UNet2DCondition, UNetConfig
from photoverse_tpu.ops.attention import fuse_outputs
from tests.torch_ref_unet import RefUNet

TINY = dict(block_out_channels=(32, 64), layers_per_block=1, cross_dim=16, heads=2)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = RefUNet(**TINY, groups=8).eval()
    cfg = UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=16,
        num_heads=2,
        norm_num_groups=8,
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_unet(sd, block_out_channels=(32, 64), layers_per_block=1)
    return ref, UNet2DCondition(config=cfg), params


def test_unet_parity(pair):
    ref, unet, params = pair
    rng = np.random.RandomState(0)
    B = 2
    sample = rng.randn(B, 4, 16, 16).astype(np.float32)
    t = np.array([3, 777], dtype=np.int64)
    text = rng.randn(B, 7, 16).astype(np.float32)
    idc = rng.randn(B, 3, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(sample),
            torch.from_numpy(t),
            torch.from_numpy(text),
            torch.from_numpy(idc),
        ).numpy()
    got, norms = unet.apply(
        {"params": params},
        jnp.asarray(sample.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(text),
        jnp.asarray(idc),
    )
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=5e-4, atol=5e-5)
    # 1 down attn + 1 mid + 2 up attns = 4 cross layers, 2 heads, 3 id tokens
    assert norms.shape == (B, 4 * 2 * 3)


def test_vip_norm_values(pair):
    ref, unet, params = pair
    rng = np.random.RandomState(1)
    B = 1
    sample = jnp.asarray(rng.randn(B, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([10])
    text = jnp.asarray(rng.randn(B, 7, 16).astype(np.float32))
    idc = jnp.asarray(rng.randn(B, 3, 16).astype(np.float32))
    _, norms = unet.apply({"params": params}, sample, t, text, idc)
    # check the first layer's norms against a direct computation
    w = params["down_0_attn_0"]["attn2"]["to_v_ip"]["kernel"]
    v_ip = np.asarray(idc) @ np.asarray(w)  # (B, 3, 32)
    v_heads = v_ip.reshape(B, 3, 2, 16)  # (B, K, H, d)
    want = np.linalg.norm(v_heads, axis=-1).transpose(0, 2, 1)  # (B, H, K)
    np.testing.assert_allclose(
        np.asarray(norms)[:, : 2 * 3].reshape(B, 2, 3), want, rtol=1e-4, atol=1e-5
    )


def test_fusion_rules():
    t = jnp.ones((1, 4, 2, 8))
    i = 2 * jnp.ones((1, 4, 2, 8))
    # eval: sum
    np.testing.assert_allclose(np.asarray(fuse_outputs(t, i, train=False)), 3.0)
    # train branches
    np.testing.assert_allclose(
        np.asarray(fuse_outputs(t, i, train=True, fusion_u=jnp.asarray(0.1))), 2.0
    )
    np.testing.assert_allclose(
        np.asarray(fuse_outputs(t, i, train=True, fusion_u=jnp.asarray(0.9))), 4.0
    )
    np.testing.assert_allclose(
        np.asarray(fuse_outputs(t, i, train=True, fusion_u=jnp.asarray(0.5))), 3.0
    )


def test_train_mode_stochastic_fusion_varies(pair):
    _, unet, params = pair
    rng = np.random.RandomState(2)
    sample = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([100])
    text = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    idc = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    outs = [
        np.asarray(
            unet.apply(
                {"params": params}, sample, t, text, idc,
                train=True, fusion_rng=jax.random.PRNGKey(s),
            )[0]
        )
        for s in (0, 1)
    ]
    assert not np.allclose(outs[0], outs[1])


def test_lora_zero_init_is_identity(pair):
    ref, _, _ = pair
    torch.manual_seed(0)
    cfg = UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=16,
        num_heads=2,
        norm_num_groups=8,
        lora_rank=4,
    )
    unet_lora = UNet2DCondition(config=cfg)
    rng = np.random.RandomState(3)
    sample = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([5])
    text = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    idc = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    params = unet_lora.init(jax.random.PRNGKey(0), sample, t, text, idc)["params"]
    # zero-init B => LoRA output identical to base-only output
    base_params = jax.tree.map(lambda x: x, params)
    out1, _ = unet_lora.apply({"params": params}, sample, t, text, idc)
    a = params["down_0_attn_0"]["attn2"]["to_q"]["lora_A"]
    assert a.shape == (32, 4)
    params["down_0_attn_0"]["attn2"]["to_q"]["lora_B"] = (
        np.ones((4, 32), np.float32) * 0.1
    )
    out2, _ = unet_lora.apply({"params": params}, sample, t, text, idc)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    del base_params


def test_remat_unet_train_matches_and_grads_flow():
    """remat=True must be numerically identical and differentiable."""
    cfg = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=16,
        num_heads=2, norm_num_groups=8,
    )
    cfg_r = UNetConfig(
        block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=16,
        num_heads=2, norm_num_groups=8, remat=True,
    )
    u, ur = UNet2DCondition(cfg), UNet2DCondition(cfg_r)
    rng = np.random.RandomState(11)
    s = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([9])
    tc = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    ic = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    params = u.init(jax.random.PRNGKey(0), s, t, tc, ic)["params"]

    key = jax.random.PRNGKey(3)
    o1, n1 = u.apply({"params": params}, s, t, tc, ic, train=True, fusion_rng=key)
    o2, n2 = ur.apply({"params": params}, s, t, tc, ic, train=True, fusion_rng=key)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-5, atol=1e-6)

    def loss(p, mod):
        o, _ = mod.apply({"params": p}, s, t, tc, ic, train=True, fusion_rng=key)
        return jnp.mean(jnp.square(o))

    g1 = jax.grad(loss)(params, u)
    g2 = jax.grad(loss)(params, ur)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g1,
        g2,
    )


def test_ip_adapter_mask(pair):
    """Spatial identity mask: masked-out regions get text-only attention,
    fully-masked regions get text + scale*identity
    (reference attention_processor.py:359-390 semantics)."""
    _, unet, params = pair
    rng = np.random.RandomState(13)
    s = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([50])
    tc = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    ic = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    ones = jnp.ones((1, 16, 16))
    zeros = jnp.zeros((1, 16, 16))
    out_none, _ = unet.apply({"params": params}, s, t, tc, ic)
    out_ones, _ = unet.apply({"params": params}, s, t, tc, ic, ip_mask=ones)
    out_zero, _ = unet.apply({"params": params}, s, t, tc, ic, ip_mask=zeros)
    # eval fusion (sum, scale off) vs masked path (scale on): ones-mask uses
    # scale*id so differs from the unmasked sum; zero-mask kills identity
    assert not np.allclose(np.asarray(out_ones), np.asarray(out_none))
    assert not np.allclose(np.asarray(out_zero), np.asarray(out_ones))
    assert np.all(np.isfinite(np.asarray(out_ones)))


def test_fusion_rules_configurable():
    """fusion_rule1/2 flow from the config into the stochastic fusion
    branch thresholds (reference attention_processor.py:27-42 makes the
    rules configurable; they were previously dead config)."""
    import jax.numpy as jnp

    from photoverse_tpu.ops.attention import fuse_outputs

    text = jnp.ones((1, 2, 2, 4))
    ident = jnp.full((1, 2, 2, 4), 3.0)
    u = jnp.asarray(0.5)
    # default rules: 1/3 < 0.5 < 2/3 -> sum
    out = fuse_outputs(text, ident, train=True, fusion_u=u)
    assert float(out[0, 0, 0, 0]) == 4.0
    # rule1=0.9: u < rule1 -> scale * text only
    out = fuse_outputs(text, ident, train=True, fusion_u=u, rule1=0.9, rule2=0.95)
    assert float(out[0, 0, 0, 0]) == 2.0
    # rule2=0.4: u > rule2 -> scale * identity only
    out = fuse_outputs(text, ident, train=True, fusion_u=u, rule1=0.1, rule2=0.4)
    assert float(out[0, 0, 0, 0]) == 6.0
