"""Tiny-config FLUX transformer graph tests (CPU, interpret-mode kernels)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)

TINY = FluxConfig(
    num_layers=1,
    num_single_layers=2,
    num_attention_heads=2,
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


@pytest.fixture(scope="module")
def model():
    return FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)


def _inputs(B=1, S_img=256, S_txt=128):
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    g = jnp.array([3.5], jnp.float32)
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    return lat, txt, pooled, t, jnp.asarray(ii), jnp.zeros((S_txt, 3), jnp.int32), g


def test_forward_shape_finite(model):
    args = _inputs()
    out = jax.jit(lambda m, *a: m(*a))(model, *args)
    assert out.shape == (1, 256, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_deterministic(model):
    args = _inputs()
    f = jax.jit(lambda m, *a: m(*a))
    o1 = f(model, *args)
    o2 = f(model, *args)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_controlnet_residuals_change_output(model):
    args = _inputs()
    f = jax.jit(lambda m, *a, **kw: m(*a, **kw))
    base = f(model, *args)
    ctrl = jnp.ones((2, 1, 256, TINY.dim), jnp.bfloat16) * 0.1
    out = f(model, *args, controlnet_block_samples=ctrl)
    assert not np.allclose(np.asarray(base, np.float32), np.asarray(out, np.float32))


def test_state_dict_roundtrip(model):
    sd = model.state_dict()
    assert any("transformer_blocks" in k for k in sd)
    # perturb one stacked param and load back
    key = "transformer_blocks.attn.to_qkv.proj_up"
    assert key in sd, sorted(sd)[:10]
    model.load_state_dict({key: sd[key] * 0}, partial=True)
    assert float(jnp.abs(model.transformer_blocks.attn.to_qkv.proj_up).sum()) == 0.0
    model.load_state_dict(sd, partial=False)


def test_blocksparse_attention_impl(model):
    """set_attention_impl('blocksparse') runs and approximates dense at low
    sparsity (reference Attention::forward(qkv, pool_qkv, sparsityRatio))."""
    args = _inputs(S_img=256, S_txt=128)  # 3 kv blocks
    dense = model(*args)
    model.set_attention_impl("blocksparse", sparsity_ratio=0.3)
    try:
        sparse = model(*args)
    finally:
        model.set_attention_impl("flashattn2")
    assert sparse.shape == dense.shape
    assert bool(jnp.all(jnp.isfinite(sparse.astype(jnp.float32))))
    # 0.3 over 3 blocks keeps 2/3 of kv — outputs correlated with dense
    d, s = dense.astype(jnp.float32).ravel(), sparse.astype(jnp.float32).ravel()
    corr = jnp.corrcoef(jnp.stack([d, s]))[0, 1]
    assert corr > 0.7, float(corr)
