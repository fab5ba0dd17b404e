"""SANA model tests: LiteLA numerics + tiny model forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_sana import (
    SanaConfig,
    SanaTransformer2DModel,
    lite_la,
)

TINY = SanaConfig(
    num_layers=2,
    num_attention_heads=8,  # dim 256
    num_cross_attention_heads=2,
    caption_channels=320,
    expand_ratio=2.0,
)


def test_lite_la_matches_naive():
    rng = np.random.default_rng(0)
    b, s, dim = 1, 64, 256
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * dim)), jnp.bfloat16)
    out = lite_la(qkv, dim)
    # naive per-head relu linear attention
    q, k, v = np.split(np.asarray(qkv, np.float32), 3, axis=-1)
    h, d = dim // 32, 32
    q = np.maximum(q.reshape(b, s, h, d), 0)
    k = np.maximum(k.reshape(b, s, h, d), 0)
    v = v.reshape(b, s, h, d)
    ref = np.zeros_like(v)
    for bi in range(b):
        for hi in range(h):
            vk = k[bi, :, hi].T @ v[bi, :, hi]  # (d, d)
            ks = k[bi, :, hi].sum(0)  # (d,)
            num = q[bi, :, hi] @ vk
            den = q[bi, :, hi] @ ks + 1e-15
            ref[bi, :, hi] = num / den[:, None]
    ref = ref.reshape(b, s, dim)
    err = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err


@pytest.fixture(scope="module")
def model():
    return SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)


def test_forward(model):
    b, side = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, side * side, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 48, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    out = jax.jit(lambda m, *a: m(*a))(model, x, cond, t)
    assert out.shape == (b, side * side, 32)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_forward_with_cond_mask(model):
    b, side = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, side * side, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 48, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    mask = jnp.arange(48)[None, :] < 30
    f = jax.jit(lambda m, *a, **k: m(*a, **k))
    out = f(model, x, cond, t, cond_mask=mask)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    # masking out padded tokens must differ from attending to them
    out_full = f(model, x, cond, t)
    assert not np.allclose(
        np.asarray(out, np.float32), np.asarray(out_full, np.float32), atol=1e-3
    )


def test_odd_dim_padding():
    """SANA-like odd dims (not 128-multiples) work via weight padding."""
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(320, 192)) * 0.05, jnp.bfloat16)
    lin = SVDQW4A4Linear.from_weights(w, rank=16)
    x = jnp.asarray(rng.normal(size=(1, 40, 320)), jnp.bfloat16)
    out = lin(x)
    assert out.shape == (1, 40, 192)
    ref = x.astype(jnp.float32) @ w.astype(jnp.float32)
    err = float(jnp.linalg.norm(out.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
    assert err < 0.2, err


def test_sana_pipeline(model):
    from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline

    pipe = SanaPipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(5), (1, 48, 320), jnp.bfloat16)
    out = pipe(
        prompt_embeds=pe, height=256, width=256,
        num_inference_steps=2, guidance_scale=2.0, seed=0,
    )
    assert out.latents.shape == (1, 32, 8, 8)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())
