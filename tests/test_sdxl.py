"""SDXL UNet integration tests (reference unet_sdxl.py:35-526 contract)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.unets.unet_sdxl import (
    Conv2d,
    SDXLConfig,
    SDXLUNet2DConditionModel,
    ShiftedConv2d,
)

# int4 packing needs K % 256 == 0: keep quantized dims at 256/512
TINY = SDXLConfig(
    block_out_channels=(128, 256, 512),
    layers_per_block=1,
    transformer_layers=(0, 1, 2),
    cross_attention_dim=256,
    projection_class_embeddings_input_dim=256 + 6 * 32,
    addition_time_embed_dim=32,
    head_dim=64,
)


def _inputs(b=1, size=32):
    return (
        jax.random.normal(jax.random.PRNGKey(1), (b, 4, size, size), jnp.bfloat16),
        jnp.full((b,), 500.0, jnp.float32),
        jax.random.normal(jax.random.PRNGKey(2), (b, 77, 256), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (b, 256), jnp.bfloat16),
        jnp.ones((b, 6), jnp.float32) * 512,
    )


@pytest.mark.parametrize("precision", ["int4", "int8"])
def test_sdxl_forward(precision):
    cfg = SDXLConfig(**{**TINY.__dict__, "precision": precision})
    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), cfg)
    out = jax.jit(lambda m, *a: m(*a))(model, *_inputs())
    assert out.shape == (1, 4, 32, 32)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_sdxl_unet_shape_walk():
    """Skip-connection channel bookkeeping: every resnet concat lines up
    for the SDXL (3-level, layers=2-style) topology."""
    cfg = SDXLConfig(**{**TINY.__dict__, "layers_per_block": 2})
    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), cfg)
    out = jax.jit(lambda m, *a: m(*a))(model, *_inputs(size=16))
    assert out.shape == (1, 4, 16, 16)


def test_shifted_conv_matches_plain_conv_with_folded_bias():
    """ShiftedConv2d(x) == Conv(x + shift) with shift-valued padding:
    with shift=0 it must equal the plain conv exactly, and with shift!=0 the
    interior output differs from plain conv only through the padding ring."""
    key = jax.random.PRNGKey(0)
    conv = Conv2d.random_init(key, 8, 16, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8), jnp.bfloat16)

    sc0 = ShiftedConv2d(conv, jnp.zeros(()))
    np.testing.assert_allclose(
        np.asarray(sc0(x), np.float32), np.asarray(conv(x), np.float32), atol=1e-2
    )

    shift = jnp.asarray(0.7)
    sc = ShiftedConv2d(conv, shift)
    out = np.asarray(sc(x), np.float32)
    # interior: conv(x + shift) with SAME zero... padded with shift => compare
    # against conv over an explicitly shift-padded input
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0))) + 0.7
    from nunchaku_tpu.models.unets.unet_sdxl import conv2d

    ref = np.asarray(
        conv2d(xf.astype(jnp.bfloat16), conv.weight, conv.bias, padding="VALID"),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_sdxl_geglu_ff_matches_unfused():
    """Quantized GEGLU (fuse_glu glu_act=gelu) == explicit gelu-GLU + linear."""
    from nunchaku_tpu.models.unets.unet_sdxl import SDXLFeedForward

    ff = SDXLFeedForward.random_init(jax.random.PRNGKey(0), 256, mult=2, precision="int8")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 256), jnp.bfloat16)
    out = np.asarray(ff(x), np.float32)
    h = ff.proj(x)
    hidden, gate = jnp.split(h, 2, axis=-1)
    g = (hidden.astype(jnp.float32) * jax.nn.gelu(gate.astype(jnp.float32), approximate=True)).astype(jnp.bfloat16)
    ref = np.asarray(ff.out(g), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 0.02, err


def test_sdxl_pipeline_smoke():
    """TPU-native SDXLPipeline: EulerDiscrete epsilon-prediction denoise to
    finite latents (with and without CFG)."""
    from nunchaku_tpu.pipeline.pipeline_sdxl import SDXLPipeline, sdxl_sigmas

    sigmas, ts = sdxl_sigmas(30)
    assert sigmas.shape == (31,) and sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0) and ts[0] > ts[-1]  # descending

    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), TINY)
    pipe = SDXLPipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(5), (1, 77, 256), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(6), (1, 256), jnp.bfloat16)
    out = pipe(pe, pool, height=256, width=256, num_inference_steps=2)
    assert out.latents.shape == (1, 4, 32, 32)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())
    out2 = pipe(
        pe, pool, negative_prompt_embeds=jnp.zeros_like(pe),
        negative_pooled_prompt_embeds=jnp.zeros_like(pool),
        guidance_scale=5.0, height=256, width=256, num_inference_steps=2,
    )
    assert bool(jnp.isfinite(out2.latents.astype(jnp.float32)).all())
