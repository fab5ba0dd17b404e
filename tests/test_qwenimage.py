"""Qwen-Image transformer: tiny forward test."""

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu.models.transformers.transformer_qwenimage import (
    QwenImageConfig,
    QwenImageTransformer2DModel,
)


def test_forward():
    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_txt = 1, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.asarray(ii),
    )
    assert out.shape == (B, S_img, cfg.proj_out_channels)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_edit_pipeline_conditioning():
    """Edit tokens ride the sequence with frame-index rope and change the
    velocity; output stays (B, S_img, C) (reference qwen-image-edit.py
    contract via QwenImagePipeline cond_tokens)."""
    from nunchaku_tpu.pipeline.pipeline_qwenimage import QwenImagePipeline

    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    pipe = QwenImagePipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 320), jnp.bfloat16)

    from nunchaku_tpu.pipeline.pipeline_flux import make_img_ids

    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64), jnp.bfloat16)
    cond_ids = make_img_ids(8, 8).at[:, 0].set(1)

    base = pipe(pe, height=128, width=128, num_inference_steps=2, seed=0)
    edited = pipe(pe, height=128, width=128, num_inference_steps=2, seed=0,
                  cond_tokens=cond, cond_ids=cond_ids)
    assert edited.latents.shape == base.latents.shape == (1, 64, 64)
    assert bool(jnp.isfinite(edited.latents.astype(jnp.float32)).all())
    # conditioning must actually reach the model
    diff = float(jnp.abs(
        (edited.latents - base.latents).astype(jnp.float32)
    ).max())
    assert diff > 1e-3, diff


def test_edit_multi_image_ids():
    """prepare_edit assigns frame index i+1 per conditioning image
    (diffusers QwenEmbedRope img_shapes index offset)."""
    from nunchaku_tpu.models.autoencoder import AutoencoderKL
    from nunchaku_tpu.pipeline.pipeline_qwenimage import QwenImagePipeline

    vae = AutoencoderKL.random_init(jax.random.PRNGKey(0))
    pipe = QwenImagePipeline(transformer=None, vae=vae)
    imgs = [
        np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32),
        np.random.default_rng(1).random((1, 16, 16, 3)).astype(np.float32),
    ]
    toks, ids = pipe.prepare_edit(imgs)
    assert toks.shape == (1, 4 + 1, 64)
    assert ids.shape == (5, 3)
    np.testing.assert_array_equal(np.asarray(ids[:4, 0]), 1)
    np.testing.assert_array_equal(np.asarray(ids[4:, 0]), 2)


def test_fused_qkv_prep_equivalence():
    """Qwen fused prologue (half-split perm + qkv_rope_producer) matches
    the interleaved-rope baseline."""
    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    base = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    fused = QwenImageTransformer2DModel.random_init(
        jax.random.PRNGKey(0), cfg
    ).enable_fused_qkv_prep()
    B, S_img, S_txt = 1, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 320), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.asarray(ii),
    )
    f = jax.jit(lambda m, *a: m(*a))
    ref = np.asarray(f(base, *args), np.float32)
    out = np.asarray(f(fused, *args), np.float32)
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 2e-2, err


def test_encoder_hidden_states_mask_matches_unpadded():
    """Padded text tokens + encoder_hidden_states_mask reproduce the
    unpadded forward exactly on the image stream (reference
    transformer_qwenimage.py forward's encoder_hidden_states_mask):
    masked keys are invisible to every query, so the extra rows cannot
    leak into valid positions."""
    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    B, S_img, S_valid, S_pad = 1, 64, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16)
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (B, S_valid + S_pad, 320), jnp.bfloat16
    )
    t = jnp.array([0.5], jnp.float32)
    ii = jnp.zeros((S_img, 3), jnp.int32)
    fwd = jax.jit(lambda m, *a, **k: m(*a, **k))

    ref = fwd(model, x, txt[:, :S_valid], t, ii)
    mask = jnp.arange(S_valid + S_pad)[None, :] < S_valid
    out = fwd(model, x, txt, t, ii, encoder_hidden_states_mask=mask)
    # identical image-stream outputs: rope positions for valid txt tokens
    # are the same (index rope), and masked keys contribute nothing
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=0,
    )
    # and an all-ones mask equals no mask at all
    ones = jnp.ones((B, S_valid + S_pad), bool)
    a = fwd(model, x, txt, t, ii, encoder_hidden_states_mask=ones)
    b2 = fwd(model, x, txt, t, ii)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b2, np.float32))
