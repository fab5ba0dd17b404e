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
