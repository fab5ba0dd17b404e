"""Offloaded forward equals the resident forward (tiny FLUX, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.utils.offload import OffloadedFluxForward


def test_offloaded_matches_resident():
    cfg = FluxConfig(
        num_layers=2, num_single_layers=2, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, 32, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (1, 256), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.zeros((64, 3), jnp.int32),
        jnp.zeros((32, 3), jnp.int32),
        jnp.array([3.5], jnp.float32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)
    off = OffloadedFluxForward(model)
    out = off(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_offloaded_qwen_matches_resident():
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )
    from nunchaku_tpu.utils.offload import OffloadedQwenImageForward

    cfg = QwenImageConfig(
        num_layers=2, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, 16, 320), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.zeros((64, 3), jnp.int32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)
    out = OffloadedQwenImageForward(model)(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )
