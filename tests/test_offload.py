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


def test_offloaded_cached_matches_fb_cache():
    """Cache+offload combo: a miss equals the resident forward; a replayed
    hit equals the jitted fb_cached_forward hit semantics (block-0 output +
    cached residuals)."""
    from nunchaku_tpu.utils.offload import OffloadedCachedFluxForward

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

    off = OffloadedCachedFluxForward(model, residual_diff_threshold=1e9)
    out0 = off(*args)  # step 0: cache empty -> miss -> full forward
    assert off.hits == 0
    np.testing.assert_allclose(
        np.asarray(out0, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )

    out1 = off(*args)  # identical input, huge threshold -> forced hit
    assert off.hits == 1
    # identical inputs => block-0 output and residuals match step 0: the
    # replayed output equals the full forward up to bf16 residual rounding
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )

    off_strict = OffloadedCachedFluxForward(model, residual_diff_threshold=-1.0)
    off_strict(*args)
    off_strict(*args)  # negative threshold -> never similar -> always miss
    assert off_strict.hits == 0


def test_offloaded_cached_qwen_matches_resident():
    """Qwen cache x offload (the reference's flagship offload target with
    its DBCache example on top): a miss equals the resident forward; a
    replayed hit skips streaming the tail blocks and still matches; a
    strict threshold never hits (store-on-miss semantics)."""
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )
    from nunchaku_tpu.utils.offload import OffloadedCachedQwenImageForward

    cfg = QwenImageConfig(
        num_layers=3, num_attention_heads=2, joint_attention_dim=320
    )
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, 16, 320), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.zeros((64, 3), jnp.int32),
    )
    ref = jax.jit(lambda m, *a: m(*a))(model, *args)

    off = OffloadedCachedQwenImageForward(
        model, residual_diff_threshold=1e9, fn_blocks=2
    )
    assert off.fn == 2  # Fn indicator depth respected (and capped at L-1)
    out0 = off(*args)  # step 0: cache empty -> miss -> full forward
    assert off.hits == 0
    np.testing.assert_allclose(
        np.asarray(out0, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )

    out1 = off(*args)  # identical input, huge threshold -> forced hit
    assert off.hits == 1
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )

    off_strict = OffloadedCachedQwenImageForward(
        model, residual_diff_threshold=-1.0
    )
    off_strict(*args)
    off_strict(*args)  # negative threshold -> never similar -> always miss
    assert off_strict.hits == 0 and off_strict.steps == 2
