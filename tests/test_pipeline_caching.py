"""Pipeline + caching subsystem tests (tiny FLUX, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.pipeline.pipeline_flux import (
    FluxPipeline,
    make_img_ids,
    pack_latents,
    unpack_latents,
)
from nunchaku_tpu.pipeline.scheduler import flux_sigmas

TINY = FluxConfig(
    num_layers=2,
    num_single_layers=2,
    num_attention_heads=2,
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


@pytest.fixture(scope="module")
def pipe():
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    return FluxPipeline(model)


def _embeds(b=1, s_txt=128):
    return (
        jax.random.normal(jax.random.PRNGKey(10), (b, s_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(11), (b, 256), jnp.bfloat16),
    )


def test_latent_pack_roundtrip():
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 32))
    np.testing.assert_array_equal(
        np.asarray(unpack_latents(pack_latents(lat), 32, 32)), np.asarray(lat)
    )


def test_sigmas_schedule():
    s = flux_sigmas(8, image_seq_len=1024)
    assert s.shape == (9,) and s[0] > s[1] and s[-1] == 0.0
    assert 0.99 <= s[0] <= 1.0


def test_denoise_uncached(pipe):
    pe, pool = _embeds()
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=0,
    )
    assert out.images is None
    assert out.latents.shape == (1, 64, 64)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())


@pytest.mark.parametrize("cache", ["fb", "double_fb", "teacache"])
def test_denoise_cached_runs(pipe, cache):
    pe, pool = _embeds()
    out = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=3, seed=0, cache=cache,
    )
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())


def test_fb_cache_zero_threshold_is_exact(pipe):
    """threshold=0 -> never hits -> identical to the uncached pipeline."""
    pe, pool = _embeds()
    base = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=3,
    )
    fb = pipe(
        prompt_embeds=pe, pooled_prompt_embeds=pool,
        height=128, width=128, num_inference_steps=2, seed=3,
        cache="fb", residual_diff_threshold=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(base.latents, np.float32),
        np.asarray(fb.latents, np.float32),
        atol=1e-3,
    )


def test_fb_cache_huge_threshold_hits(pipe):
    """threshold=inf -> every step after the first reuses the cache."""
    from nunchaku_tpu.caching.fbcache import fb_cached_forward, init_fb_state

    pe, pool = _embeds()
    model = pipe.transformer
    b, s_img, s_txt = 1, 64, 128
    st = init_fb_state(b, s_img, s_txt, TINY.dim)
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, s_img, 64), jnp.bfloat16)
    ids = make_img_ids(8, 8)
    tids = jnp.zeros((s_txt, 3), jnp.int32)
    g = jnp.full((b,), 3.5, jnp.float32)
    f = jax.jit(
        lambda m, s, t: fb_cached_forward(
            m, s, lat, pe, pool, t, ids, tids, g, residual_diff_threshold=1e9
        )
    )
    _, st = f(model, st, jnp.full((b,), 1.0, jnp.float32))
    assert int(st.hits) == 0  # cold cache cannot hit
    _, st = f(model, st, jnp.full((b,), 0.9, jnp.float32))
    assert int(st.hits) == 1
    _, st = f(model, st, jnp.full((b,), 0.8, jnp.float32))
    assert int(st.hits) == 2
