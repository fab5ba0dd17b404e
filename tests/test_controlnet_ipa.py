"""ControlNet model + IP-Adapter conditioning tests (tiny FLUX)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.controlnet_flux import FluxControlNetModel
from nunchaku_tpu.models.ip_adapter.flux import FluxIPAdapter, ipa_forward
from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)

TINY = FluxConfig(
    num_layers=2, num_single_layers=2, num_attention_heads=2,
    joint_attention_dim=512, pooled_projection_dim=256,
)


@pytest.fixture(scope="module")
def model():
    return FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)


def _args(B=1, S_img=256, S_txt=64):
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    return (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (B, 256), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        jnp.asarray(ii),
        jnp.zeros((S_txt, 3), jnp.int32),
        jnp.array([3.5], jnp.float32),
    )


def test_controlnet_produces_and_conditions(model):
    cnet = FluxControlNetModel.random_init(jax.random.PRNGKey(4), TINY, num_layers=2)
    args = _args()
    cond = jax.random.normal(jax.random.PRNGKey(5), (1, 256, 64), jnp.bfloat16)
    samples = jax.jit(lambda c, *a: c(a[0], cond, *a[1:]))(cnet, *args)
    assert samples.shape == (2, 1, 256, TINY.dim)
    assert bool(jnp.isfinite(samples.astype(jnp.float32)).all())
    # zero-init projections -> zero residuals at init (standard ControlNet)
    assert float(jnp.abs(samples).max()) == 0.0

    f = jax.jit(lambda m, *a, **kw: m(*a, **kw))
    base = f(model, *args)
    out = f(model, *args, controlnet_block_samples=samples + 0.1)
    assert not np.allclose(np.asarray(base, np.float32), np.asarray(out, np.float32))


def test_ip_adapter_conditions(model):
    ipa = FluxIPAdapter.random_init(
        jax.random.PRNGKey(6), TINY.num_layers, cross_dim=256, inner=TINY.dim
    )
    args = _args()
    image_embeds = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 256), jnp.bfloat16)
    f = jax.jit(lambda m, a, ie, *ar: ipa_forward(m, a, ie, *ar))
    out = f(model, ipa, image_embeds, *args)
    base = jax.jit(lambda m, *a: m(*a))(model, *args)
    assert out.shape == base.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    assert not np.allclose(np.asarray(base, np.float32), np.asarray(out, np.float32))


def test_ipa_composes_with_double_fb_cache(model):
    """IPA x caching (reference IPA_TransformerBlocks extends the cached
    blocks, ip_adapter/utils.py:25-491): at an impossible threshold (0 —
    every step misses) the cached IPA step must equal uncached ipa_forward
    bit-exactly, and a forced hit must replay conditioning-carrying
    residuals (different from both the base model and a miss step)."""
    from nunchaku_tpu.caching.fbcache import init_fb_state
    from nunchaku_tpu.models.ip_adapter.flux import ipa_fb_cached_forward

    ipa = FluxIPAdapter.random_init(
        jax.random.PRNGKey(6), TINY.num_layers, cross_dim=256, inner=TINY.dim
    )
    args = _args()
    image_embeds = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 256), jnp.bfloat16)
    state = init_fb_state(1, 256, 64, TINY.dim)

    f_cached = jax.jit(
        lambda m, a, ie, st, *ar: ipa_fb_cached_forward(
            m, a, ie, st, *ar,
            residual_diff_threshold=0.0, single_residual_diff_threshold=0.0,
        )
    )
    out0, state = f_cached(model, ipa, image_embeds, state, *args)
    out1, state = f_cached(model, ipa, image_embeds, state, *args)
    ref = jax.jit(lambda m, a, ie, *ar: ipa_forward(m, a, ie, *ar))(
        model, ipa, image_embeds, *args
    )
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref))

    # forced hit replays the cached (conditioning-carrying) residuals
    f_hit = jax.jit(
        lambda m, a, ie, st, *ar: ipa_fb_cached_forward(
            m, a, ie, st, *ar,
            residual_diff_threshold=0.0, single_residual_diff_threshold=0.0,
            force=jnp.ones((), jnp.int32),
        )
    )
    out_hit, state2 = f_hit(model, ipa, image_embeds, state, *args)
    assert int(state2.hits) == int(state.hits) + 1
    base = jax.jit(lambda m, *a: m(*a))(model, *args)
    assert not np.allclose(
        np.asarray(out_hit, np.float32), np.asarray(base, np.float32)
    )


def test_ipa_xlabs_loader_and_projection():
    """Synthesized XLabs flux-ip-adapter checkpoint: key schema of
    reference load_ip_adapter_weights_per_layer (utils.py:417-430) plus the
    diffusers ImageProjection; loaded projections match manual math."""
    import numpy as np

    from nunchaku_tpu.models.ip_adapter.flux import load_flux_ip_adapter

    rng = np.random.default_rng(7)
    L, cross, inner, embed, T = 3, 64, 48, 32, 4
    sd = {}
    for i in range(L):
        base = f"double_blocks.{i}.processor.ip_adapter_double_stream"
        sd[f"{base}_k_proj.weight"] = rng.normal(size=(inner, cross)).astype(np.float32) * 0.05
        sd[f"{base}_k_proj.bias"] = rng.normal(size=(inner,)).astype(np.float32) * 0.05
        sd[f"{base}_v_proj.weight"] = rng.normal(size=(inner, cross)).astype(np.float32) * 0.05
        sd[f"{base}_v_proj.bias"] = rng.normal(size=(inner,)).astype(np.float32) * 0.05
    sd["image_proj.proj.weight"] = rng.normal(size=(T * cross, embed)).astype(np.float32) * 0.05
    sd["image_proj.proj.bias"] = rng.normal(size=(T * cross,)).astype(np.float32) * 0.05
    sd["image_proj.norm.weight"] = np.ones((cross,), np.float32)
    sd["image_proj.norm.bias"] = np.zeros((cross,), np.float32)

    ipa = load_flux_ip_adapter(sd, scale=0.8)
    assert ipa.image_proj.num_tokens == T

    emb = rng.normal(size=(2, embed)).astype(np.float32)
    k_ip, v_ip = ipa.project(jnp.asarray(emb, jnp.bfloat16))
    assert k_ip.shape == (L, 2, T, inner) and v_ip.shape == (L, 2, T, inner)

    # manual reference: proj -> reshape -> layernorm -> k/v linear
    x = emb @ sd["image_proj.proj.weight"].T + sd["image_proj.proj.bias"]
    x = x.reshape(2, T, cross)
    x = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    ref_k = x @ sd["double_blocks.1.processor.ip_adapter_double_stream_k_proj.weight"].T \
        + sd["double_blocks.1.processor.ip_adapter_double_stream_k_proj.bias"]
    got = np.asarray(k_ip[1], np.float32)
    err = np.abs(got - ref_k).max() / (np.abs(ref_k).max() + 1e-9)
    assert err < 0.05, err
