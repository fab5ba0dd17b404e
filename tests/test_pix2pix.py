"""FluxPix2pixTurboPipeline: one-step sketch-to-image (tiny FLUX, CPU).

Reference semantics: app/flux.1/sketch/flux_pix2pix_pipeline.py —
noisy = z*(1-alpha) + encode(sketch)*alpha; out = noisy - model(noisy, t=1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_flux import (
    FluxConfig,
    FluxTransformer2DModel,
)
from nunchaku_tpu.pipeline.pipeline_flux_pix2pix import (
    FluxPix2pixTurboPipeline,
    preprocess_sketch,
)

TINY = FluxConfig(
    num_layers=1,
    num_single_layers=1,
    num_attention_heads=2,
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


def test_preprocess_sketch_erosion():
    """Thin (1px) strokes vanish under the 4x4 erosion; thick blobs keep
    their interior. Output is a binary {0,1} ink image."""
    img = np.ones((1, 32, 32, 3), np.float32)  # white canvas
    img[0, 10, :, :] = 0.0  # 1-px horizontal stroke
    img[0, 20:28, 4:12, :] = 0.0  # 8x8 blob
    out = np.asarray(preprocess_sketch(jnp.asarray(img)))
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert out[0, 10, 16, 0] == 0.0  # thin stroke eroded away
    assert out[0, 23, 7, 0] == 1.0  # blob interior survives
    assert out[0, 2, 2, 0] == 0.0  # background is not ink


class _FakeVaePipe(FluxPix2pixTurboPipeline):
    """Bypass the VAE: 'encode' deterministic tokens from the image mean so
    the one-step path runs without a full-stride autoencoder."""

    def encode_image_tokens(self, image):
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        s = (h // 16) * (w // 16)
        base = jnp.mean(image) + jnp.arange(s * 64, dtype=jnp.float32).reshape(
            1, s, 64
        ) / (s * 64.0)
        return jnp.broadcast_to(base, (b, s, 64)).astype(jnp.bfloat16)


@pytest.fixture(scope="module")
def pipe():
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)
    return _FakeVaePipe(model)


def _embeds(b=1, s_txt=128):
    return (
        jax.random.normal(jax.random.PRNGKey(10), (b, s_txt, 512), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(11), (b, 256), jnp.bfloat16),
    )


def test_one_step_shapes_and_alpha(pipe):
    pe, pool = _embeds()
    img = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3)), jnp.float32)
    out_hi = pipe(img, prompt_embeds=pe, pooled_prompt_embeds=pool, alpha=1.0)
    assert out_hi.latents.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out_hi.latents, np.float32)).all()
    # alpha=1 anchors fully on the encoded sketch (no noise term): the
    # result must differ from an alpha=0 run (pure noise input)
    out_lo = pipe(img, prompt_embeds=pe, pooled_prompt_embeds=pool, alpha=0.0)
    diff = np.abs(
        np.asarray(out_hi.latents, np.float32) - np.asarray(out_lo.latents, np.float32)
    ).max()
    assert diff > 1e-3


def test_control_module_load_changes_output(pipe):
    pe, pool = _embeds()
    img = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.2
    base = np.asarray(
        pipe(img, prompt_embeds=pe, pooled_prompt_embeds=pool, alpha=0.7).latents,
        np.float32,
    )
    rng = np.random.default_rng(1)
    dim = TINY.dim
    sd = {}
    for leaf, k, n in [("attn.to_q", dim, dim), ("attn.to_k", dim, dim),
                       ("attn.to_v", dim, dim)]:
        sd[f"transformer.transformer_blocks.0.{leaf}.lora_A.weight"] = (
            rng.standard_normal((4, k)).astype(np.float32) * 0.05
        )
        sd[f"transformer.transformer_blocks.0.{leaf}.lora_B.weight"] = (
            rng.standard_normal((n, 4)).astype(np.float32) * 0.05
        )
    pipe.load_control_module(sd, alpha=0.7)
    mod = np.asarray(
        pipe(img, prompt_embeds=pe, pooled_prompt_embeds=pool, alpha=0.7).latents,
        np.float32,
    )
    assert np.abs(mod - base).max() > 1e-4
