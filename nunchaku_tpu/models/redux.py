"""FLUX.1-Redux prior: SigLIP vision tower + Redux image embedder.

The reference exposes Redux through diffusers' ``FluxPriorReduxPipeline``
(examples/flux.1-redux-dev.py:9-24, app/flux.1/redux/run_gradio.py:20-22):
a SigLIP-so400m image encoder's last hidden state (729 patch tokens) runs
through a 2-layer MLP (``redux_up``/``redux_down``) into 729 tokens of the
T5 joint-attention dim (4096), which are concatenated to the text prompt
embeds. This module is the standalone TPU-native equivalent; the output
plugs straight into ``FluxPipeline(..., prompt_embeds=...)``.

SigLIP differs from the CLIP tower (text_encoders/clip.py) in: no class
token, no pre-LN, valid-padding patch conv (384px / patch 14 -> 27x27 = 729
tokens, trailing 6px dropped), tanh-GELU MLP, eps 1e-6. The blocks reuse
``CLIPBlock`` with those switches; the attention-pool head that HF appends
is not needed (Redux consumes ``last_hidden_state``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module
from .linear import Linear
from .text_encoders.clip import CLIPBlock, _layer_norm


class SiglipVisionModel(Module):
    """SigLIP vision tower returning post-LN last_hidden_state."""

    def __init__(self, patch_weight, patch_bias, position_embedding, blocks,
                 post_ln_w, post_ln_b, *, patch: int):
        self.patch_weight = patch_weight  # (3*p*p, d) channel-major
        self.patch_bias = patch_bias  # (d,)
        self.position_embedding = position_embedding  # (N, d)
        self.blocks = blocks
        self.post_ln_w, self.post_ln_b = post_ln_w, post_ln_b
        self.patch = patch

    @classmethod
    def random_init(cls, key, *, image_size=28, patch=14, d=64, heads=2,
                    layers=2):
        ks = iter(jax.random.split(key, 8 * layers + 4))
        mk = lambda i, o: Linear.random_init(next(ks), i, o)
        blocks = [
            CLIPBlock(
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, d), mk(d, d), mk(d, d), mk(d, d),
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, 4 * d), mk(4 * d, d),
                heads=heads, act="gelu_tanh", eps=1e-6,
            )
            for _ in range(layers)
        ]
        n = (image_size // patch) ** 2
        return cls(
            jax.random.normal(next(ks), (3 * patch * patch, d), jnp.bfloat16) * 0.02,
            jnp.zeros((d,), jnp.bfloat16),
            jax.random.normal(next(ks), (n, d), jnp.bfloat16) * 0.02,
            blocks,
            jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
            patch=patch,
        )

    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) SigLIP-normalized -> last_hidden_state (B, N, d)."""
        b, c, hh, ww = pixel_values.shape
        p = self.patch
        gh, gw = hh // p, ww // p  # valid padding: trailing pixels dropped
        if gh == 0 or gw == 0:
            raise ValueError(
                f"image {hh}x{ww} smaller than one {p}x{p} patch — resize "
                "with preprocess_siglip_image first"
            )
        x = pixel_values[:, :, : gh * p, : gw * p]
        x = x.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        x = (x.astype(jnp.bfloat16) @ self.patch_weight) + self.patch_bias
        x = (x + self.position_embedding[: x.shape[1]]).astype(jnp.bfloat16)
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), jnp.float32)
        for blk in self.blocks:
            x = blk(x, mask)
        return _layer_norm(x, self.post_ln_w, self.post_ln_b, eps=1e-6)


class ReduxImageEncoder(Module):
    """diffusers ReduxImageEncoder: redux_down(silu(redux_up(x)))."""

    def __init__(self, redux_up: Linear, redux_down: Linear):
        self.redux_up = redux_up
        self.redux_down = redux_down

    @classmethod
    def random_init(cls, key, *, redux_dim=64, txt_in_features=96):
        k1, k2 = jax.random.split(key)
        return cls(
            Linear.random_init(k1, redux_dim, txt_in_features * 3),
            Linear.random_init(k2, txt_in_features * 3, txt_in_features),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.redux_up(x).astype(jnp.float32)
        h = h * jax.nn.sigmoid(h)  # SiLU
        return self.redux_down(h.astype(jnp.bfloat16)).astype(jnp.bfloat16)


class FluxReduxPrior(Module):
    """SigLIP tower + Redux embedder -> image prompt tokens (B, N, 4096).

    Counterpart of ``FluxPriorReduxPipeline``: concatenate the returned
    tokens to the T5 prompt embeds (diffusers appends image tokens AFTER
    the text tokens) and run the normal FLUX denoise loop."""

    def __init__(self, image_encoder: SiglipVisionModel,
                 image_embedder: ReduxImageEncoder):
        self.image_encoder = image_encoder
        self.image_embedder = image_embedder

    @classmethod
    def random_init(cls, key, *, image_size=28, patch=14, d=64, heads=2,
                    layers=2, txt_in_features=96):
        k1, k2 = jax.random.split(key)
        return cls(
            SiglipVisionModel.random_init(
                k1, image_size=image_size, patch=patch, d=d, heads=heads,
                layers=layers),
            ReduxImageEncoder.random_init(
                k2, redux_dim=d, txt_in_features=txt_in_features),
        )

    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        return self.image_embedder(self.image_encoder(pixel_values))

    def prompt_embeds(self, pixel_values: jnp.ndarray,
                      text_embeds: jnp.ndarray) -> jnp.ndarray:
        """[text_embeds ; image tokens] along the sequence axis."""
        img_tokens = self(pixel_values)
        b = max(text_embeds.shape[0], img_tokens.shape[0])
        if img_tokens.shape[0] < b:
            img_tokens = jnp.broadcast_to(
                img_tokens, (b,) + img_tokens.shape[1:])
        if text_embeds.shape[0] < b:
            text_embeds = jnp.broadcast_to(
                text_embeds, (b,) + text_embeds.shape[1:])
        return jnp.concatenate(
            [text_embeds.astype(jnp.bfloat16), img_tokens], axis=1)


# SigLIP preprocessing: plain resize (no crop), mean/std 0.5
SIGLIP_IMAGE_MEAN = 0.5
SIGLIP_IMAGE_STD = 0.5


def preprocess_siglip_image(image: "np.ndarray", size: int = 384) -> jnp.ndarray:
    """uint8/float (H, W, 3) RGB -> (1, 3, size, size) SigLIP-normalized.

    SiglipImageProcessor resizes directly to (size, size) (aspect ratio not
    preserved), then normalizes with mean=std=0.5."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    im = (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    im = (im - SIGLIP_IMAGE_MEAN) / SIGLIP_IMAGE_STD
    return jnp.asarray(im.transpose(2, 0, 1)[None], jnp.bfloat16)


def load_siglip_vision(path_or_tensors, *, heads=16, layers=27,
                       patch=14) -> SiglipVisionModel:
    """Load from an HF SiglipVisionModel state dict (vision_model.* keys,
    google/siglip-so400m-patch14-384 shapes by default)."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ..utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)
    sd = {k.removeprefix("vision_model."): v for k, v in sd.items()}

    def lin(prefix):
        w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float32).T
        b = np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)
        return Linear(jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))

    def vec(name):
        return jnp.asarray(np.asarray(sd[name]).astype(np.float32), jnp.bfloat16)

    blocks = []
    for i in range(layers):
        p = f"encoder.layers.{i}"
        blocks.append(
            CLIPBlock(
                vec(f"{p}.layer_norm1.weight"), vec(f"{p}.layer_norm1.bias"),
                lin(f"{p}.self_attn.q_proj"), lin(f"{p}.self_attn.k_proj"),
                lin(f"{p}.self_attn.v_proj"), lin(f"{p}.self_attn.out_proj"),
                vec(f"{p}.layer_norm2.weight"), vec(f"{p}.layer_norm2.bias"),
                lin(f"{p}.mlp.fc1"), lin(f"{p}.mlp.fc2"),
                heads=heads, act="gelu_tanh", eps=1e-6,
            )
        )
    pw = np.asarray(sd["embeddings.patch_embedding.weight"]).astype(np.float32)
    d = pw.shape[0]
    return SiglipVisionModel(
        jnp.asarray(pw.reshape(d, -1).T, jnp.bfloat16),
        vec("embeddings.patch_embedding.bias"),
        vec("embeddings.position_embedding.weight"),
        blocks,
        vec("post_layernorm.weight"), vec("post_layernorm.bias"),
        patch=patch,
    )


def load_redux_embedder(path_or_tensors) -> ReduxImageEncoder:
    """Load FLUX.1-Redux-dev image_embedder weights (redux_up/redux_down)."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ..utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)

    def lin(prefix):
        w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float32).T
        b = np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)
        return Linear(jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))

    return ReduxImageEncoder(lin("redux_up"), lin("redux_down"))


def load_redux_prior(encoder_path, embedder_path, **siglip_kw) -> FluxReduxPrior:
    return FluxReduxPrior(
        load_siglip_vision(encoder_path, **siglip_kw),
        load_redux_embedder(embedder_path),
    )
