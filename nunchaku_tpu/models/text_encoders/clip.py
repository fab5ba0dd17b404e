"""CLIP text encoder (FLUX's pooled-embedding encoder), bf16 JAX.

Standard CLIPTextModel: causal transformer, quick-GELU MLP, pre-LN blocks,
final LN; the pipeline consumes the *pooled* output (EOS-token hidden state
after the final LN), matching diffusers' FluxPipeline usage.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class CLIPBlock(Module):
    def __init__(self, ln1_w, ln1_b, q, k, v, o, ln2_w, ln2_b, fc1, fc2, *, heads,
                 act: str = "quick_gelu", eps: float = 1e-5):
        self.ln1_w, self.ln1_b = ln1_w, ln1_b
        self.q, self.k, self.v, self.o = q, k, v, o
        self.ln2_w, self.ln2_b = ln2_w, ln2_b
        self.fc1, self.fc2 = fc1, fc2
        self.heads = heads
        self.act = act  # "quick_gelu" (CLIP) or "gelu_tanh" (SigLIP)
        self.eps = eps

    def __call__(self, x, mask):
        b, s, d = x.shape
        h = self.heads
        hd = d // h
        y = _layer_norm(x, self.ln1_w, self.ln1_b, self.eps)

        def split(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q = split(self.q(y)) * (hd**-0.5)
        k = split(self.k(y))
        v = split(self.v(y))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.bfloat16))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + self.o(o).astype(x.dtype)

        y = _layer_norm(x, self.ln2_w, self.ln2_b, self.eps)
        hmid = self.fc1(y).astype(jnp.float32)
        if self.act == "gelu_tanh":
            c = 0.7978845608028654  # sqrt(2/pi), torch gelu(approximate="tanh")
            hmid = 0.5 * hmid * (1.0 + jnp.tanh(c * (hmid + 0.044715 * hmid**3)))
        else:
            hmid = hmid * jax.nn.sigmoid(1.702 * hmid)  # quick-GELU
        return x + self.fc2(hmid.astype(jnp.bfloat16)).astype(x.dtype)


class CLIPTextModel(Module):
    def __init__(self, token_embedding, position_embedding, blocks,
                 final_ln_w, final_ln_b, *, eos_token_id=2):
        self.token_embedding = token_embedding  # (vocab, d)
        self.position_embedding = position_embedding  # (max_pos, d)
        self.blocks = blocks
        self.final_ln_w, self.final_ln_b = final_ln_w, final_ln_b
        self.eos_token_id = eos_token_id

    @classmethod
    def random_init(cls, key, *, vocab=1000, d=128, heads=2, layers=2, max_pos=77):
        ks = iter(jax.random.split(key, 8 * layers + 4))
        mk = lambda i, o: Linear.random_init(next(ks), i, o)
        blocks = [
            CLIPBlock(
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, d), mk(d, d), mk(d, d), mk(d, d),
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, 4 * d), mk(4 * d, d), heads=heads,
            )
            for _ in range(layers)
        ]
        return cls(
            jax.random.normal(next(ks), (vocab, d), jnp.bfloat16) * 0.02,
            jax.random.normal(next(ks), (max_pos, d), jnp.bfloat16) * 0.02,
            blocks, jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
        )

    def __call__(self, input_ids: jnp.ndarray):
        """(B, S) -> (pooled (B, d), hidden (B, S, d)).

        One jitted program (like _t5_encode): the eager per-op path is
        tunnel-dispatch-bound, ~10x the device time at encoder shapes."""
        return _clip_encode(self, input_ids)


class CLIPVisionModel(Module):
    """CLIP vision tower with projection (HF CLIPVisionModelWithProjection).

    The IP-Adapter image encoder (reference examples/flux.1-dev-IP-adapter.py
    uses openai/clip-vit-large-patch14 via diffusers' load_ip_adapter). The
    patch embedding is a non-overlapping conv — computed as a reshape +
    matmul so it rides the MXU directly.
    """

    def __init__(self, patch_weight, class_embedding, position_embedding,
                 pre_ln_w, pre_ln_b, blocks, post_ln_w, post_ln_b,
                 visual_projection, *, patch: int):
        self.patch_weight = patch_weight  # (patch*patch*3, d)
        self.class_embedding = class_embedding  # (d,)
        self.position_embedding = position_embedding  # (1+num_patches, d)
        self.pre_ln_w, self.pre_ln_b = pre_ln_w, pre_ln_b
        self.blocks = blocks
        self.post_ln_w, self.post_ln_b = post_ln_w, post_ln_b
        self.visual_projection = visual_projection  # Linear, no bias in HF
        self.patch = patch

    @classmethod
    def random_init(cls, key, *, image_size=32, patch=8, d=128, heads=2,
                    layers=2, proj_dim=64):
        ks = iter(jax.random.split(key, 8 * layers + 8))
        mk = lambda i, o: Linear.random_init(next(ks), i, o)
        blocks = [
            CLIPBlock(
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, d), mk(d, d), mk(d, d), mk(d, d),
                jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
                mk(d, 4 * d), mk(4 * d, d), heads=heads,
            )
            for _ in range(layers)
        ]
        n = (image_size // patch) ** 2
        return cls(
            jax.random.normal(next(ks), (patch * patch * 3, d), jnp.bfloat16) * 0.02,
            jax.random.normal(next(ks), (d,), jnp.bfloat16) * 0.02,
            jax.random.normal(next(ks), (1 + n, d), jnp.bfloat16) * 0.02,
            jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
            blocks,
            jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16),
            Linear(jax.random.normal(next(ks), (d, proj_dim), jnp.bfloat16) * 0.02,
                   jnp.zeros((proj_dim,), jnp.bfloat16)),
            patch=patch,
        )

    def __call__(self, pixel_values: jnp.ndarray):
        """(B, 3, H, W) CLIP-normalized -> (image_embeds (B, proj),
        pooled (B, d), hidden (B, 1+N, d)). One jitted program."""
        return _clip_vision_encode(self, pixel_values)

    def _forward(self, pixel_values: jnp.ndarray):
        b, c, hh, ww = pixel_values.shape
        p = self.patch
        # (B,3,H,W) -> (B, N, p*p*3) patch matrix (channel-major like torch
        # conv weight layout (d, 3, p, p) flattened to (3*p*p, d))
        x = pixel_values.reshape(b, c, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, c * p * p)
        x = (x.astype(jnp.bfloat16) @ self.patch_weight).astype(jnp.bfloat16)
        cls_tok = jnp.broadcast_to(self.class_embedding, (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + self.position_embedding[: x.shape[1]]
        x = _layer_norm(x, self.pre_ln_w, self.pre_ln_b)
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), jnp.float32)
        for blk in self.blocks:
            x = blk(x, mask)
        pooled = _layer_norm(x[:, 0], self.post_ln_w, self.post_ln_b)
        image_embeds = self.visual_projection(pooled)
        return image_embeds, pooled, x


@jax.jit
def _clip_encode(model: "CLIPTextModel", input_ids: jnp.ndarray):
    b, s = input_ids.shape
    x = jnp.take(model.token_embedding, input_ids, axis=0)
    x = (x + model.position_embedding[:s]).astype(jnp.bfloat16)
    mask = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
    for blk in model.blocks:
        x = blk(x, mask)
    x = _layer_norm(x, model.final_ln_w, model.final_ln_b)
    eos_pos = jnp.argmax((input_ids == model.eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(b), eos_pos]
    return pooled, x


@jax.jit
def _clip_vision_encode(model: "CLIPVisionModel", pixel_values: jnp.ndarray):
    return model._forward(pixel_values)


def load_clip_vision(path_or_tensors, *, heads=16, layers=24, patch=14) -> CLIPVisionModel:
    """Load from an HF CLIPVisionModelWithProjection state dict
    (vision_model.* + visual_projection keys)."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ...utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)
    sd = {k.removeprefix("vision_model."): v for k, v in sd.items()}

    def lin(prefix, bias=True):
        w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float32).T
        b = (np.asarray(sd[f"{prefix}.bias"]).astype(np.float32) if bias
             else np.zeros(w.shape[1], np.float32))
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
                heads=heads,
            )
        )
    # torch conv weight (d, 3, p, p) -> (3*p*p, d) matching the channel-major
    # patch matrix built in __call__
    pw = np.asarray(sd["embeddings.patch_embedding.weight"]).astype(np.float32)
    d = pw.shape[0]
    pw = pw.reshape(d, -1).T
    return CLIPVisionModel(
        jnp.asarray(pw, jnp.bfloat16),
        vec("embeddings.class_embedding"),
        vec("embeddings.position_embedding.weight"),
        vec("pre_layrnorm.weight"), vec("pre_layrnorm.bias"),
        blocks,
        vec("post_layernorm.weight"), vec("post_layernorm.bias"),
        lin("visual_projection", bias=False),
        patch=patch,
    )


# CLIP image preprocessing constants (openai/clip-vit-large-patch14)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(image: "np.ndarray", size: int = 224) -> jnp.ndarray:
    """uint8/float (H, W, 3) RGB -> (1, 3, size, size) CLIP-normalized.

    Host-side bilinear resize in numpy (dependency-free stand-in for the
    CLIPImageProcessor resize+center-crop used by diffusers load_ip_adapter).
    """
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    # resize short side to `size`, center-crop
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
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
    top, left = (nh - size) // 2, (nw - size) // 2
    im = im[top : top + size, left : left + size]
    im = (im - np.array(CLIP_IMAGE_MEAN)) / np.array(CLIP_IMAGE_STD)
    return jnp.asarray(im.transpose(2, 0, 1)[None], jnp.bfloat16)


def load_clip_text(path_or_tensors, *, heads=12, layers=12, eos_token_id=2) -> CLIPTextModel:
    """Load from an HF CLIPTextModel state dict (text_model.* keys)."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ...utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)
    sd = {k.removeprefix("text_model."): v for k, v in sd.items()}

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
                heads=heads,
            )
        )
    return CLIPTextModel(
        vec("embeddings.token_embedding.weight"),
        vec("embeddings.position_embedding.weight"),
        blocks,
        vec("final_layer_norm.weight"),
        vec("final_layer_norm.bias"),
        eos_token_id=eos_token_id,
    )
