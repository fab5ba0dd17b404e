"""EVA02-CLIP-L-14-336 visual tower, bf16 JAX.

TPU rebuild of the PuLID face-feature backbone (reference
nunchaku/models/pulid/eva_clip/eva_vit_model.py:416-640 with the
EVA02-CLIP-L-14-336 config: width 1024, 24 layers, 16 heads, patch 14,
image 336, SwiGLU MLP ratio 2.6667, sub-LN, 2D rope on non-CLS tokens,
CLS-token pooling + 768-dim head).

PuLID consumes two things (pipeline_flux_pulid.py:334-341):
  * the L2-normalized 768-d projected CLS embedding, and
  * hidden states before blocks 4, 8, 12, 16, 20 (5 scales, (B, 577, 1024))
    — eva_vit_model.py:600-603.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _rotate_half_interleaved(x):
    # eva_clip/rope.py rotate_half: pairs (x1, x2) -> (-x2, x1), interleaved
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def eva_rope_table(grid: int, head_dim: int, pt_seq_len: int = 16) -> tuple:
    """VisionRotaryEmbeddingFast tables (rope.py:35-76): 2D axial rope with
    'lang' freqs over half the head dim per axis, interpolated freq
    positions (intp_freq: t = arange(ft)/ft*pt)."""
    dim = head_dim // 2  # per-axis rotary dim (32 for head_dim 64)
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(grid) / grid * pt_seq_len
    f = np.einsum("i,j->ij", t, freqs)  # (grid, dim/2)
    f = np.repeat(f, 2, axis=-1)  # (grid, dim)
    # broadcat over the two axes -> (grid, grid, 2*dim = head_dim)
    fy = np.broadcast_to(f[:, None, :], (grid, grid, dim))
    fx = np.broadcast_to(f[None, :, :], (grid, grid, dim))
    full = np.concatenate([fy, fx], axis=-1).reshape(grid * grid, head_dim)
    return (
        jnp.asarray(np.cos(full), jnp.float32),
        jnp.asarray(np.sin(full), jnp.float32),
    )


class EVABlock(Module):
    """Pre-norm block: sub-LN attention (separate q/k/v, q+v biases, LN
    before proj) + naive SwiGLU MLP with hidden LN (eva_vit_model.py:269-351)."""

    def __init__(self, norm1_w, norm1_b, q, k, v, inner_ln_w, inner_ln_b, proj,
                 norm2_w, norm2_b, w1, w2, ffn_ln_w, ffn_ln_b, w3, *, heads):
        self.norm1_w, self.norm1_b = norm1_w, norm1_b
        self.q, self.k, self.v = q, k, v
        self.inner_ln_w, self.inner_ln_b = inner_ln_w, inner_ln_b
        self.proj = proj
        self.norm2_w, self.norm2_b = norm2_w, norm2_b
        self.w1, self.w2 = w1, w2
        self.ffn_ln_w, self.ffn_ln_b = ffn_ln_w, ffn_ln_b
        self.w3 = w3
        self.heads = heads

    def __call__(self, x, rope_cos, rope_sin):
        b, s, d = x.shape
        h = self.heads
        hd = d // h
        y = _ln(x, self.norm1_w, self.norm1_b)

        def split(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q = split(self.q(y))
        k = split(self.k(y))
        v = split(self.v(y))

        # rope on non-CLS tokens only (eva_vit_model.py:218-226)
        def rope(t):
            tail = t[:, :, 1:].astype(jnp.float32)
            tail = tail * rope_cos + _rotate_half_interleaved(tail) * rope_sin
            return jnp.concatenate([t[:, :, :1].astype(jnp.float32), tail], axis=2)

        q = rope(q)
        k = rope(k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.bfloat16))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        o = _ln(o, self.inner_ln_w, self.inner_ln_b)
        x = x + self.proj(o).astype(x.dtype)

        y = _ln(x, self.norm2_w, self.norm2_b)
        hmid = jax.nn.silu(self.w1(y).astype(jnp.float32)) * self.w2(y).astype(jnp.float32)
        hmid = _ln(hmid.astype(jnp.bfloat16), self.ffn_ln_w, self.ffn_ln_b)
        return x + self.w3(hmid).astype(x.dtype)


class EVAVisionTower(Module):
    """EVA02 ViT with CLS pooling and CLIP projection head."""

    HIDDEN_TAPS = (4, 8, 12, 16, 20)  # eva_vit_model.py:600-603

    def __init__(self, patch_weight, patch_bias, cls_token, pos_embed, blocks,
                 norm_w, norm_b, head: Linear, *, patch: int, heads: int):
        self.patch_weight = patch_weight  # (3*p*p, d) channel-major
        self.patch_bias = patch_bias
        self.cls_token = cls_token  # (d,)
        self.pos_embed = pos_embed  # (1+N, d)
        self.blocks = blocks
        self.norm_w, self.norm_b = norm_w, norm_b
        self.head = head
        self.patch = patch
        self.heads = heads

    @classmethod
    def random_init(cls, key, *, image_size=28, patch=14, d=64, heads=2,
                    layers=2, proj_dim=32, mlp_ratio=2.6667):
        ks = iter(jax.random.split(key, 16 * layers + 8))
        mk = lambda i, o, bias=True: Linear.random_init(next(ks), i, o)
        hidden = int(d * mlp_ratio)
        ones = lambda: jnp.ones((d,), jnp.bfloat16)
        zeros = lambda: jnp.zeros((d,), jnp.bfloat16)
        blocks = [
            EVABlock(
                ones(), zeros(), mk(d, d), mk(d, d), mk(d, d),
                ones(), zeros(), mk(d, d), ones(), zeros(),
                mk(d, hidden), mk(d, hidden),
                jnp.ones((hidden,), jnp.bfloat16), jnp.zeros((hidden,), jnp.bfloat16),
                mk(hidden, d), heads=heads,
            )
            for _ in range(layers)
        ]
        n = (image_size // patch) ** 2
        return cls(
            jax.random.normal(next(ks), (3 * patch * patch, d), jnp.bfloat16) * 0.02,
            jnp.zeros((d,), jnp.bfloat16),
            jax.random.normal(next(ks), (d,), jnp.bfloat16) * 0.02,
            jax.random.normal(next(ks), (1 + n, d), jnp.bfloat16) * 0.02,
            blocks, ones(), zeros(),
            Linear.random_init(next(ks), d, proj_dim),
            patch=patch, heads=heads,
        )

    def __call__(self, pixel_values: jnp.ndarray):
        """(B, 3, H, W) EVA-normalized -> (id_cond_vit (B, 768) L2-normalized,
        hidden taps [5 x (B, 1+N, width)])."""
        b, c, hh, ww = pixel_values.shape
        p = self.patch
        grid = hh // p
        x = pixel_values.reshape(b, c, grid, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, c * p * p)
        x = (x.astype(jnp.bfloat16) @ self.patch_weight + self.patch_bias).astype(jnp.bfloat16)
        cls_tok = jnp.broadcast_to(self.cls_token, (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + self.pos_embed[: x.shape[1]]

        hd = x.shape[-1] // self.heads
        rope_cos, rope_sin = eva_rope_table(grid, hd)

        taps = []
        for idx, blk in enumerate(self.blocks):
            if 0 < idx <= 20 and idx % 4 == 0:
                taps.append(x)
            x = blk(x, rope_cos, rope_sin)

        pooled = _ln(x, self.norm_w, self.norm_b)[:, 0]
        emb = self.head(pooled).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb.astype(jnp.bfloat16), taps


def load_eva_vision(path_or_tensors, *, heads=16, layers=24, patch=14) -> EVAVisionTower:
    """Load the EVA02-CLIP-L-14-336 visual tower from a torch state dict
    (visual.* keys of QuanSun/EVA-CLIP EVA02_CLIP_L_336_psz14_s6B.pt)."""
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        import torch

        sd = torch.load(path_or_tensors, map_location="cpu", weights_only=True)
        sd = {k: v.float().numpy() for k, v in sd.items()}
    sd = {k.removeprefix("visual."): np.asarray(v) for k, v in sd.items()}

    def lin(prefix, bias=True, bias_key=None):
        w = sd[f"{prefix}.weight"].astype(np.float32).T
        if bias_key is not None:
            b = sd[bias_key].astype(np.float32) if bias_key in sd else np.zeros(w.shape[1], np.float32)
        elif bias and f"{prefix}.bias" in sd:
            b = sd[f"{prefix}.bias"].astype(np.float32)
        else:
            b = np.zeros(w.shape[1], np.float32)
        return Linear(jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))

    def vec(name):
        return jnp.asarray(sd[name].astype(np.float32), jnp.bfloat16)

    blocks = []
    for i in range(layers):
        pfx = f"blocks.{i}"
        blocks.append(
            EVABlock(
                vec(f"{pfx}.norm1.weight"), vec(f"{pfx}.norm1.bias"),
                lin(f"{pfx}.attn.q_proj", bias_key=f"{pfx}.attn.q_bias"),
                lin(f"{pfx}.attn.k_proj", bias=False),
                lin(f"{pfx}.attn.v_proj", bias_key=f"{pfx}.attn.v_bias"),
                vec(f"{pfx}.attn.inner_attn_ln.weight"), vec(f"{pfx}.attn.inner_attn_ln.bias"),
                lin(f"{pfx}.attn.proj"),
                vec(f"{pfx}.norm2.weight"), vec(f"{pfx}.norm2.bias"),
                lin(f"{pfx}.mlp.w1"), lin(f"{pfx}.mlp.w2"),
                vec(f"{pfx}.mlp.ffn_ln.weight"), vec(f"{pfx}.mlp.ffn_ln.bias"),
                lin(f"{pfx}.mlp.w3"),
                heads=heads,
            )
        )
    pw = sd["patch_embed.proj.weight"].astype(np.float32)  # (d, 3, p, p)
    d = pw.shape[0]
    return EVAVisionTower(
        jnp.asarray(pw.reshape(d, -1).T, jnp.bfloat16),
        jnp.asarray(sd["patch_embed.proj.bias"].astype(np.float32), jnp.bfloat16),
        vec("cls_token").reshape(-1),
        vec("pos_embed").reshape(-1, d),
        blocks,
        vec("norm.weight"), vec("norm.bias"),
        lin("head"),
        patch=patch, heads=heads,
    )


# EVA-CLIP (OpenAI) normalization constants (eva_clip/constants.py)
EVA_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
EVA_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
