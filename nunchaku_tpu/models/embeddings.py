"""Embeddings: FLUX multi-axis RoPE and timestep/guidance/pooled projections.

Counterpart of nunchaku/models/embeddings.py (rope :11, NunchakuFluxPosEmbed
:53) and the diffusers CombinedTimestepGuidanceTextProjEmbeddings the
reference inherits. No MMA-fragment packing (pack_rotemb :100) is needed on
TPU — rotation is applied as fused VPU elementwise ops in the attention
module.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.module import Module
from .linear import Linear


def rope_table(ids: jnp.ndarray, axes_dim: tuple[int, ...], theta: int = 10000) -> jnp.ndarray:
    """Multi-axis rotary table. ids (S, n_axes) int -> (S, D/2, 2) f32.

    [..., 0] = cos, [..., 1] = sin; pair i rotates channels (2i, 2i+1)
    (diffusers FLUX interleaved convention).
    """
    outs = []
    for i, d in enumerate(axes_dim):
        pos = ids[:, i].astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        freq = jnp.arange(0, d, 2, dtype=jnp.float32) / d
        omega = 1.0 / (theta**freq)  # (d/2,)
        ang = pos[:, None] * omega[None, :]  # (S, d/2)
        outs.append(jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1))
    return jnp.concatenate(outs, axis=1)  # (S, D/2, 2)


def apply_rope(x: jnp.ndarray, rot: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """x (..., S, D), rot (S, D/2, 2) -> rotated x (interleaved pairs).

    ``scale`` multiplies the result inside the fused chain (used to fold
    the softmax scale into q for free)."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    cos, sin = rot[..., 0], rot[..., 1]
    if scale != 1.0:
        cos, sin = cos * scale, sin * scale
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(shape).astype(x.dtype)


def timestep_embedding(
    t: jnp.ndarray, dim: int, *, max_period: int = 10000, flip_sin_to_cos: bool = True
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers convention (t pre-scaled)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class MLPEmbedder(Module):
    """two-layer SiLU MLP: in -> hidden -> hidden."""

    def __init__(self, fc1: Linear, fc2: Linear):
        self.fc1 = fc1
        self.fc2 = fc2

    @classmethod
    def random_init(cls, key, in_dim, hidden):
        k1, k2 = jax.random.split(key)
        return cls(
            Linear.random_init(k1, in_dim, hidden),
            Linear.random_init(k2, hidden, hidden),
        )

    def __call__(self, x):
        return self.fc2(jax.nn.silu(self.fc1(x)))


class CombinedTimestepEmbeddings(Module):
    """timestep (+ optional guidance) (+ pooled text) -> temb (B, D)."""

    def __init__(self, timestep_embedder, text_embedder, guidance_embedder=None):
        self.timestep_embedder = timestep_embedder
        self.text_embedder = text_embedder
        self.guidance_embedder = guidance_embedder

    @classmethod
    def random_init(cls, key, dim, pooled_dim, guidance: bool):
        k1, k2, k3 = jax.random.split(key, 3)
        return cls(
            MLPEmbedder.random_init(k1, 256, dim),
            MLPEmbedder.random_init(k2, pooled_dim, dim),
            MLPEmbedder.random_init(k3, 256, dim) if guidance else None,
        )

    def __call__(self, timestep, pooled_text, guidance=None):
        temb = self.timestep_embedder(timestep_embedding(timestep * 1000.0, 256))
        if self.guidance_embedder is not None and guidance is not None:
            temb = temb + self.guidance_embedder(
                timestep_embedding(guidance * 1000.0, 256)
            )
        if pooled_text is not None:
            temb = temb + self.text_embedder(pooled_text)
        return temb
