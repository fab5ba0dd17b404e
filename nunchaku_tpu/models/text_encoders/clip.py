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
    def __init__(self, ln1_w, ln1_b, q, k, v, o, ln2_w, ln2_b, fc1, fc2, *, heads):
        self.ln1_w, self.ln1_b = ln1_w, ln1_b
        self.q, self.k, self.v, self.o = q, k, v, o
        self.ln2_w, self.ln2_b = ln2_w, ln2_b
        self.fc1, self.fc2 = fc1, fc2
        self.heads = heads

    def __call__(self, x, mask):
        b, s, d = x.shape
        h = self.heads
        hd = d // h
        y = _layer_norm(x, self.ln1_w, self.ln1_b)

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

        y = _layer_norm(x, self.ln2_w, self.ln2_b)
        hmid = self.fc1(y).astype(jnp.float32)
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
        """(B, S) -> (pooled (B, d), hidden (B, S, d))."""
        b, s = input_ids.shape
        x = jnp.take(self.token_embedding, input_ids, axis=0)
        x = (x + self.position_embedding[:s]).astype(jnp.bfloat16)
        mask = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        for blk in self.blocks:
            x = blk(x, mask)
        x = _layer_norm(x, self.final_ln_w, self.final_ln_b)
        eos_pos = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(b), eos_pos]
        return pooled, x


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
