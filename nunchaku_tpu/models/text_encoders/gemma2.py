"""Gemma-2 text encoder (SANA's caption encoder), bf16 JAX.

SANA conditions on google/gemma-2-2b-it last hidden states
(caption_channels 2304; the reference consumes it through diffusers'
SanaPipeline — examples/v1/sana1.6b.py). Decoder-only transformer used as
an encoder: causal mask, GQA (8q/4kv heads, head_dim 256), rope theta
10000, attention logit soft-capping (tanh * 50), four RMSNorms per layer
(input / post-attention / pre-FFN / post-FFN), GeGLU MLP, embeddings
scaled by sqrt(hidden). Gemma RMSNorm uses the (1 + weight) convention.

The 4096-token sliding window of alternating layers never binds at SANA
prompt lengths (<=300 tokens) and is intentionally not modeled.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return out * (1.0 + w.astype(jnp.float32))


def _rope(x, theta=10000.0):
    """(B, H, S, D) half-split rope (HF Gemma2 convention)."""
    b, h, s, d = x.shape
    inv = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    t = np.arange(s, dtype=np.float64)
    f = np.einsum("s,f->sf", t, inv)
    cos = jnp.asarray(np.cos(f), jnp.float32)
    sin = jnp.asarray(np.sin(f), jnp.float32)
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


class Gemma2Layer(Module):
    def __init__(self, in_norm, q, k, v, o, post_attn_norm,
                 pre_ff_norm, gate, up, down, post_ff_norm,
                 *, heads, kv_heads, head_dim, softcap, query_scale):
        self.in_norm = in_norm
        self.q, self.k, self.v, self.o = q, k, v, o
        self.post_attn_norm = post_attn_norm
        self.pre_ff_norm = pre_ff_norm
        self.gate, self.up, self.down = gate, up, down
        self.post_ff_norm = post_ff_norm
        self.heads = heads
        self.kv_heads = kv_heads
        self.head_dim = head_dim
        self.softcap = softcap
        self.query_scale = query_scale

    def __call__(self, x, mask):
        b, s, d = x.shape
        y = _rms(x.astype(jnp.float32), self.in_norm).astype(jnp.bfloat16)

        def split(t, h):
            return t.reshape(b, s, h, self.head_dim).transpose(0, 2, 1, 3)

        q = _rope(split(self.q(y), self.heads))
        k = _rope(split(self.k(y), self.kv_heads))
        v = split(self.v(y), self.kv_heads)
        rep = self.heads // self.kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * self.query_scale
        if self.softcap:
            scores = jnp.tanh(scores / self.softcap) * self.softcap
        scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        oatt = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.bfloat16))
        oatt = oatt.transpose(0, 2, 1, 3).reshape(b, s, -1)
        oatt = self.o(oatt).astype(jnp.float32)
        x = x + _rms(oatt, self.post_attn_norm)

        y = _rms(x, self.pre_ff_norm).astype(jnp.bfloat16)
        h = jax.nn.gelu(self.gate(y).astype(jnp.float32), approximate=True)
        h = (h * self.up(y).astype(jnp.float32)).astype(jnp.bfloat16)
        ff = self.down(h).astype(jnp.float32)
        return x + _rms(ff, self.post_ff_norm)


class Gemma2Encoder(Module):
    def __init__(self, embed, layers, final_norm, *, pad_token_id=0):
        self.embed = embed  # (vocab, d)
        self.layers = layers
        self.final_norm = final_norm
        self.pad_token_id = pad_token_id

    @classmethod
    def random_init(cls, key, *, vocab=256, d=64, heads=4, kv_heads=2,
                    head_dim=16, inter=128, layers=2):
        ks = iter(jax.random.split(key, 8 * layers + 2))
        mk = lambda i, o: Linear(
            jax.random.normal(next(ks), (i, o), jnp.bfloat16) * 0.02,
            jnp.zeros((o,), jnp.bfloat16),
        )
        z = lambda n=d: jnp.zeros((n,), jnp.bfloat16)
        lys = [
            Gemma2Layer(
                z(), mk(d, heads * head_dim), mk(d, kv_heads * head_dim),
                mk(d, kv_heads * head_dim), mk(heads * head_dim, d), z(),
                z(), mk(d, inter), mk(d, inter), mk(inter, d), z(),
                heads=heads, kv_heads=kv_heads, head_dim=head_dim,
                softcap=50.0, query_scale=head_dim**-0.5,
            )
            for _ in range(layers)
        ]
        return cls(jax.random.normal(next(ks), (vocab, d), jnp.bfloat16) * 0.02,
                   lys, z())

    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray | None = None):
        """(B, S) -> last hidden states (B, S, d). One jitted program
        (like t5._t5_encode — the eager loop is tunnel-dispatch-bound)."""
        return _gemma2_encode(self, input_ids, attention_mask)


@jax.jit
def _gemma2_encode(model: "Gemma2Encoder", input_ids, attention_mask):
    b, s = input_ids.shape
    d = model.embed.shape[-1]
    x = jnp.take(model.embed, input_ids, axis=0).astype(jnp.float32)
    x = x * jnp.sqrt(jnp.float32(d))
    causal = jnp.triu(jnp.full((s, s), -1e30, jnp.float32), k=1)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30)
        causal = causal + pad
    for layer in model.layers:
        x = layer(x, causal)
    return _rms(x, model.final_norm).astype(jnp.bfloat16)


def load_gemma2_encoder(path_or_tensors, *, config: dict | None = None) -> Gemma2Encoder:
    """Load from an HF Gemma2Model state dict (model.* or bare keys)."""
    cfg = {
        "num_layers": 26, "heads": 8, "kv_heads": 4, "head_dim": 256,
        "softcap": 50.0, "query_pre_attn_scalar": 256.0,
    }
    if config:
        cfg.update(config)
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ...utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def lin(prefix):
        w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float32).T
        return Linear(jnp.asarray(w, jnp.bfloat16), jnp.zeros((w.shape[1],), jnp.bfloat16))

    def vec(name):
        return jnp.asarray(np.asarray(sd[name]).astype(np.float32), jnp.bfloat16)

    layers = []
    for i in range(cfg["num_layers"]):
        p = f"layers.{i}"
        layers.append(
            Gemma2Layer(
                vec(f"{p}.input_layernorm.weight"),
                lin(f"{p}.self_attn.q_proj"), lin(f"{p}.self_attn.k_proj"),
                lin(f"{p}.self_attn.v_proj"), lin(f"{p}.self_attn.o_proj"),
                vec(f"{p}.post_attention_layernorm.weight"),
                vec(f"{p}.pre_feedforward_layernorm.weight"),
                lin(f"{p}.mlp.gate_proj"), lin(f"{p}.mlp.up_proj"),
                lin(f"{p}.mlp.down_proj"),
                vec(f"{p}.post_feedforward_layernorm.weight"),
                heads=cfg["heads"], kv_heads=cfg["kv_heads"],
                head_dim=cfg["head_dim"], softcap=cfg["softcap"],
                query_scale=cfg["query_pre_attn_scalar"] ** -0.5,
            )
        )
    return Gemma2Encoder(
        vec("embed_tokens.weight"), layers, vec("norm.weight")
    )
