"""PuLID ID encoders, bf16 JAX.

Rebuild of nunchaku/models/pulid/encoders_transformer.py:
  * PerceiverAttention (:132-200) — latents attend over concat(ctx, latents),
    the IDFormer's internal mixer;
  * PerceiverAttentionCA (:62-129) — the 20 injection modules: FLUX image
    tokens (dim 3072) cross-attend to the 32 ID tokens (kv_dim 2048);
  * IDFormer (:203-326) — 5 ArcFace-derived ID tokens + 32 learned queries
    refined over 5 EVA-CLIP feature scales (2 layers each), projected to
    (B, 32, 2048).

Both attention classes use the reference's double-sqrt scaling
((q*s)@(k*s)^T with s = dim_head**-0.25) and no biases on q/kv/out.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import Linear


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _attend(q, k, v, heads: int):
    """(B, S, inner) q/kv -> (B, Sq, inner), reference scaling."""
    b, sq, inner = q.shape
    hd = inner // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scale = 1.0 / np.sqrt(np.sqrt(hd))
    w = jnp.einsum(
        "bhqd,bhkd->bhqk", (q * scale).astype(jnp.float32), (k * scale).astype(jnp.float32)
    )
    w = jax.nn.softmax(w, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.bfloat16))
    return o.transpose(0, 2, 1, 3).reshape(b, sq, inner)


class PerceiverAttention(Module):
    """Latents attend over concat(ctx, latents) (encoders_transformer.py:162-200)."""

    def __init__(self, norm1_w, norm1_b, norm2_w, norm2_b,
                 to_q: Linear, to_kv: Linear, to_out: Linear, *, heads: int):
        self.norm1_w, self.norm1_b = norm1_w, norm1_b
        self.norm2_w, self.norm2_b = norm2_w, norm2_b
        self.to_q, self.to_kv, self.to_out = to_q, to_kv, to_out
        self.heads = heads

    def __call__(self, ctx, latents):
        x = _ln(ctx, self.norm1_w, self.norm1_b)
        lat = _ln(latents, self.norm2_w, self.norm2_b)
        q = self.to_q(lat)
        kv = self.to_kv(jnp.concatenate([x, lat], axis=1))
        k, v = jnp.split(kv, 2, axis=-1)
        o = _attend(q, k, v, self.heads)
        return self.to_out(o)


class PerceiverAttentionCA(Module):
    """FLUX tokens cross-attend to ID tokens (encoders_transformer.py:62-129).

    dim=3072 (query stream), kv_dim=2048 (ID tokens), heads=16, dim_head=128.
    """

    def __init__(self, norm1_w, norm1_b, norm2_w, norm2_b,
                 to_q: Linear, to_kv: Linear, to_out: Linear, *, heads: int):
        self.norm1_w, self.norm1_b = norm1_w, norm1_b  # LN(kv_dim) on ID tokens
        self.norm2_w, self.norm2_b = norm2_w, norm2_b  # LN(dim) on image stream
        self.to_q, self.to_kv, self.to_out = to_q, to_kv, to_out
        self.heads = heads

    @classmethod
    def random_init(cls, key, *, dim=3072, dim_head=128, heads=16, kv_dim=2048):
        ks = jax.random.split(key, 3)
        inner = dim_head * heads
        nb = lambda k, i, o: Linear(
            jax.random.normal(k, (i, o), jnp.bfloat16) / np.sqrt(i),
            jnp.zeros((o,), jnp.bfloat16),
        )
        return cls(
            jnp.ones((kv_dim,), jnp.bfloat16), jnp.zeros((kv_dim,), jnp.bfloat16),
            jnp.ones((dim,), jnp.bfloat16), jnp.zeros((dim,), jnp.bfloat16),
            nb(ks[0], dim, inner), nb(ks[1], kv_dim, inner * 2), nb(ks[2], inner, dim),
            heads=heads,
        )

    def __call__(self, id_tokens, hidden):
        """id_tokens (B, 32, kv_dim), hidden (B, S, dim) -> (B, S, dim)."""
        x = _ln(id_tokens, self.norm1_w, self.norm1_b)
        lat = _ln(hidden, self.norm2_w, self.norm2_b)
        q = self.to_q(lat)
        k, v = jnp.split(self.to_kv(x), 2, axis=-1)
        o = _attend(q, k, v, self.heads)
        return self.to_out(o)


class IDFormerFF(Module):
    """LN -> Linear -> GELU -> Linear, no biases (encoders_transformer.py:14-36)."""

    def __init__(self, norm_w, norm_b, fc1: Linear, fc2: Linear):
        self.norm_w, self.norm_b = norm_w, norm_b
        self.fc1, self.fc2 = fc1, fc2

    def __call__(self, x):
        y = _ln(x, self.norm_w, self.norm_b)
        h = jax.nn.gelu(self.fc1(y).astype(jnp.float32), approximate=False)
        return self.fc2(h.astype(jnp.bfloat16))


class _MappingMLP(Module):
    """Linear -> LN -> LeakyReLU -> Linear -> LN -> LeakyReLU -> Linear."""

    def __init__(self, fc1, ln1_w, ln1_b, fc2, ln2_w, ln2_b, fc3):
        self.fc1, self.fc2, self.fc3 = fc1, fc2, fc3
        self.ln1_w, self.ln1_b = ln1_w, ln1_b
        self.ln2_w, self.ln2_b = ln2_w, ln2_b

    def __call__(self, x):
        h = jax.nn.leaky_relu(_ln(self.fc1(x), self.ln1_w, self.ln1_b).astype(jnp.float32), 0.01)
        h = jax.nn.leaky_relu(_ln(self.fc2(h.astype(jnp.bfloat16)), self.ln2_w, self.ln2_b).astype(jnp.float32), 0.01)
        return self.fc3(h.astype(jnp.bfloat16))


class IDFormer(Module):
    """5 ID tokens + 32 queries over 5 ViT scales -> (B, 32, output_dim)."""

    def __init__(self, latents, proj_out, layers, mappings, id_embedding_mapping,
                 *, num_id_token=5, num_queries=32):
        self.latents = latents  # (1, num_queries, dim)
        self.proj_out = proj_out  # (dim, output_dim)
        self.layers = layers  # list of (PerceiverAttention, IDFormerFF)
        self.mappings = mappings  # 5 x _MappingMLP
        self.id_embedding_mapping = id_embedding_mapping  # _MappingMLP -> dim*5
        self.num_id_token = num_id_token
        self.num_queries = num_queries

    def __call__(self, id_cond: jnp.ndarray, vit_hidden: list) -> jnp.ndarray:
        """id_cond (B, 1280) = [ArcFace 512 | EVA CLS 768]; vit_hidden: 5
        tensors (B, 577, 1024) -> (B, 32, 2048)."""
        b = id_cond.shape[0]
        lat = jnp.broadcast_to(self.latents, (b,) + self.latents.shape[1:])
        x = self.id_embedding_mapping(id_cond.astype(jnp.bfloat16))
        x = x.reshape(b, self.num_id_token, -1)
        lat = jnp.concatenate([lat, x], axis=1)

        depth = len(self.layers) // 5
        for i in range(5):
            vit = self.mappings[i](vit_hidden[i].astype(jnp.bfloat16))
            ctx = jnp.concatenate([x, vit], axis=1)
            for attn, ff in self.layers[i * depth : (i + 1) * depth]:
                lat = attn(ctx, lat) + lat
                lat = ff(lat) + lat

        lat = lat[:, : self.num_queries]
        return (lat.astype(jnp.float32) @ self.proj_out.astype(jnp.float32)).astype(
            jnp.bfloat16
        )


def _lin_nobias(sd, key):
    w = np.asarray(sd[f"{key}.weight"]).astype(np.float32).T
    return Linear(jnp.asarray(w, jnp.bfloat16), jnp.zeros((w.shape[1],), jnp.bfloat16))


def _lin(sd, key):
    w = np.asarray(sd[f"{key}.weight"]).astype(np.float32).T
    b = np.asarray(sd[f"{key}.bias"]).astype(np.float32)
    return Linear(jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))


def _vec(sd, key):
    return jnp.asarray(np.asarray(sd[key]).astype(np.float32), jnp.bfloat16)


def _mapping(sd, prefix):
    # nn.Sequential indices: 0 Linear, 1 LN, 2 LeakyReLU, 3 Linear, 4 LN, 5 LeakyReLU, 6 Linear
    return _MappingMLP(
        _lin(sd, f"{prefix}.0"), _vec(sd, f"{prefix}.1.weight"), _vec(sd, f"{prefix}.1.bias"),
        _lin(sd, f"{prefix}.3"), _vec(sd, f"{prefix}.4.weight"), _vec(sd, f"{prefix}.4.bias"),
        _lin(sd, f"{prefix}.6"),
    )


def load_pulid(path_or_tensors, *, heads=16):
    """Load guozinan/PuLID pulid_flux_v0.9.x.safetensors.

    Key schema (pipeline_flux_pulid.py:225-237 splits on the first dot):
    ``pulid_encoder.*`` -> IDFormer, ``pulid_ca.{i}.*`` -> the 20
    PerceiverAttentionCA injection modules.
    Returns (IDFormer, [PerceiverAttentionCA x 20]).
    """
    if isinstance(path_or_tensors, dict):
        sd = path_or_tensors
    else:
        from ...utils.safetensors import load_safetensors

        sd, _ = load_safetensors(path_or_tensors)

    enc = {k.removeprefix("pulid_encoder."): v for k, v in sd.items()
           if k.startswith("pulid_encoder.")}
    n_layers = 1 + max(int(k.split(".")[1]) for k in enc if k.startswith("layers."))
    layers = []
    for i in range(n_layers):
        attn = PerceiverAttention(
            _vec(enc, f"layers.{i}.0.norm1.weight"), _vec(enc, f"layers.{i}.0.norm1.bias"),
            _vec(enc, f"layers.{i}.0.norm2.weight"), _vec(enc, f"layers.{i}.0.norm2.bias"),
            _lin_nobias(enc, f"layers.{i}.0.to_q"),
            _lin_nobias(enc, f"layers.{i}.0.to_kv"),
            _lin_nobias(enc, f"layers.{i}.0.to_out"),
            heads=heads,
        )
        # FF Sequential: 0 LN, 1 Linear, 2 GELU, 3 Linear
        ff = IDFormerFF(
            _vec(enc, f"layers.{i}.1.0.weight"), _vec(enc, f"layers.{i}.1.0.bias"),
            _lin_nobias(enc, f"layers.{i}.1.1"), _lin_nobias(enc, f"layers.{i}.1.3"),
        )
        layers.append((attn, ff))

    lat_np = np.asarray(enc["latents"])
    dim = lat_np.shape[-1]
    id_map_out = np.asarray(enc["id_embedding_mapping.6.weight"]).shape[0]
    encoder = IDFormer(
        _vec(enc, "latents").reshape(1, *lat_np.shape[-2:]),
        jnp.asarray(np.asarray(enc["proj_out"]).astype(np.float32), jnp.bfloat16),
        layers,
        [_mapping(enc, f"mapping_{i}") for i in range(5)],
        _mapping(enc, "id_embedding_mapping"),
        num_id_token=id_map_out // dim,
        num_queries=lat_np.shape[-2],
    )

    ca_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("pulid_ca.")})
    cas = []
    for i in ca_ids:
        p = f"pulid_ca.{i}"
        cas.append(
            PerceiverAttentionCA(
                _vec(sd, f"{p}.norm1.weight"), _vec(sd, f"{p}.norm1.bias"),
                _vec(sd, f"{p}.norm2.weight"), _vec(sd, f"{p}.norm2.bias"),
                _lin_nobias(sd, f"{p}.to_q"), _lin_nobias(sd, f"{p}.to_kv"),
                _lin_nobias(sd, f"{p}.to_out"),
                heads=heads,
            )
        )
    return encoder, cas
