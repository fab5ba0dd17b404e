"""T5 encoder (FLUX's text_encoder_2) with optional 4-bit W4A16 linears.

Counterpart of the reference's NunchakuT5EncoderModel
(nunchaku/models/text_encoders/t5_encoder.py:28-120: meta-init from
metadata config, swap nn.Linear -> W4Linear where a qweight exists) and its
TinyChat W4 kernel path (text_encoders/linear.py:16-235). Here every linear
is either a plain bf16 Linear or an AWQW4A16Linear running the Pallas
weight-only kernel; the TinyChat checkpoint layout is decoded by
utils/nunchaku_format.unpack_tinychat_w4.

Architecture: standard T5 encoder — pre-RMSNorm, relative position bias on
block 0 shared across layers, gated-GELU FFN, no biases.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Module
from ..linear import AWQW4A16Linear, Linear
from ..normalization import RMSNorm


def t5_relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket (huggingface T5Attention semantics)."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(Module):
    def __init__(self, q, k, v, o, *, heads, d_kv, rel_bias=None):
        self.q, self.k, self.v, self.o = q, k, v, o
        self.heads = heads
        self.d_kv = d_kv
        self.rel_bias = rel_bias  # (num_buckets, heads) embedding or None

    def __call__(self, x, pos_bias):
        b, s, _ = x.shape
        h, d = self.heads, self.d_kv

        def split(t):
            return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

        q = split(self.q(x))
        k = split(self.k(x))
        v = split(self.v(x))
        # T5 does not scale by sqrt(d)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        scores = scores + pos_bias
        attn = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.bfloat16))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return self.o(o)


class T5FF(Module):
    def __init__(self, wi_0, wi_1, wo):
        self.wi_0 = wi_0
        self.wi_1 = wi_1
        self.wo = wo

    def __call__(self, x):
        g = jax.nn.gelu(self.wi_0(x).astype(jnp.float32), approximate=True)
        h = g * self.wi_1(x).astype(jnp.float32)
        return self.wo(h.astype(jnp.bfloat16))


class T5Block(Module):
    def __init__(self, ln1, attn, ln2, ff):
        self.ln1 = ln1
        self.attn = attn
        self.ln2 = ln2
        self.ff = ff

    def __call__(self, x, pos_bias):
        x = x + self.attn(self.ln1(x).astype(jnp.bfloat16), pos_bias).astype(jnp.float32)
        x = x + self.ff(self.ln2(x).astype(jnp.bfloat16)).astype(jnp.float32)
        return x


class T5EncoderModel(Module):
    def __init__(self, embed_tokens, blocks, final_norm, *, heads, d_kv,
                 num_buckets=32, max_distance=128):
        self.embed_tokens = embed_tokens  # (vocab, d)
        self.blocks = blocks
        self.final_norm = final_norm
        self.heads = heads
        self.d_kv = d_kv
        self.num_buckets = num_buckets
        self.max_distance = max_distance

    @classmethod
    def random_init(cls, key, *, vocab=32128, d_model=512, d_ff=1024, d_kv=64,
                    heads=8, layers=2, quantized=False):
        ks = iter(jax.random.split(key, 8 * layers + 4))
        LinCls = AWQW4A16Linear if quantized else Linear
        mk = lambda i, o: LinCls.random_init(next(ks), i, o, bias=False)
        blocks = []
        for li in range(layers):
            attn = T5Attention(
                mk(d_model, heads * d_kv), mk(d_model, heads * d_kv),
                mk(d_model, heads * d_kv), mk(heads * d_kv, d_model),
                heads=heads, d_kv=d_kv,
                rel_bias=(jax.random.normal(next(ks), (32, heads), jnp.float32) * 0.02
                          if li == 0 else None),
            )
            ff = T5FF(mk(d_model, d_ff), mk(d_model, d_ff), mk(d_ff, d_model))
            blocks.append(T5Block(RMSNorm(jnp.ones((d_model,), jnp.bfloat16)), attn,
                                  RMSNorm(jnp.ones((d_model,), jnp.bfloat16)), ff))
        emb = jax.random.normal(next(ks), (vocab, d_model), jnp.bfloat16)
        return cls(emb, blocks, RMSNorm(jnp.ones((d_model,), jnp.bfloat16)),
                   heads=heads, d_kv=d_kv)

    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, S) int32 -> (B, S, d_model) bf16 final hidden states.

        One jitted program: the eager per-op path cost ~2.2 s of
        host/tunnel dispatch for a T5-XXL 512-token encode against
        ~225 ms of device compute (round-5 trace, /tmp/trace_t5) — the
        encoder is dispatch-bound unless the 24 blocks compile into a
        single call."""
        return _t5_encode(self, input_ids)


@jax.jit
def _t5_encode(model: "T5EncoderModel", input_ids: jnp.ndarray) -> jnp.ndarray:
    b, s = input_ids.shape
    x = jnp.take(model.embed_tokens, input_ids, axis=0).astype(jnp.float32)

    pos = jnp.arange(s)
    rel = pos[None, :] - pos[:, None]
    buckets = t5_relative_position_bucket(
        rel, model.num_buckets, model.max_distance
    )
    bias_table = model.blocks[0].attn.rel_bias.astype(jnp.float32)
    pos_bias = jnp.take(bias_table, buckets, axis=0)  # (S, S, H)
    pos_bias = pos_bias.transpose(2, 0, 1)[None]  # (1, H, S, S)

    for blk in model.blocks:
        x = blk(x, pos_bias)
    return model.final_norm(x).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


def load_t5_encoder(path_or_tensors, config: dict | None = None) -> T5EncoderModel:
    """Load a T5 encoder from HF-format tensors; 4-bit where qweight exists.

    Accepts the reference's quantized T5 single-file format (TinyChat W4
    tensors named ``*.qweight/wscales/wzeros``) and plain bf16 HF files.
    """
    import json as _json
    from ...core.packing import pack_int4
    from ...utils import nunchaku_format as NF

    if isinstance(path_or_tensors, dict):
        sd, meta = path_or_tensors, {}
    else:
        from ...utils.safetensors import load_safetensors

        sd, meta = load_safetensors(path_or_tensors)
    if config is None:
        config = _json.loads(meta.get("config", "{}"))

    d_model = config.get("d_model", 4096)
    heads = config.get("num_heads", 64)
    d_kv = config.get("d_kv", 64)
    layers = config.get("num_layers", 24)

    def lin(prefix):
        if f"{prefix}.qweight" in sd:
            qw = np.asarray(sd[f"{prefix}.qweight"])
            ws = np.asarray(sd[f"{prefix}.wscales"]).astype(np.float32)
            wz = np.asarray(sd[f"{prefix}.wzeros"]).astype(np.float32)
            oc = qw.shape[0] * 4
            ic_g = ws.shape[0]
            # TinyChat pads groups; trust scales for group count
            ic = qw.shape[1] * 2 // 1  # int16 (oc/4, ic) holds 4 nibbles each
            ic = qw.shape[1]
            codes = NF.unpack_tinychat_w4(qw, oc, ic)
            group = ic // ic_g if ic_g else 128
            return AWQW4A16Linear(
                pack_int4(jnp.asarray(codes.T), axis=0),
                jnp.asarray(ws, jnp.bfloat16),
                jnp.asarray(-wz, jnp.bfloat16),  # stored negated
                None,
                group_size=group,
            )
        w = np.asarray(sd[f"{prefix}.weight"]).astype(np.float32)
        return Linear(jnp.asarray(w.T, jnp.bfloat16), None)

    blocks = []
    for i in range(layers):
        p = f"encoder.block.{i}"
        attn = T5Attention(
            lin(f"{p}.layer.0.SelfAttention.q"),
            lin(f"{p}.layer.0.SelfAttention.k"),
            lin(f"{p}.layer.0.SelfAttention.v"),
            lin(f"{p}.layer.0.SelfAttention.o"),
            heads=heads, d_kv=d_kv,
            rel_bias=(
                jnp.asarray(
                    np.asarray(
                        sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
                    ).astype(np.float32)
                )
                if i == 0
                else None
            ),
        )
        ff = T5FF(
            lin(f"{p}.layer.1.DenseReluDense.wi_0"),
            lin(f"{p}.layer.1.DenseReluDense.wi_1"),
            lin(f"{p}.layer.1.DenseReluDense.wo"),
        )
        blocks.append(
            T5Block(
                RMSNorm(jnp.asarray(np.asarray(sd[f"{p}.layer.0.layer_norm.weight"]).astype(np.float32), jnp.bfloat16)),
                attn,
                RMSNorm(jnp.asarray(np.asarray(sd[f"{p}.layer.1.layer_norm.weight"]).astype(np.float32), jnp.bfloat16)),
                ff,
            )
        )
    emb = jnp.asarray(np.asarray(sd["shared.weight"]).astype(np.float32), jnp.bfloat16)
    final = RMSNorm(
        jnp.asarray(np.asarray(sd["encoder.final_layer_norm.weight"]).astype(np.float32), jnp.bfloat16)
    )
    return T5EncoderModel(emb, blocks, final, heads=heads, d_kv=d_kv)
