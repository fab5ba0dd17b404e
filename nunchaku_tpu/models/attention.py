"""Attention and feed-forward modules over the quantized kernels.

Counterparts of nunchaku/models/attention.py (NunchakuBaseAttention :14,
NunchakuFeedForward :76), the FLUX attention processors
(nunchaku/models/attention_processors/flux.py), and ops/fused.py
(fused_gelu_mlp :14, fused_qkv_norm_rottary :80). QKV is one fused
SVDQW4A4Linear (fuse_linears pattern, transformer_flux_v2.py:63-80); Q/K
RMSNorm + RoPE run as XLA fused elementwise between the GEMM and the
flash-attention kernel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

import numpy as np

from ..core.module import Module
from ..ops.attention import (
    LOG2E,
    block_sparse_attention,
    flash_attention,
    flash_attention_bshd,
    flash_attention_i8,
    qkv_prepare,
    qkv_rope_producer,
    quantize_qk,
)
from ..ops.gemm import _w4a8_use_xla, svdq_gemm_w8a8_gelu_quant
from ..ops.reference import GELU_SHIFT, rmsnorm
from .embeddings import apply_rope
from .linear import DualStreamLinear, SVDQW4A4Linear


def qkv_norm_rope(
    qkv: jnp.ndarray,
    head_dim: int,
    norm_q: jnp.ndarray | None,
    norm_k: jnp.ndarray | None,
    rot: jnp.ndarray | None,
    eps: float = 1e-6,
    prescale: float = 1.0,
):
    """(B, S, 3HD) fused-qkv output -> per-head q, k, v (B, H, S, D).

    The (B,H,S,D) transpose costs an HBM relayout (~30 ms/step at FLUX
    1024px) but buys fully-contiguous streaming inside the flash kernel —
    measured strictly faster than every transpose-free layout tried
    (per-head 128-lane column blocks: 39 TF/s; multi-head blocks: 62 TF/s;
    transposed: 161 TF/s in-model).
    The head count comes from the array shape: under tensor parallelism
    (heads sharded over the mesh) this sees the local head count.

    ``prescale`` folds softmax-scale * log2(e) into q here (free inside
    this fused elementwise chain) so the flash kernel skips its per-logit
    scale multiply — one full f32 VPU pass over all S^2 logits per head.
    """
    b, s, _ = qkv.shape
    heads = qkv.shape[-1] // 3 // head_dim
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        return t.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    if norm_q is not None:
        q = rmsnorm(q, norm_q, eps).astype(qkv.dtype)
    if norm_k is not None:
        k = rmsnorm(k, norm_k, eps).astype(qkv.dtype)
    if rot is not None:
        q = apply_rope(q, rot, scale=prescale)
        k = apply_rope(k, rot)
    elif prescale != 1.0:
        q = (q.astype(jnp.float32) * prescale).astype(qkv.dtype)
    return q, k, v


def _prep_halfsplit(qkv, cos, sin, norm_q, norm_k, heads, head_dim, q_scale):
    """(B, S, 3HD) -> q, k, v (B, H, S, D); rmsnorm + half-split rope +
    softmax-scale*log2(e) folded into q, all as one fused XLA elementwise
    chain over the transposed tensors (no interleaved-pair reshape, so XLA
    fuses the whole chain into the transpose's consumer)."""
    b, s, _ = qkv.shape
    half = head_dim // 2
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        return t.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)

    # sin's first half is negated in the table (rope_table_halfsplit); the
    # cos halves are equal. Slicing operands and concatenating only at the
    # END keeps the whole chain inside one XLA fusion — a mid-chain
    # concat (the rolled tensor) materializes ~56 MB f32 temps per tensor
    # (measured +54 ms/step).
    c1, s1 = cos[..., :half], sin[..., :half]
    c2, s2 = cos[..., half:], sin[..., half:]

    def norm_rope(t, w, scale):
        tf = heads_first(t).astype(jnp.float32)
        ms = jnp.mean(tf * tf, axis=-1, keepdims=True)
        tf = tf * jax.lax.rsqrt(ms + 1e-6) * w.astype(jnp.float32)
        a1, a2 = tf[..., :half], tf[..., half:]
        o1 = (a1 * c1 + a2 * s1) * scale
        o2 = (a2 * c2 + a1 * s2) * scale
        return jnp.concatenate([o1, o2], axis=-1).astype(qkv.dtype)

    return (
        norm_rope(q, norm_q, q_scale),
        norm_rope(k, norm_k, 1.0),
        heads_first(v),
    )


def _halfsplit_head_perm(head_dim: int) -> np.ndarray:
    """Channel perm relocating interleaved rope pairs (2i, 2i+1) to
    half-split pairs (i, i + D/2): new[i] = old[2i], new[i+D/2] = old[2i+1]."""
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def _halfsplit_qkv_perm(heads: int, head_dim: int, n: int) -> np.ndarray:
    """Output-channel perm for a fused [q|k|v] projection: permute each
    head of the q and k sections with the half-split perm, v untouched."""
    hd = heads * head_dim
    per_head = (
        np.arange(heads)[:, None] * head_dim + _halfsplit_head_perm(head_dim)[None]
    ).ravel()
    parts = [per_head, hd + per_head, 2 * hd + np.arange(hd)]
    if n > 3 * hd:  # padded output channels stay in place
        parts.append(np.arange(3 * hd, n))
    return np.concatenate(parts)


def _permute_out_channels(lin, perm: np.ndarray) -> None:
    """In-place output-channel permutation of a (possibly stacked)
    quantized linear; every N-axis tensor moves together."""
    idx = jnp.asarray(perm)
    for name in ("qweight", "wscales", "proj_up", "bias", "rescales"):
        t = getattr(lin, name, None)
        if t is not None:
            setattr(lin, name, jnp.take(t, idx, axis=-1))


def permute_qk_halfsplit(attn: "FluxAttention") -> None:
    """Enable the fused qkv_prepare path on a (stacked) FluxAttention:
    permute q/k output channels of the QKV projections and the q/k RMSNorm
    weights into half-split rope layout (ops/attention.py qkv_prepare).
    Semantics-preserving: q and k are permuted consistently, v and the
    output projection are untouched."""
    heads, head_dim = attn.heads, attn.head_dim
    n = attn.to_qkv.qweight.shape[-1]
    perm = _halfsplit_qkv_perm(heads, head_dim, n)
    hperm = jnp.asarray(_halfsplit_head_perm(head_dim))
    _permute_out_channels(attn.to_qkv, perm)
    attn.norm_q = jnp.take(attn.norm_q, hperm, axis=-1)
    attn.norm_k = jnp.take(attn.norm_k, hperm, axis=-1)
    if attn.add_qkv_proj is not None:
        _permute_out_channels(attn.add_qkv_proj, perm)
        attn.norm_added_q = jnp.take(attn.norm_added_q, hperm, axis=-1)
        attn.norm_added_k = jnp.take(attn.norm_added_k, hperm, axis=-1)
    attn.prep_fused = True


class FluxAttention(Module):
    """Joint text+image attention with fused quantized QKV.

    For dual-stream blocks: separate img (to_qkv/to_out) and txt
    (add_qkv_proj/to_add_out) projections, concatenated [txt; img] for the
    joint attention (reference concat order: encoder first,
    attention_processors/flux.py:75-83).
    For single-stream blocks (pre_only): to_qkv only, no output proj here.
    """

    def __init__(
        self,
        to_qkv: SVDQW4A4Linear,
        norm_q,
        norm_k,
        to_out: SVDQW4A4Linear | None = None,
        add_qkv_proj: SVDQW4A4Linear | None = None,
        norm_added_q=None,
        norm_added_k=None,
        to_add_out: SVDQW4A4Linear | None = None,
        *,
        heads: int,
        head_dim: int,
    ):
        self.to_qkv = to_qkv
        self.norm_q = norm_q
        self.norm_k = norm_k
        self.to_out = to_out
        self.add_qkv_proj = add_qkv_proj
        self.norm_added_q = norm_added_q
        self.norm_added_k = norm_added_k
        self.to_add_out = to_add_out
        self.heads = heads
        self.head_dim = head_dim
        # set by parallel.tp.parallelize(): mesh axis for row-parallel psum
        self.tp_axis = None
        # >0 enables the block-sparse high-res path (static: changes shapes).
        # Set via FluxTransformer2DModel.set_attention_impl; reference
        # Attention::forward(qkv, pool_qkv, sparsityRatio), FluxModel.cpp:130.
        self.sparsity_ratio = 0.0
        # set by permute_qk_halfsplit(): weights are in half-split rope
        # layout and the fused qkv_prepare kernel path is active
        self.prep_fused = False
        # fixed-shift softmax in the dense flash kernel (see ops/attention
        # FIXED_SHIFT): faster and slightly more accurate than the online
        # rescan; set False to force the online-softmax kernel
        self.fixed_softmax = True
        # int8 QK^T flash path (SageAttention-style per-token q/k scales)
        self.attn_int8 = False

    @classmethod
    def random_init(cls, key, dim, heads, head_dim, joint=True, rank=32, precision="int4"):
        ks = jax.random.split(key, 4)
        inner = heads * head_dim
        to_qkv = SVDQW4A4Linear.random_init(ks[0], dim, 3 * inner, rank=rank, precision=precision)
        norm_q = jnp.ones((head_dim,), jnp.bfloat16)
        norm_k = jnp.ones((head_dim,), jnp.bfloat16)
        if joint:
            return cls(
                to_qkv, norm_q, norm_k,
                to_out=SVDQW4A4Linear.random_init(ks[1], inner, dim, rank=rank, precision=precision),
                add_qkv_proj=SVDQW4A4Linear.random_init(ks[2], dim, 3 * inner, rank=rank, precision=precision),
                norm_added_q=jnp.ones((head_dim,), jnp.bfloat16),
                norm_added_k=jnp.ones((head_dim,), jnp.bfloat16),
                to_add_out=SVDQW4A4Linear.random_init(ks[3], inner, dim, rank=rank, precision=precision),
                heads=heads, head_dim=head_dim,
            )
        return cls(to_qkv, norm_q, norm_k, heads=heads, head_dim=head_dim)

    def _psum(self, x):
        if self.tp_axis is not None:
            return jax.lax.psum(x, self.tp_axis)
        return x

    def _forward_fused(self, qkv, hidden, encoder_hidden, rot, heads_local,
                       kv_mask=None, mods_txt=None, lora_img=None,
                       lora_prep=False):
        """Half-split prep (split+transpose+rmsnorm+rope+scale as one fused
        XLA elementwise chain — the interleaved-pair reshape that blocked
        fusion is gone) -> flash with direct (B, S, H*D) output and the
        fixed-shift softmax. Weights must be in half-split rope layout
        (permute_qk_halfsplit). A Pallas prepare kernel (ops/attention.py
        qkv_prepare) was measured 4x SLOWER than this XLA chain on v5e —
        the in-kernel (bs, H, D) -> (H, bs, D) transpose dominates."""
        b, s_img, _ = hidden.shape
        cos, sin = rot
        q_scale = LOG2E / math.sqrt(self.head_dim)
        # the Pallas producer's (1, bm, D) column-slice blocks need
        # D % 128 == 0 on-chip (Mosaic last-dim tiling); smaller heads
        # silently keep the XLA prep chain
        use_producer = (
            getattr(self, "prep_producer", False) and self.head_dim % 128 == 0
        )
        if getattr(self, "prep_producer", False) and not use_producer:
            from ..utils.warn import warn_once

            warn_once(
                "qkv_producer_head_dim",
                f"fused qkv/rope producer requested but head_dim="
                f"{self.head_dim} is not a multiple of 128 (Mosaic last-dim"
                " tiling); falling back to the XLA half-split prep chain"
                " (~28 ms/step slower at FLUX 1024px shapes)",
            )
        if use_producer:
            # head-gridded Pallas producer: writes (B, H, S, D) directly,
            # no XLA transpose/layout copies (ops/attention.py
            # qkv_rope_producer); lora = (lora_act, proj_up) rides the
            # kernel (lora_prep mode)
            def prep(x, c, s, nq, nk, lora=None):
                return qkv_rope_producer(
                    x, c, s, nq, nk, heads=heads_local,
                    head_dim=self.head_dim, q_scale=q_scale,
                    lora_act=None if lora is None else lora[0],
                    proj_up=None if lora is None else lora[1],
                )
        else:
            def prep(x, c, s, nq, nk, lora=None):
                assert lora is None  # lora_prep implies the producer path
                return _prep_halfsplit(
                    x, c, s, nq, nk, heads_local, self.head_dim, q_scale
                )
        if encoder_hidden is None:
            q, k, v = prep(qkv, cos, sin, self.norm_q, self.norm_k,
                           lora=lora_img)
            return flash_attention(
                q, k, v, scale=1.0, out_bshd=True, fixed_softmax=True,
                kv_mask=kv_mask,
            )

        s_txt = encoder_hidden.shape[1]
        lora_txt = None
        if mods_txt is not None:
            # dual block under fused LN+quantize: encoder_hidden is the RAW
            # txt stream — LN+AdaLN-modulate rides the quantize producer
            # exactly like the image stream's projection in __call__
            # (regression: the fused path used to project raw txt, dropping
            # mods[1]; random-init AdaLN mods are tiny and LN(N(0,1)) is
            # near-identity, so only engineered-mods tests catch it)
            if lora_prep:
                qkv_txt, la_t = self.add_qkv_proj.forward_modulated(
                    encoder_hidden, *mods_txt, skip_lora=True
                )
                if la_t is not None:
                    lora_txt = (la_t, self.add_qkv_proj.proj_up)
            else:
                qkv_txt = self.add_qkv_proj.forward_modulated(
                    encoder_hidden, *mods_txt
                )
        else:
            qkv_txt = self.add_qkv_proj(encoder_hidden)
        bm_shared = None
        if use_producer:
            bm_shared = next(
                (c for c in (512, 384, 256, 128)
                 if s_txt % c == 0 and s_img % c == 0),
                None,
            )
        if bm_shared is not None:
            # both streams write one (B, H, S_joint, D) buffer set
            # (input_output_aliases) — no S-axis concat afterwards
            s_joint = s_txt + s_img
            q, k, v = qkv_rope_producer(
                qkv, cos[s_txt:], sin[s_txt:], self.norm_q, self.norm_k,
                heads=heads_local, head_dim=self.head_dim, q_scale=q_scale,
                bm=bm_shared, out_s=s_joint, s_offset=s_txt,
                lora_act=None if lora_img is None else lora_img[0],
                proj_up=None if lora_img is None else lora_img[1],
            )
            q, k, v = qkv_rope_producer(
                qkv_txt, cos[:s_txt], sin[:s_txt],
                self.norm_added_q, self.norm_added_k,
                heads=heads_local, head_dim=self.head_dim, q_scale=q_scale,
                bm=bm_shared, alias_outs=(q, k, v),
                lora_act=None if lora_txt is None else lora_txt[0],
                proj_up=None if lora_txt is None else lora_txt[1],
            )
        else:
            if use_producer:
                from ..utils.warn import warn_once

                warn_once(
                    "qkv_producer_bm",
                    f"fused qkv/rope producer: no shared S-tile divides both"
                    f" s_txt={s_txt} and s_img={s_img}; falling back to the"
                    " XLA half-split prep + S-axis concat",
                )
            q_i, k_i, v_i = prep(
                qkv, cos[s_txt:], sin[s_txt:], self.norm_q, self.norm_k,
                lora=lora_img,
            )
            q_t, k_t, v_t = prep(
                qkv_txt, cos[:s_txt], sin[:s_txt],
                self.norm_added_q, self.norm_added_k, lora=lora_txt,
            )
            q = jnp.concatenate([q_t, q_i], axis=2)
            k = jnp.concatenate([k_t, k_i], axis=2)
            v = jnp.concatenate([v_t, v_i], axis=2)
        o = flash_attention(q, k, v, scale=1.0, out_bshd=True, fixed_softmax=True,
                            kv_mask=kv_mask)
        txt_o, img_o = o[:, :s_txt], o[:, s_txt:]
        return (self._psum(self.to_out(img_o)), self._psum(self.to_add_out(txt_o)))

    def _attend(self, q, k, v, out_bshd: bool = False, prescaled: bool = False,
                kv_mask=None):
        """Dense flash returns (B, S, H*D) when out_bshd (the inverse head
        transpose rides the kernel's out BlockSpec, -17 ms/step at FLUX
        1024px) and uses the fixed-shift softmax (-27 ms/step, and *more*
        accurate than online vs the f64 oracle — ops/attention.py).
        ``prescaled``: softmax-scale * log2(e) was folded into q upstream.
        The block-sparse path keeps (B, H, S, D)."""
        sp = getattr(self, "sp_axis", None)
        if sp is not None:
            # sequence parallelism: S is sharded over mesh axis `sp` inside
            # shard_map; kv shards ride the ICI ring (parallel/sp.py)
            from ..parallel.sp import ring_attention

            o = ring_attention(q, k, v, sp, scale=1.0 if prescaled else None)
            if out_bshd:
                b_, h_, s_, d_ = o.shape
                return o.transpose(0, 2, 1, 3).reshape(b_, s_, h_ * d_)
            return o
        if kv_mask is None and getattr(self, "sparsity_ratio", 0.0) > 0.0:
            return block_sparse_attention(
                q, k, v, sparsity_ratio=self.sparsity_ratio,
                scale=1.0 if prescaled else None, out_bshd=out_bshd,
                fixed_softmax=getattr(self, "fixed_softmax", True),
            )
        if kv_mask is None and prescaled and getattr(self, "attn_int8", False):
            q8, qs, k8, ks = quantize_qk(q, k)
            return flash_attention_i8(q8, qs, k8, ks, v, out_bshd=out_bshd)
        unroll = getattr(self, "attn_kv_unroll", 1)
        return flash_attention(
            q, k, v, scale=1.0 if prescaled else None, out_bshd=out_bshd,
            fixed_softmax=getattr(self, "fixed_softmax", True),
            bkv=768 if unroll == 2 else 1536, kv_unroll=unroll,
            kv_mask=kv_mask,
        )

    def __call__(self, hidden, encoder_hidden=None, rot=None, ip_kv=None,
                 mods=None, qkv=None, kv_mask=None):
        """Dual: returns (img_attn_out, txt_attn_out[, ip_attn_out]).
        Single: raw attn (B,S,HD). ``ip_kv = (k_ip, v_ip)`` each (B, S_ip, HD)
        adds IP-Adapter image cross-attention using the image-stream query
        (reference ip_adapter/utils.py:25-491).
        ``mods = ((scale, shift), (scale_txt, shift_txt) | None)``: the
        inputs are RAW residual streams and AdaLN LN+modulate runs fused
        into the qkv quantize producers (forward_modulated).
        ``qkv``: precomputed image-stream qkv projection (the single-block
        dual producer computes it outside)."""
        b, s_img, _ = hidden.shape
        merged = (
            encoder_hidden is not None
            and getattr(self, "qkv_merged", None) is not None
        )
        if merged and mods is not None:
            raise ValueError("fused LN+quantize is incompatible with qkv_merged")
        fused = (
            getattr(self, "prep_fused", False)
            and getattr(self, "sparsity_ratio", 0.0) == 0.0
            and getattr(self, "sp_axis", None) is None
            and ip_kv is None
            and not merged
            and isinstance(rot, tuple)
        )
        # lora-up rides the rope producer: the qkv GEMM skips its low-rank
        # epilogue (XLA's lora dot+add is a full (M, 3HD) HBM round trip —
        # ~6.5 ms/step at FLUX 1024px) and each producer tile adds its
        # (bm, R) @ (R, D) slice on the MXU instead
        lora_prep = (
            fused
            and mods is not None
            and qkv is None
            and getattr(self, "prep_producer", False)
            and self.head_dim % 128 == 0
            and getattr(self, "lora_in_producer", True)
        )
        lora_img = None
        if merged:
            s_txt = encoder_hidden.shape[1]
            qkv_joint = self.qkv_merged(encoder_hidden, hidden)
            qkv_txt = qkv_joint[:, :s_txt]
            qkv = qkv_joint[:, s_txt:]
        elif qkv is not None:
            pass  # caller-provided projection
        elif mods is not None:
            if lora_prep:
                qkv, la = self.to_qkv.forward_modulated(
                    hidden, *mods[0], skip_lora=True
                )
                if la is not None:  # None = fallback kept lora in the GEMM
                    lora_img = (la, self.to_qkv.proj_up)
            else:
                qkv = self.to_qkv.forward_modulated(hidden, *mods[0])
        else:
            qkv = self.to_qkv(hidden)
        heads_local = qkv.shape[-1] // 3 // self.head_dim
        if fused:
            return self._forward_fused(
                qkv, hidden, encoder_hidden, rot, heads_local, kv_mask=kv_mask,
                mods_txt=None if mods is None else mods[1],
                lora_img=lora_img, lora_prep=lora_prep,
            )
        if isinstance(rot, tuple):
            raise ValueError(
                "half-split rope table with the unfused path: rot must be the "
                "interleaved (S, D/2, 2) table unless prep_fused is active"
            )
        prescale = LOG2E / math.sqrt(self.head_dim)
        if encoder_hidden is None:
            q, k, v = qkv_norm_rope(
                qkv, self.head_dim, self.norm_q, self.norm_k, rot,
                prescale=prescale,
            )
            return self._attend(q, k, v, out_bshd=True, prescaled=True,
                                kv_mask=kv_mask)

        s_txt = encoder_hidden.shape[1]
        if not merged:
            if mods is not None and mods[1] is not None:
                qkv_txt = self.add_qkv_proj.forward_modulated(
                    encoder_hidden, *mods[1]
                )
            else:
                qkv_txt = self.add_qkv_proj(encoder_hidden)
        rot_txt = rot[:s_txt] if rot is not None else None
        rot_img = rot[s_txt:] if rot is not None else None
        q_i, k_i, v_i = qkv_norm_rope(
            qkv, self.head_dim, self.norm_q, self.norm_k, rot_img,
            prescale=prescale,
        )
        q_t, k_t, v_t = qkv_norm_rope(
            qkv_txt, self.head_dim, self.norm_added_q, self.norm_added_k, rot_txt,
            prescale=prescale,
        )
        q = jnp.concatenate([q_t, q_i], axis=2)
        k = jnp.concatenate([k_t, k_i], axis=2)
        v = jnp.concatenate([v_t, v_i], axis=2)
        o = self._attend(q, k, v, out_bshd=True, prescaled=True, kv_mask=kv_mask)
        txt_o, img_o = o[:, :s_txt], o[:, s_txt:]
        if merged:
            out_joint = self.out_merged(txt_o, img_o)
            outs = (out_joint[:, s_txt:], out_joint[:, :s_txt])
        else:
            # to_out / to_add_out are row-parallel under TP: partial sums
            # reduce over the mesh (Megatron pairing, compute stays on ICI)
            outs = (self._psum(self.to_out(img_o)), self._psum(self.to_add_out(txt_o)))
        if ip_kv is not None:
            k_ip, v_ip = ip_kv
            hd = self.head_dim
            kip = k_ip.reshape(b, -1, heads_local, hd).transpose(0, 2, 1, 3)
            vip = v_ip.reshape(b, -1, heads_local, hd).transpose(0, 2, 1, 3)
            # q_i already carries softmax-scale * log2(e) (prescale above)
            ip = flash_attention(q_i.astype(jnp.bfloat16), kip.astype(jnp.bfloat16),
                                 vip.astype(jnp.bfloat16), scale=1.0)
            ip = ip.transpose(0, 2, 1, 3).reshape(b, s_img, -1)
            outs = outs + (ip,)
        return outs


class FeedForward(Module):
    """fc1 -> GELU(tanh) -> fc2, with the GELU+shift requantize chain.

    The int4 path quantizes the (non-negative) shifted GELU output with
    unsigned 4-bit for the second GEMM (reference fused_gelu_mlp,
    ops/fused.py:14-83; +0.171875 shift gemm_w4a4_launch_impl.cuh:286).
    """

    def __init__(self, fc1: SVDQW4A4Linear, fc2: SVDQW4A4Linear):
        self.fc1 = fc1
        self.fc2 = fc2
        self.tp_axis = None  # set by parallel.tp.parallelize()

    @classmethod
    def random_init(cls, key, dim, mult=4, rank=32, precision="int4"):
        k1, k2 = jax.random.split(key)
        hidden = dim * mult
        return cls(
            SVDQW4A4Linear.random_init(k1, dim, hidden, rank=rank, precision=precision),
            SVDQW4A4Linear.random_init(
                k2, hidden, dim, rank=rank, precision=precision,
                act_unsigned=(precision == "int4"),
            ),
        )

    def __call__(self, x, mod=None, stacked=None, residual=None):
        if self.tp_axis is not None:  # fc2 is row-parallel under TP:
            # psum the partial BEFORE the gated residual add
            out = gelu_mlp(self.fc1, self.fc2, x, mod=mod, stacked=stacked)
            out = jax.lax.psum(out, self.tp_axis)
            if residual is not None:
                from ..ops.gemm import _res_apply_xla

                parts = tuple(residual) + (None,) * (5 - len(residual))
                out = _res_apply_xla(out, *parts)
            return out
        return gelu_mlp(self.fc1, self.fc2, x, mod=mod, stacked=stacked,
                        residual=residual)


def _can_chain(fc1, fc2, m: int) -> bool:
    # in-model A/B (tools/ablate_fused.py chain-on): the Pallas GELU_QUANT
    # chain beats XLA-fc1 + separate gelu/quantize by ~13 ms/step at FLUX
    # 1024px — the bf16 intermediate's HBM round trip dominates the
    # kernel-vs-XLA dot-rate difference. w4a8 rides the same int8 chain
    # with its weights dequantized in-graph (ops/gemm.dequant_w4a8_to_int8).
    from ..ops.gemm import _w4a8_fused

    p1 = getattr(fc1, "precision", None)
    return (
        (p1 == "int8"
         or (p1 == "w4a8" and (_w4a8_fused() or _w4a8_use_xla(m, 0, 0))))
        and getattr(fc2, "precision", None) == p1
        and fc1.logical_out == fc1.out_features
        and fc2.logical_out == fc2.out_features
    )


def gelu_mlp(fc1, fc2, x, mod=None, pre_quant=None, stacked=None,
             residual=None):
    """fc1 -> GELU -> fc2 (reference fused_gelu_mlp, ops/fused.py:14-83).

    ``residual = (x_stream, gate[, extra[, extra_lora_act, extra_proj_up]])``
    (all (B, S, ·)): returns ``x_stream + gate * (mlp_out [+ extra +
    extra_lora])`` — the block's gated residual add, fused into the chain
    consumer's epilogue on the int8 route (ops/gemm.svdq_gemm_w4a4
    residual operands) and applied as XLA ops elsewhere.

    int8 mode runs the fused GELU_QUANT chain: fc1's GEMM epilogue emits
    fc2's quantized activations + per-(token, tile) scales + lora_act, so
    the bf16 intermediate never touches HBM and no standalone quantize runs
    (reference src/Linear.cpp:270-438). Works under TP unchanged: fc1 is
    column-parallel, fc2 row-parallel — local shards line up and the psum
    happens in the caller. Other precisions use the unfused path.

    ``stacked = (fc1_qw_LKN, fc2_qw_LKN, layer_idx)``: inside a scan over
    layers, pass the STACKED qweights + index so the Pallas chain kernels
    read the layer's tiles via scalar prefetch — XLA cannot fuse a
    dynamic-slice into a custom-call operand and otherwise copies both
    37.7 MB weights every block (~10 ms/step at FLUX 1024px).
    """
    lead = x.shape[:-1]
    m = math.prod(lead)
    # B>1: batched (B, S, ·) operands end to end — flattening next to the
    # Pallas chain custom calls forces XLA layout copies at B>1
    # (tools/bench_batch.py); the ops vmap the 2D kernels internally
    from .linear import _batched_b1

    bat = x.ndim == 3 and (x.shape[0] > 1 or _batched_b1())

    def _res_parts():
        parts = list(residual) + [None] * (5 - len(residual))
        return parts

    def _res_final(out3d):
        # fallback: apply the gated residual on the (B, S, N) output
        from ..ops.gemm import _res_apply_xla

        return _res_apply_xla(out3d, *_res_parts())

    def _res_for_gemm(qact):
        """(B, S, ·) residual arrays -> the GEMM call's operand form (2D
        flattened when the chain runs flat); None if the padded row count
        diverged (caller applies the residual after slicing instead)."""
        if residual is None:
            return None
        xr, gate, ex, ela, epu = _res_parts()
        if bat:
            if qact.ndim != 3 or xr.shape[1] != qact.shape[1]:
                return None
            return (xr, gate, ex, ela, epu)
        mm = qact.shape[0]
        if qact.ndim != 2 or xr.shape[0] * xr.shape[1] != mm:
            return None

        def f(a):
            return None if a is None else a.reshape(mm, a.shape[-1])

        return (f(xr), gate.reshape(1, -1), f(ex), f(ela), epu)

    if _can_chain(fc1, fc2, m):
        s_in = x.shape[1] if bat else None
        if pre_quant is not None:
            qact, asc, la = pre_quant
            bat = qact.ndim == 3
            s_in = qact.shape[1] if bat else None
        elif mod is not None:
            # fused LN+modulate+quantize producer: x is the RAW stream
            from ..ops.quantize import ln_mod_quant_int8

            b, s, k = x.shape
            bm = next(
                (c for c in (512, 384, 256, 128, 64, 32, 16, 8) if s % c == 0),
                256,
            )
            qact, asc, la = ln_mod_quant_int8(
                x.astype(jnp.bfloat16), mod[0], mod[1], fc1.smooth,
                fc1.proj_down, bm=bm, flatten=not bat,
            )
        elif bat:
            qact, asc, la = jax.vmap(fc1.quantize)(x)
        else:
            x2d = x.reshape(m, x.shape[-1])
            qact, asc, la = fc1.quantize(x2d)
        sm = fc2.smooth.astype(jnp.float32)
        rsm = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
        fc1_qw, fc2_qw, idx = (None, None, None) if stacked is None else stacked
        if fc1.precision == "w4a8":
            from ..ops.gemm import _w4a8_fused, svdq_gemm_w4a4

            wcodes = getattr(fc1, "wcodes", "int4")
            if _w4a8_fused() and wcodes != "e2m1":
                # packed chain: both kernels read int4 HBM and rescale each
                # weight stripe once into VMEM plane scratches — the 4-bit
                # fc1->fc2 chain never materializes an int8 (K, N) buffer
                # (reference gemm_w4a4.cuh:832's 4-bit identity)
                qout, qs, la2 = svdq_gemm_w8a8_gelu_quant(
                    qact, asc, fc1.qweight if fc1_qw is None else fc1_qw,
                    fc1.wscales, la, fc1.proj_up, fc1.bias,
                    rsm, fc2.proj_down,
                    act_unsigned_next=bool(fc2.act_unsigned),
                    gelu_shift=GELU_SHIFT, layer_idx=idx,
                    rescales=fc1.rescales, precision="w4a8",
                )
                res_n = _res_for_gemm(qout)
                out = svdq_gemm_w4a4(
                    qout, qs, fc2.qweight if fc2_qw is None else fc2_qw,
                    fc2.wscales, la2, fc2.proj_up, fc2.bias,
                    rescales=fc2.rescales, precision="w4a8", layer_idx=idx,
                    residual=res_n,
                )
                if bat:
                    out = out[:, :s_in] if out.shape[1] != s_in else out
                else:
                    out = out[:m].reshape(*lead, out.shape[-1])
                if residual is not None and res_n is None:
                    out = _res_final(out)
                return out
            # dequant the layer's int4 stacks to int8 once and run the int8
            # chain verbatim. Default route = Pallas dequant-to-HBM
            # (dequant_w4a8_auto, NUNCHAKU_TPU_W4A8_DEQ=pallas): the w4a8
            # ladder settled on chip at 331.2 ms/step vs 457.8 in-kernel
            # fused and 499 XLA-fusion dequant (ops/gemm._w4a8_deq_pallas)
            from ..ops.gemm import dequant_w4a8_auto

            w8_1 = dequant_w4a8_auto(
                fc1.qweight if fc1_qw is None else fc1_qw, fc1.rescales, idx,
                codes=wcodes,
            )
            w8_2 = dequant_w4a8_auto(
                fc2.qweight if fc2_qw is None else fc2_qw, fc2.rescales, idx,
                codes=getattr(fc2, "wcodes", "int4"),
            )
            qout, qs, la2 = svdq_gemm_w8a8_gelu_quant(
                qact, asc, w8_1, fc1.wscales, la, fc1.proj_up, fc1.bias,
                rsm, fc2.proj_down,
                act_unsigned_next=bool(fc2.act_unsigned),
                gelu_shift=GELU_SHIFT,
            )
            res_n = _res_for_gemm(qout)
            out = svdq_gemm_w4a4(
                qout, qs, w8_2, fc2.wscales, la2, fc2.proj_up, fc2.bias,
                precision="int8", residual=res_n,
            )
            if bat:
                out = out[:, :s_in] if out.shape[1] != s_in else out
            else:
                out = out[:m].reshape(*lead, out.shape[-1])
            if residual is not None and res_n is None:
                out = _res_final(out)
            return out
        from ..ops.gemm import _chain_ptoken

        qout, qs, la2 = svdq_gemm_w8a8_gelu_quant(
            qact, asc, fc1.qweight if fc1_qw is None else fc1_qw,
            fc1.wscales, la, fc1.proj_up, fc1.bias,
            rsm, fc2.proj_down, act_unsigned_next=bool(fc2.act_unsigned),
            gelu_shift=GELU_SHIFT, layer_idx=idx, ptoken=_chain_ptoken(),
        )
        res_n = _res_for_gemm(qout)
        out = fc2.forward_quant(qout, qs, la2, qweight=fc2_qw, layer_idx=idx,
                                residual=res_n)
        if bat:
            out = out[:, :s_in] if out.shape[1] != s_in else out
        else:
            out = out[:m].reshape(*lead, out.shape[-1])
        if residual is not None and res_n is None:
            out = _res_final(out)
        return out
    if mod is not None:
        from .normalization import layer_norm

        x = (
            layer_norm(x) * (1.0 + mod[0].astype(jnp.float32))[:, None]
            + mod[1].astype(jnp.float32)[:, None]
        ).astype(jnp.bfloat16)
    h = fc1(x)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True)
    # fc2.act_unsigned adds GELU_SHIFT inside its quantize step; the
    # shifted values are >= 0 (gelu min is about -0.17).
    out = fc2(h.astype(jnp.bfloat16))
    return out if residual is None else _res_final(out)
