"""Normalization layers: AdaLN-Zero with 4-bit modulation linears.

Counterparts of nunchaku/models/normalization.py (NunchakuAdaLayerNormZero
:13, NunchakuAdaLayerNormZeroSingle :101) and the diffusers
AdaLayerNormContinuous used by the FLUX output head. The modulation linear
is AWQ W4A16 like the reference (src/FluxModel.h:22,44); the +1 scale shift
stays explicit here (the reference folds it into quantized weights for v2
checkpoints — our checkpoint converter un-folds or keeps it per metadata).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jax.numpy as _jnp

from ..core.module import Module
from ..ops.reference import rmsnorm
from .linear import AWQW4A16Linear, Linear, SVDQW4A4Linear


def _mod_linear(key, dim, out_dim, precision: str):
    """Modulation linear factory: AWQ W4A16 for the 4-bit parity path
    (reference src/FluxModel.h:22,44); in int8 turbo mode an int8-MXU
    SVDQ linear with a zero low-rank branch — the AWQ gemv is VPU-bound
    at tiny M while the int8 dot is pure bandwidth (~50x faster here)."""
    if precision in ("int8", "w4a8", "nvfp4-a8"):
        lin = SVDQW4A4Linear.random_init(
            key, dim, out_dim, rank=16, precision="int8"
        )
        lin.proj_down = _jnp.zeros_like(lin.proj_down)
        lin.proj_up = _jnp.zeros_like(lin.proj_up)
        return lin
    return AWQW4A16Linear.random_init(key, dim, out_dim)


def can_batch_mod(lin) -> bool:
    """True if ``batched_adaln_mod`` supports this stacked modulation
    linear (bf16 Linear or int8-SVDQ layouts; AWQ falls back in-scan)."""
    if isinstance(lin, Linear):
        return getattr(lin, "weight", None) is not None and lin.weight.ndim == 3
    return (
        getattr(lin, "precision", None) == "int8"
        and getattr(lin, "qweight", None) is not None
        and lin.qweight.ndim == 3
    )


def batched_adaln_mod(lin, temb: jnp.ndarray) -> jnp.ndarray:
    """Every layer's AdaLN modulation vector in ONE batched GEMM.

    ``lin`` is a *stacked* modulation linear (leading layer axis L on each
    leaf); temb (B, K) -> (L, B, N). temb is layer-invariant in FLUX-style
    DiTs, so hoisting this out of the layer scan replaces 95 per-layer
    M=1 GEMMs (padded to 256 rows, running on the MXU's pathological
    small-M path — ~100 ms/step measured) with one weights-bandwidth-bound
    einsum (~3 ms). Semantics match SVDQW4A4Linear.__call__ exactly:
    smooth -> per-token int8 absmax quantize -> int8 dot -> rank-1 scales,
    plus the low-rank branch on the raw activation and the bias."""
    x = jax.nn.silu(temb.astype(jnp.float32))  # (B, K)
    if isinstance(lin, Linear):
        out = jnp.einsum(
            "bk,lkn->lbn",
            x.astype(jnp.bfloat16),
            lin.weight.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if lin.bias is not None:
            out = out + lin.bias[:, None, :].astype(jnp.float32)
        return out

    L = lin.qweight.shape[0]
    n = lin.qweight.shape[-1]
    sm = lin.smooth.astype(jnp.float32)  # (L, K)
    rsm = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
    xs = x[None] * rsm[:, None]  # (L, B, K)
    scale = jnp.max(jnp.abs(xs), axis=-1) / 127.0  # (L, B)
    rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
    q = jnp.clip(jnp.round(xs * rcp[..., None]), -127, 127).astype(jnp.int8)
    d = jax.lax.dot_general(
        q, lin.qweight, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (L, B, N)
    out = d.astype(jnp.float32) * scale[..., None] * lin.wscales.reshape(L, 1, n).astype(jnp.float32)
    la = jnp.einsum(
        "bk,lkr->lbr",
        x.astype(jnp.bfloat16),
        lin.proj_down.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "lbr,lrn->lbn",
        la.astype(jnp.bfloat16),
        lin.proj_up.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if lin.bias is not None:
        out = out + lin.bias[:, None, :].astype(jnp.float32)
    return out


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


class RMSNorm(Module):
    def __init__(self, weight: jnp.ndarray | None, eps: float = 1e-6):
        self.weight = weight
        self.eps = eps

    def __call__(self, x):
        return rmsnorm(x, self.weight, self.eps).astype(x.dtype)


class AdaLayerNormZero(Module):
    """LN(x) * (1 + scale) + shift, plus msa/mlp gates from temb.

    Returns (norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp).
    """

    def __init__(self, linear, scale_shift: float = 1.0):
        self.linear = linear  # D -> 6D (AWQ W4A16 or Linear)
        self.scale_shift = scale_shift

    @classmethod
    def random_init(cls, key, dim, quantized=True, precision="int4"):
        lin = (
            _mod_linear(key, dim, 6 * dim, precision)
            if quantized
            else Linear.random_init(key, dim, 6 * dim)
        )
        return cls(lin)

    def __call__(self, x, temb, mod=None):
        """``mod`` short-circuits the modulation linear with a precomputed
        (B, 6D) vector — the FLUX scan computes every layer's modulation in
        ONE batched GEMM before the loop (batched_adaln_mod below): temb is
        layer-invariant, and a per-layer M=1 quantized GEMM padded to 256
        rows costs ~100 ms/step on the small-M MXU path."""
        if mod is None:
            mod = self.linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod.astype(jnp.float32), 6, axis=-1
        )
        norm_x = layer_norm(x)
        out = norm_x * (scale_msa[:, None] + self.scale_shift) + shift_msa[:, None]
        return (
            out.astype(x.dtype),
            gate_msa,
            shift_mlp,
            scale_mlp,
            gate_mlp,
        )

    def mod_vectors(self, temb, mod=None):
        """Split the modulation WITHOUT applying the norm (for the fused
        LN+modulate+quantize producer, ops/quantize.ln_mod_quant_int8).
        Returns (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
        gate_mlp), scales pre-adjusted so consumers compute (1 + scale)."""
        if mod is None:
            mod = self.linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        parts = list(jnp.split(mod.astype(jnp.float32), 6, axis=-1))
        if self.scale_shift != 1.0:
            parts[1] = parts[1] + (self.scale_shift - 1.0)
            parts[4] = parts[4] + (self.scale_shift - 1.0)
        return parts


class AdaLayerNormZeroSingle(Module):
    """Single-stream variant: returns (norm_x, gate_msa)."""

    def __init__(self, linear, scale_shift: float = 1.0):
        self.linear = linear  # D -> 3D
        self.scale_shift = scale_shift

    @classmethod
    def random_init(cls, key, dim, quantized=True, precision="int4"):
        lin = (
            _mod_linear(key, dim, 3 * dim, precision)
            if quantized
            else Linear.random_init(key, dim, 3 * dim)
        )
        return cls(lin)

    def __call__(self, x, temb, mod=None):
        if mod is None:
            mod = self.linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        shift_msa, scale_msa, gate_msa = jnp.split(mod.astype(jnp.float32), 3, axis=-1)
        norm_x = layer_norm(x)
        out = norm_x * (scale_msa[:, None] + self.scale_shift) + shift_msa[:, None]
        return out.astype(x.dtype), gate_msa

    def mod_vectors(self, temb, mod=None):
        """(shift_msa, scale_msa, gate_msa) without applying the norm;
        scale pre-adjusted for (1 + scale) consumers."""
        if mod is None:
            mod = self.linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        parts = list(jnp.split(mod.astype(jnp.float32), 3, axis=-1))
        if self.scale_shift != 1.0:
            parts[1] = parts[1] + (self.scale_shift - 1.0)
        return parts


class AdaLayerNormContinuous(Module):
    """Output head norm: LN(x) * (1 + scale) + shift from temb."""

    def __init__(self, linear: Linear):
        self.linear = linear  # D -> 2D

    @classmethod
    def random_init(cls, key, dim):
        return cls(Linear.random_init(key, dim, 2 * dim))

    def __call__(self, x, temb):
        mod = self.linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        scale, shift = jnp.split(mod.astype(jnp.float32), 2, axis=-1)
        out = layer_norm(x) * (1.0 + scale[:, None]) + shift[:, None]
        return out.astype(x.dtype)
