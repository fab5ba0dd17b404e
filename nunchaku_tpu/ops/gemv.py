"""AWQ W4A16 (weight-only 4-bit) linear kernel.

TPU counterpart of the reference's ``gemv_awq`` / ``gemm_awq`` CUDA kernels
(src/kernels/awq/gemv_awq.cu, gemm_awq.cu; dispatched at batch<8 in
nunchaku/models/text_encoders/linear.py:128-142). Used for the AdaLN
modulation linears (src/FluxModel.h:22,44) and the 4-bit T5 encoder.

These layers run at tiny M (per-image, not per-token), so the kernel is
HBM-bandwidth-bound on the packed weight; activations stay bf16. Asymmetric
quantization: ``w = q * wscale - wzero`` with q unsigned 4-bit, G=64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TILE = 8


def _gemv_kernel(x_ref, qw_ref, ws_ref, wz_ref, out_ref, acc_ref, *, group: int):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = qw_ref[...].astype(jnp.int32)
    pk, bn = p.shape
    bk = pk * 2
    p3 = p.reshape(pk // 128, 128, bn)
    lo = p3 & 0xF
    hi = (p3 >> 4) & 0xF
    w_q = jnp.stack([lo, hi], axis=1).reshape(bk, bn).astype(jnp.float32)

    ng = bk // group
    ws = ws_ref[...].astype(jnp.float32)
    wz = wz_ref[...].astype(jnp.float32)
    scale = jnp.broadcast_to(ws[:, None, :], (ng, group, bn)).reshape(bk, bn)
    zero = jnp.broadcast_to(wz[:, None, :], (ng, group, bn)).reshape(bk, bn)
    w = (w_q * scale - zero).astype(jnp.bfloat16)

    acc_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _done():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("group_size", "bn", "bk", "interpret"))
def awq_w4a16_linear(
    x: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    wzeros: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    group_size: int = 64,
    bn: int = 1024,
    bk: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x @ dequant(qweight) + bias`` with 4-bit asymmetric weights.

      x       (M, K) bf16 (M small; padded to 8 internally)
      qweight (K/2, N) int8 — unsigned nibbles, block-split-half along K
      wscales (K/G, N); wzeros (K/G, N) — w = q * s - z
    Returns (M, N) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # tests run interpreted
    m, k = x.shape
    n = qweight.shape[1]

    def _pick(dim, pref):
        for p in (pref, 1024, 512, 256, 128):
            if dim % p == 0:
                return p
        return dim

    bn = _pick(n, bn)
    bk = _pick(k, bk)
    if n % bn or k % bk:
        raise ValueError(f"awq shape ({k},{n}) not divisible by blocks ({bk},{bn})")
    mp = (-m) % M_TILE
    xp = jnp.pad(x, ((0, mp), (0, 0))) if mp else x

    out = pl.pallas_call(
        functools.partial(_gemv_kernel, group=group_size),
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((m + mp, bk), lambda j, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // group_size, bn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // group_size, bn), lambda j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((m + mp, bn), lambda j, kk: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m + mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + mp) * k * n,
            bytes_accessed=k * n // 2 + (m + mp) * (k + n) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, qweight, wscales, wzeros)
    out = out[:m]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out


@functools.partial(jax.jit, static_argnames=("group_size",))
def awq_w4a16_linear_xla(
    x: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    wzeros: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    group_size: int = 64,
) -> jnp.ndarray:
    """Large-M AWQ route: dequant to bf16 once (one XLA fusion) and ride
    the MXU dot.

    The Pallas gemv kernel decodes every weight element on the VPU per
    call — right for the tiny-M modulation linears it was built for
    (reference dispatches gemv_awq at batch < 8,
    nunchaku/models/text_encoders/linear.py:128-142, and gemm_awq above),
    but VPU-decode-bound at ~2 s for a full T5-XXL 512-token encode.
    This route's cost is one bf16 materialization of the weight
    (write + read ≈ 2.4 GiB packed → 9.4 GiB bf16 for T5-XXL, ~25 ms at
    HBM speed) + the MXU dot — the TPU analogue of the reference's
    gemm_awq kernel. Same math as the kernel: f32 ``q*s - z`` rounded
    once to bf16."""
    from ..core.packing import unpack_int4

    q = unpack_int4(qweight, axis=0, unsigned=True).astype(jnp.float32)
    s = jnp.repeat(wscales.astype(jnp.float32), group_size, axis=0)
    z = jnp.repeat(wzeros.astype(jnp.float32), group_size, axis=0)
    w = (q * s - z).astype(jnp.bfloat16)
    out = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out


# reference dispatch boundary: gemv at batch < 8 (linear.py:128-142). On
# TPU the gemv kernel's VPU decode cost is M-independent, so the XLA
# dequant+dot route wins from a low threshold; 16 keeps the per-step
# modulation linears (M = B <= 8 after row padding) on the kernel, which
# measured ~7 ms/step in-model, and sends encoder-shaped calls (M = S)
# to the MXU route (T5-XXL 512-token encode: 2.07 s -> measured A/B below).
AWQ_XLA_MIN_M = 16
