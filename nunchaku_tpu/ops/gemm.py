"""Pallas TPU kernel for the SVDQuant W4A4 GEMM.

TPU-native replacement for the reference's CUDA ``gemm_w4a4`` kernel family
(src/kernels/zgemm/gemm_w4a4.cuh:832 gemm_w4a4_block; launch/epilogue
composition gemm_w4a4_launch_impl.cuh:172-385; LoRA fusion lora.cuh).

Design
------
TPUs have no 4-bit MXU datapath, so the win of W4A4 here is **HBM
bandwidth**: weights stay packed int4 in HBM and are expanded to bf16
inside VMEM, then hit the MXU as one large bf16 matmul per tile with f32
accumulation. Numerics match the CUDA integer-MMA path to within bf16
product rounding (tested against ops.reference oracles).

  * grid = (M/bm, N/bn, K/bk), k innermost; f32 accumulator in VMEM scratch.
  * int4 unpack: two arithmetic int32 shifts + a 128-lane-preserving
    reshape (the block-split-half layout in core/packing.py is chosen so
    no cross-lane interleave is needed).
  * per-(token, 64-group) activation scales are expanded to full width
    with a tiny 0/1 expansion matmul on the MXU (Mosaic cannot reshape a
    64-minor dimension); per-(group, channel) weight scales broadcast along
    sublanes for free.
  * the rank-r SVD branch (lora_act @ proj_up) and bias initialise the
    accumulator at k == 0 — the fused analogue of EpilogueLoraUp + bias.
  * nvfp4: same flow; e2m1 codes are decoded arithmetically. The
    per-tensor ``wtscale`` and per-channel ``wcscales`` are folded into
    the bf16 weight scales at load time, so the kernel never sees them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import GROUP_FP4, GROUP_INT4


def _unpack_lanes(p_i8: jnp.ndarray, unsigned: bool) -> jnp.ndarray:
    """Unpack (S, P) int8 nibbles (packed along lanes) -> (S, 2P) int32."""
    s, pdim = p_i8.shape
    nb = pdim // 128
    p = p_i8.astype(jnp.int32).reshape(s, nb, 128)
    if unsigned:
        lo = p & 0xF
        hi = (p >> 4) & 0xF
    else:
        lo = (p << 28) >> 28
        hi = (p << 24) >> 28
    return jnp.stack([lo, hi], axis=2).reshape(s, 2 * pdim)


def _unpack_sublanes(p_i8: jnp.ndarray, unsigned: bool) -> jnp.ndarray:
    """Unpack (P, N) int8 nibbles (packed along sublanes) -> (2P, N) int32."""
    pdim, n = p_i8.shape
    nb = pdim // 128
    p = p_i8.astype(jnp.int32).reshape(nb, 128, n)
    if unsigned:
        lo = p & 0xF
        hi = (p >> 4) & 0xF
    else:
        lo = (p << 28) >> 28
        hi = (p << 24) >> 28
    return jnp.stack([lo, hi], axis=1).reshape(2 * pdim, n)


def _decode_e2m1(q_i32: jnp.ndarray) -> jnp.ndarray:
    """Signed e2m1 code (int32 in [-7, 7]) -> f32 value, arithmetically.

    code c: e = |c| >> 1, m = |c| & 1; value = m*0.5 if e == 0
    else (1 + 0.5 m) * 2^(e-1). Grid: 0, .5, 1, 1.5, 2, 3, 4, 6.
    """
    a = jnp.abs(q_i32)
    e = a >> 1
    m = (a & 1).astype(jnp.float32)
    mag = jnp.where(
        e == 0,
        0.5 * m,
        (1.0 + 0.5 * m) * jnp.exp2((e - 1).astype(jnp.float32)),
    )
    return jnp.where(q_i32 < 0, -mag, mag)


def _values(q_i32: jnp.ndarray, precision: str) -> jnp.ndarray:
    if precision == "int4":
        return q_i32.astype(jnp.float32)
    return _decode_e2m1(q_i32)


def _group_expand_matrix(n_groups: int, width: int, dtype) -> jnp.ndarray:
    """(n_groups, width) 0/1 matrix; E[g, j] = (j // group == g)."""
    g = width // n_groups
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_groups, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_groups, width), 1)
    return (cols // g == rows).astype(dtype)


def _gemm_kernel(
    *refs,
    precision: str,
    act_unsigned: bool,
    group: int,
    has_lora: bool,
    has_bias: bool,
    out_dtype,
):
    qa_ref, as_ref, qw_ref, ws_ref = refs[:4]
    out_ref, acc_ref = refs[-2], refs[-1]
    mid = refs[4:-2]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        (b_ref,) = mid

    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        if has_lora:
            init = jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        else:
            init = jnp.zeros_like(acc_ref)
        if has_bias:
            init = init + b_ref[...].astype(jnp.float32)
        acc_ref[...] = init

    # --- dequantize activations ------------------------------------------
    a_vals = _values(_unpack_lanes(qa_ref[...], act_unsigned), precision)
    bm, bk = a_vals.shape
    # ascales arrive transposed (bk/G, bm); expand to (bm, bk) with a tiny
    # 0/1 matmul (Mosaic cannot reshape a 64-minor dim for broadcast).
    e = _group_expand_matrix(bk // group, bk, jnp.float32)
    a_scale = jax.lax.dot_general(
        as_ref[...].astype(jnp.float32),
        e,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a_deq = (a_vals * a_scale).astype(jnp.bfloat16)

    # --- dequantize weights ----------------------------------------------
    w_vals = _values(_unpack_sublanes(qw_ref[...], False), precision)
    bn = w_vals.shape[1]
    ws = ws_ref[...].astype(jnp.float32)  # (bk // group, bn)
    w_scale = jnp.broadcast_to(ws[:, None, :], (bk // group, group, bn)).reshape(bk, bn)
    w_deq = (w_vals * w_scale).astype(jnp.bfloat16)

    acc_ref[...] += jnp.dot(a_deq, w_deq, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "precision",
        "act_unsigned",
        "out_dtype",
        "bm",
        "bn",
        "bk",
        "interpret",
    ),
)
def svdq_gemm_w4a4(
    qact: jnp.ndarray,
    ascales: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    lora_act: jnp.ndarray | None = None,
    proj_up: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    *,
    precision: str = "int4",
    act_unsigned: bool = False,
    out_dtype=jnp.bfloat16,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Quantized GEMM: ``dequant(qact) @ dequant(qweight) + lora + bias``.

    Arguments (TPU layouts; see core/packing.py for the int4 packing):
      qact     (M, K/2)   int8, block-split-half packed along K
      ascales  (K/G, M)   bf16/f32 per-token-per-group scales (transposed —
                          token-minor, same convention as the reference's
                          ascales [K//G, M], nunchaku/ops/gemm.py:57)
      qweight  (K/2, N)   int8, packed along K
      wscales  (K/G, N)   bf16/f32 (nvfp4: alpha & wcscales pre-folded)
      lora_act (M, R)     f32 — x @ proj_down from the quantize op
      proj_up  (R, N)     bf16
      bias     (N,)
    Returns (M, N) in ``out_dtype``.

    M, N, K must be multiples of the block sizes (the SVDQW4A4Linear layer
    pads M; weight dims are padded at load).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # tests run interpreted
    m, kp = qact.shape
    k = kp * 2
    n = qweight.shape[1]
    group = GROUP_INT4 if precision == "int4" else GROUP_FP4
    # shape-adaptive defaults (tuned on v5e: bm512/bn1024/bk512 ~30% over
    # bm256/bn512/bk1024 at FLUX shapes)
    def _pick(dim, prefs):
        for p in prefs:
            if dim % p == 0:
                return p
        return dim

    if bm is None:
        bm = _pick(m, (512, 256, 128))
    if bn is None:
        bn = _pick(n, (1024, 512, 256, 128))
    if bk is None:
        bk = _pick(k, (512, 1024, 256) if bn >= 1024 else (1024, 512, 256))
    bm = min(bm, m)
    bn = min(bn, n)
    bk = min(bk, k)
    if m % bm or n % bn or k % bk:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by blocks ({bm},{bn},{bk})")

    has_lora = lora_act is not None
    has_bias = bias is not None
    grid = (m // bm, n // bn, k // bk)

    in_specs = [
        pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // group, bm), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (bk // group, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
        ),
    ]
    inputs = [qact, ascales, qweight, wscales]
    if has_lora:
        r = lora_act.shape[1]
        in_specs.append(
            pl.BlockSpec((bm, r), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((r, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(1, n))

    kernel = functools.partial(
        _gemm_kernel,
        precision=precision,
        act_unsigned=act_unsigned,
        group=group,
        has_lora=has_lora,
        has_bias=has_bias,
        out_dtype=out_dtype,
    )

    flops = 2 * m * n * k + (2 * m * n * (lora_act.shape[1] if has_lora else 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * kp + kp * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
