"""Pallas TPU kernels for the quantized GEMMs.

TPU-native replacements for the reference's CUDA GEMM family
(src/kernels/zgemm/gemm_w4a4.cuh:832 gemm_w4a4_block, gemm_w8a8.cuh; launch
and epilogue composition gemm_w4a4_launch_impl.cuh:172-385; LoRA fusion
lora.cuh).

Two kernels share one entry point, dispatched on ``precision``:

``int4`` / ``nvfp4`` — the SVDQuant parity path. TPUs have no 4-bit MXU
datapath, so weights stay packed int4 in HBM (the bandwidth win) and are
expanded to bf16 inside VMEM for a bf16 MXU matmul with f32 accumulation.
Unpacking is **plane-split**: the low/high nibble planes of the
block-split-half layout (core/packing.py) are contracted as two separate
K-slices with matching act/weight order, so no cross-lane interleave
relayout is ever materialized (worth ~25% over stack+reshape on v5e).
Per-(token, group) scales expand via tiny 0/1 matmuls on the MXU (Mosaic
cannot reshape a 64-minor dim).

``int8`` — the TPU-native turbo path (and the reference's W8A8 component,
zgemm.h:54-63, used by its SDXL pipeline). Per-token activation scales and
per-channel weight scales are rank-1, so they factor *out* of the matmul
entirely: the MXU runs a native int8xint8->int32 contraction (~1.8x the
bf16 dequant path on v5e: 146 vs 82 TF/s at FLUX shapes) and one VPU pass
applies ``ascale x wscale`` at the end. The rank-r SVD branch absorbs
weight outliers exactly as in the 4-bit path.

The rank-r SVD branch (lora_act @ proj_up) and bias fuse into the
accumulator (the EpilogueLoraUp + bias analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import PACK_BLOCK
from .reference import GROUP_FP4, GROUP_INT4


def _decode_e2m1(q_i32: jnp.ndarray) -> jnp.ndarray:
    """Signed e2m1 code (int32 in [-7, 7]) -> f32 value, arithmetically.

    code c: e = |c| >> 1, m = |c| & 1; value = m*0.5 if e == 0
    else (1 + 0.5 m) * 2^(e-1). Grid: 0, .5, 1, 1.5, 2, 3, 4, 6.
    """
    a = jnp.abs(q_i32)
    e = a >> 1
    m = (a & 1).astype(jnp.float32)
    mag = jnp.where(
        e == 0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2((e - 1).astype(jnp.float32))
    )
    return jnp.where(q_i32 < 0, -mag, mag)


def _plane_values(p_i32, unsigned: bool, precision: str):
    """Packed tile -> (lo, hi) nibble-plane values as bf16."""
    if unsigned:
        lo = p_i32 & 0xF
        hi = (p_i32 >> 4) & 0xF
    else:
        lo = (p_i32 << 28) >> 28
        hi = (p_i32 << 24) >> 28
    if precision == "nvfp4":
        return (
            _decode_e2m1(lo).astype(jnp.bfloat16),
            _decode_e2m1(hi).astype(jnp.bfloat16),
        )
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def _act_plane_scales(as_t, bk: int, group: int):
    """Expand transposed act scales (bk/G, bm) to per-plane (bm, bk/2).

    Plane lane j of pack-block b holds logical k = 256 b + (j % 128) for the
    low plane and + 128 for the high plane; group(k) = k // G.
    """
    ng = bk // group
    half = bk // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (ng, half), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ng, half), 1)
    gpb = PACK_BLOCK // group  # groups per pack block
    g_lo = (cols // 128) * gpb + (cols % 128) // group
    e_lo = (g_lo == rows).astype(jnp.float32)
    e_hi = (g_lo + gpb // 2 == rows).astype(jnp.float32)
    dims = (((0,), (0,)), ((), ()))
    asv = as_t.astype(jnp.float32)
    s_lo = jax.lax.dot_general(asv, e_lo, dims, preferred_element_type=jnp.float32)
    s_hi = jax.lax.dot_general(asv, e_hi, dims, preferred_element_type=jnp.float32)
    return s_lo.astype(jnp.bfloat16), s_hi.astype(jnp.bfloat16)


def _wgt_plane_scales(ws, bk: int, group: int):
    """Expand weight scales (bk/G, bn) to per-plane (bk/2, bn)."""
    ng = bk // group
    half = bk // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (half, ng), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (half, ng), 1)
    gpb = PACK_BLOCK // group
    g_lo = (rows // 128) * gpb + (rows % 128) // group
    e_lo = (cols == g_lo).astype(jnp.float32)
    e_hi = (cols == g_lo + gpb // 2).astype(jnp.float32)
    wsv = ws.astype(jnp.float32)
    s_lo = jnp.dot(e_lo, wsv, preferred_element_type=jnp.float32)
    s_hi = jnp.dot(e_hi, wsv, preferred_element_type=jnp.float32)
    return s_lo.astype(jnp.bfloat16), s_hi.astype(jnp.bfloat16)


def _split_refs(refs, has_lora, has_bias):
    qa_ref, as_ref, qw_ref, ws_ref = refs[:4]
    out_ref, acc_ref = refs[-2], refs[-1]
    mid = refs[4:-2]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        (b_ref,) = mid
    return qa_ref, as_ref, qw_ref, ws_ref, la_ref, pu_ref, b_ref, out_ref, acc_ref


def _gemm_w4a4_kernel(
    *refs, precision, act_unsigned, group, has_lora, has_bias, out_dtype,
    stacked_w=False,
):
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref, qw_ref, ws_ref, la_ref, pu_ref, b_ref, out_ref, acc_ref = (
        _split_refs(refs, has_lora, has_bias)
    )
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

    ap = qa_ref[...].astype(jnp.int32)  # (bm, bk/2)
    wp = (qw_ref[0] if stacked_w else qw_ref[...]).astype(jnp.int32)  # (bk/2, bn)
    bm, half = ap.shape
    bk = half * 2
    a_lo, a_hi = _plane_values(ap, act_unsigned, precision)
    w_lo, w_hi = _plane_values(wp, False, precision)
    s_lo, s_hi = _act_plane_scales(as_ref[...], bk, group)
    t_lo, t_hi = _wgt_plane_scales(ws_ref[...], bk, group)
    acc_ref[...] += jnp.dot(a_lo * s_lo, w_lo * t_lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(a_hi * s_hi, w_hi * t_hi, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def _gemm_w4a8_kernel(*refs, group, has_lora, has_bias, out_dtype,
                      stacked_w=False):
    """Hybrid: int4-packed weights in HBM, int8 MXU compute.

    The packed nibbles are rescaled in VMEM from per-64-group int4 scales
    to per-channel int8 (w8 = round(v * rs), rs = ws * (127/7) / WS
    precomputed at load), so the contraction runs as two int8 plane dots
    and only rank-1 scales remain for the epilogue — int8-turbo speed at
    4-bit weight memory. Numerically identical to requantizing the weights
    to int8 at load (the ``precision="int8"`` mode).
    """
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref = refs[0], refs[1]
    qw_ref, rs_ref, ws_ref = refs[2], refs[3], refs[4]
    out_ref, acc_ref = refs[-2], refs[-1]
    mid = refs[5:-2]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        (b_ref,) = mid

    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wp = (qw_ref[0] if stacked_w else qw_ref[...]).astype(jnp.int32)  # (bk/2, bn)
    half, bn = wp.shape
    bk = half * 2
    lo = (wp << 28) >> 28
    hi = (wp << 24) >> 28
    rs_lo, rs_hi = _wgt_plane_scales(rs_ref[...], bk, group)
    # clip guards checkpoint values of -8 at the max-scale group
    w8_lo = jnp.clip(
        jnp.round(lo.astype(jnp.float32) * rs_lo.astype(jnp.float32)), -127, 127
    ).astype(jnp.int8)
    w8_hi = jnp.clip(
        jnp.round(hi.astype(jnp.float32) * rs_hi.astype(jnp.float32)), -127, 127
    ).astype(jnp.int8)

    # act plane split: low plane holds logical k = 256b + [0,128)
    a = qa_ref[...]
    bm = a.shape[0]
    a4 = a.reshape(bm, bk // PACK_BLOCK, 2, 128)
    a_lo = a4[:, :, 0, :].reshape(bm, half)
    a_hi = a4[:, :, 1, :].reshape(bm, half)

    dims = (((1,), (0,)), ((), ()))
    d = jax.lax.dot_general(a_lo, w8_lo, dims, preferred_element_type=jnp.int32)
    d += jax.lax.dot_general(a_hi, w8_hi, dims, preferred_element_type=jnp.int32)
    acc_ref[...] += d.astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        out = acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
        if has_lora:
            out = out + jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        out_ref[...] = out.astype(out_dtype)


def _act_planes(a):
    """(bm, bk) int8 logical-order activations -> (lo, hi) plane halves.

    Plane lane j of pack-block b holds logical k = 256 b + j (low) and
    256 b + 128 + j (high) — the same block-split-half order the packed
    weights use (core/packing.py), so plane dots contract matching k's.
    """
    bm, bk = a.shape
    a4 = a.reshape(bm, bk // PACK_BLOCK, 2, 128)
    half = bk // 2
    return (
        a4[:, :, 0, :].reshape(bm, half),
        a4[:, :, 1, :].reshape(bm, half),
    )


def _w4a8_dequant_stripe(qw_ref, rs_ref, wlo_ref, whi_ref, k_idx, *, group,
                         stacked_w):
    """Dequantize this grid step's packed (bk/2, bn) weight tile to int8 and
    store it into the (K/2, bn) plane scratches at the tile's K offset.

    Same math as the reference's load-time int4->int8 requantization
    (w8 = clip(round(nibble * rescale), -127, 127)); runs under
    ``pl.when(i == 0)`` so each weight element is dequantized exactly once
    per kernel invocation instead of once per M-tile (the round-3 Pallas
    hybrid re-dequantized per M-tile: 9x the VPU work at FLUX M=4608,
    measured 577 vs 499 ms/step). ``k_idx`` is passed in from the kernel's
    top level — pl.program_id inside a pl.when body breaks interpret mode."""
    wp = (qw_ref[0] if stacked_w else qw_ref[...]).astype(jnp.int32)
    half, _ = wp.shape
    bk = half * 2
    lo = (wp << 28) >> 28
    hi = (wp << 24) >> 28
    rs_lo, rs_hi = _wgt_plane_scales(rs_ref[...], bk, group)
    wlo_ref[pl.ds(k_idx * half, half), :] = jnp.clip(
        jnp.round(lo.astype(jnp.float32) * rs_lo.astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)
    whi_ref[pl.ds(k_idx * half, half), :] = jnp.clip(
        jnp.round(hi.astype(jnp.float32) * rs_hi.astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)


def _gemm_w4a8h_kernel(*refs, group, has_lora, has_bias, out_dtype,
                       grouped_as=False, stacked_w=False):
    """w4a8 GEMM with hoisted dequant: grid (j, i, kk) — N-tiles OUTERMOST.

    At i == 0 the packed int4 tile is dequantized into (K/2, bn) int8 plane
    scratches; every M-tile i then contracts against the scratch, so the
    dequant VPU work is paid once per weight element per call (the int8
    turbo path plus ~one weight's worth of VPU rescale). ``grouped_as``
    consumes the chain producer's per-(token, K-group) scales exactly like
    ``_gemm_w8a8_kernel(grouped_as=True)``."""
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref, qw_ref, rs_ref, ws_ref = refs[:5]
    mid = refs[5:-4]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        (b_ref,) = mid
    out_ref, acc_ref, wlo_ref, whi_ref = refs[-4:]

    i = pl.program_id(1)
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(i == 0)
    def _dequant():
        _w4a8_dequant_stripe(qw_ref, rs_ref, wlo_ref, whi_ref, k_idx,
                             group=group, stacked_w=stacked_w)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_lo, a_hi = _act_planes(qa_ref[...])
    bm, half = a_lo.shape
    w_lo = wlo_ref[pl.ds(k_idx * half, half), :]
    w_hi = whi_ref[pl.ds(k_idx * half, half), :]
    dims = (((1,), (0,)), ((), ()))
    d = jax.lax.dot_general(a_lo, w_lo, dims, preferred_element_type=jnp.int32)
    d += jax.lax.dot_general(a_hi, w_hi, dims, preferred_element_type=jnp.int32)
    if grouped_as:
        acc_ref[...] += d.astype(jnp.float32) * as_ref[...].reshape(bm, 1)
    else:
        acc_ref[...] += d.astype(jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _done():
        if grouped_as:
            out = acc_ref[...] * ws_ref[...].astype(jnp.float32)
        else:
            out = acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
        if has_lora:
            out = out + jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        out_ref[...] = out.astype(out_dtype)


def _gemm_w8a8_kernel(*refs, has_lora, has_bias, out_dtype, grouped_as=False,
                      stacked_w=False, n_res=0, has_extra=False,
                      has_extra_lora=False):
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    # gated-residual epilogue operands sit between the regular inputs and
    # the (out, acc) trailing refs: x, gate[, extra[, extra_la, extra_pu]]
    res_refs = ()
    if n_res:
        res_refs = refs[-2 - n_res:-2]
        refs = refs[:-2 - n_res] + refs[-2:]
    qa_ref, as_ref, qw_ref, ws_ref, la_ref, pu_ref, b_ref, out_ref, acc_ref = (
        _split_refs(refs, has_lora, has_bias)
    )
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = jax.lax.dot_general(
        qa_ref[...], qw_ref[0] if stacked_w else qw_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if grouped_as:
        # per-(token, k-group) act scales (one group per k step): fold the
        # group's scale into the partial sum — the fused requant chain's
        # consumer side (reference Linear.cpp:270-438 forward_quant on
        # GELU_QUANT-produced activations)
        bm = d.shape[0]
        acc_ref[...] += d.astype(jnp.float32) * as_ref[...].reshape(bm, 1)
    else:
        acc_ref[...] += d.astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        bm = acc_ref.shape[0]
        if grouped_as:
            out = acc_ref[...] * ws_ref[...].astype(jnp.float32)
        else:
            out = acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
        if has_lora:
            out = out + jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        if n_res:
            # out' = x + gate * (round(out) + round(extra + extra_lora)):
            # the rounds mimic the unfused path's bf16 materializations of
            # the mlp output and the attn_out projection, so the fused
            # epilogue matches it to the same rounding
            x_ref, g_ref = res_refs[0], res_refs[1]
            t = out.astype(out_dtype).astype(jnp.float32)
            if has_extra:
                e = res_refs[2][...].astype(jnp.float32)
                if has_extra_lora:
                    e = e + jnp.dot(
                        res_refs[3][...].astype(jnp.bfloat16),
                        res_refs[4][...],
                        preferred_element_type=jnp.float32,
                    )
                e = e.astype(jnp.bfloat16).astype(jnp.float32)
                t = t + e
            out = x_ref[...].astype(jnp.float32) + g_ref[...].astype(jnp.float32) * t
        out_ref[...] = out.astype(out_dtype)


def _tanh_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approx GELU (reference gemm_utils.cuh:306 semantics), f32.

    NUNCHAKU_TPU_GELU env selects the epilogue implementation for the A/B:
      tanh (default) — builtin jnp.tanh
      sigmoid        — exp2-based: 0.5*(1+tanh z) == sigmoid(2z); one exp2 +
                       one reciprocal instead of the tanh lowering
      pade           — clamped Padé [7/6] rational of tanh (mul/add + one
                       reciprocal, no transcendental); max |tanh err| <1e-4
    All three compute the SAME mathematical function (the reference's
    tanh-GELU); they differ only in VPU op mix.
    """
    import os

    impl = os.environ.get("NUNCHAKU_TPU_GELU", "tanh")
    c = 0.7978845608028654  # sqrt(2/pi)
    z = c * (x + 0.044715 * x * x * x)
    if impl == "sigmoid":
        # 0.5*(1+tanh z) = sigmoid(2z) = 1/(1 + 2^(-2z*log2e))
        sig = 1.0 / (1.0 + jnp.exp2(z * (-2.0 * 1.4426950408889634)))
        return x * sig
    if impl == "pade":
        # tanh z ~= z*(135135 + 17325 z^2 + 378 z^4 + z^6) /
        #           (135135 + 62370 z^2 + 3150 z^4 + 28 z^6), |z| <= 4.97
        # (continued-fraction Padé(7,6); max |tanh err| < 1e-4 measured over
        # [-6, 6], GELU abs err < 2e-4 — far under the int8 requantize
        # granularity; the clamp takes over where the rational leaves [-1,1])
        z = jnp.clip(z, -4.97, 4.97)
        z2 = z * z
        num = z * (135135.0 + z2 * (17325.0 + z2 * (378.0 + z2)))
        den = 135135.0 + z2 * (62370.0 + z2 * (3150.0 + z2 * 28.0))
        return 0.5 * x * (1.0 + num / den)
    return 0.5 * x * (1.0 + jnp.tanh(z))


def _tanh_gelu_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approx GELU evaluated in bf16 (2x VPU rate)."""
    c = jnp.bfloat16(0.7978845608028654)
    a = jnp.bfloat16(0.044715)
    half = jnp.bfloat16(0.5)
    one = jnp.bfloat16(1.0)
    return half * x * (one + jnp.tanh(c * (x + a * x * x * x)))


def _gemm_w8a8_gelu_quant_kernel(
    *refs, has_lora, has_bias, act_unsigned_next, gelu_shift, stacked_w=False
):
    """int8 GEMM whose epilogue emits the NEXT layer's quantized activations.

    TPU counterpart of the reference's FuseOptions::GELU_QUANT chain
    (src/Linear.cpp:270-438 + EpilogueQuantize gemm_w4a4.cuh:931): the fc1
    GEMM's output tile is GELU'd, scaled by the next layer's 1/smooth,
    per-token-per-tile quantized to int8, and the next layer's low-rank
    activation partial (gelu_out @ proj_down_next) is computed on the MXU —
    the bf16 intermediate never round-trips HBM and the standalone quantize
    kernel disappears. Scales are per-(token, N-tile): FINER than the
    reference's per-token scales, and exactly what the grouped-as consumer
    kernel (``_gemm_w8a8_kernel(grouped_as=True)``) expects.

    Outputs: qout (M, N) int8; qscales (nj, M) f32; lora_part (nj, M, R) f32
    (summed over nj by the caller — keeps the j grid axis parallel).
    """
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref, qw_ref, ws_ref = refs[:4]
    mid = refs[4:-4]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        b_ref, mid = mid[0], mid[1:]
    rsm_ref, pd_ref = mid
    qout_ref, qs_ref, lp_ref, acc_ref = refs[-4:]

    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qw = qw_ref[0] if stacked_w else qw_ref[...]
    d = jax.lax.dot_general(
        qa_ref[...], qw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += d.astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        bm = acc_ref.shape[0]
        out = acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
        if has_lora:
            out = out + jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        # (a bf16 tanh-gelu epilogue measured 8 ms/step SLOWER in-model —
        # Mosaic upcasts bf16 transcendentals, so the casts are pure cost)
        g = _tanh_gelu(out)
        # next layer's lora_act partial on the raw (unshifted, unsmoothed)
        # activation — matches ops/quantize.py ordering
        lp_ref[0] = jnp.dot(
            g.astype(jnp.bfloat16), pd_ref[...], preferred_element_type=jnp.float32
        )
        if act_unsigned_next:
            g = g + gelu_shift
        h = g * rsm_ref[...].astype(jnp.float32)  # x / smooth_next
        absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)  # (bm, 1)
        scale = absmax / 127.0
        rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
        qout_ref[...] = jnp.clip(jnp.round(h * rcp), -127, 127).astype(jnp.int8)
        qs_ref[...] = scale.reshape(1, 1, bm)


def _gemm_w8a8_gelu_quant_ptoken_kernel(
    *refs, nj, has_lora, has_bias, act_unsigned_next, gelu_shift,
    stacked_w=False,
):
    """Per-TOKEN-scale variant of the GELU_QUANT chain producer.

    Grid (i, j) with j sequential: each j's GELU'd + smoothed tile lands in
    a full-row (bm, N) f32 VMEM scratch while a running per-row absmax
    accumulates; at j == nj-1 the whole row-stripe quantizes with ONE scale
    per token — the reference's own scale granularity (EpilogueQuantize,
    gemm_w4a4.cuh:931 quantizes per token). The consumer then takes plain
    (1, M) ascales and rides XLA's int8 dot (~318 TF/s in-model) instead of
    the Pallas grouped-as kernel (~230 TF/s): the fc2 GEMM leaves the
    custom-call path entirely."""
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref, qw_ref, ws_ref = refs[:4]
    mid = refs[4:-6]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        b_ref, mid = mid[0], mid[1:]
    rsm_ref, pd_ref = mid
    qout_ref, qs_ref, lp_ref, h_ref, amax_ref, lp_acc_ref = refs[-6:]

    j = pl.program_id(1)
    bm = qa_ref.shape[0]
    bn = ws_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        amax_ref[...] = jnp.zeros_like(amax_ref)
        lp_acc_ref[...] = jnp.zeros_like(lp_acc_ref)

    qw = qw_ref[0] if stacked_w else qw_ref[...]
    d = jax.lax.dot_general(
        qa_ref[...], qw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = d.astype(jnp.float32) * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
    if has_lora:
        out = out + jnp.dot(
            la_ref[...].astype(jnp.bfloat16), pu_ref[...],
            preferred_element_type=jnp.float32,
        )
    if has_bias:
        out = out + b_ref[...].astype(jnp.float32)
    g = _tanh_gelu(out)
    lp_acc_ref[...] += jnp.dot(
        g.astype(jnp.bfloat16), pd_ref[...], preferred_element_type=jnp.float32
    )
    if act_unsigned_next:
        g = g + gelu_shift
    h = g * rsm_ref[...].astype(jnp.float32)  # x / smooth_next
    h_ref[:, pl.ds(j * bn, bn)] = h
    amax_ref[...] = jnp.maximum(
        amax_ref[...],
        jnp.broadcast_to(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                         amax_ref.shape),
    )

    @pl.when(j == nj - 1)
    def _done():
        scale = amax_ref[:, :1] / 127.0  # (bm, 1), all lanes equal
        rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
        qout_ref[...] = jnp.clip(
            jnp.round(h_ref[...] * rcp), -127, 127
        ).astype(jnp.int8)
        qs_ref[...] = scale.reshape(1, bm)
        lp_ref[...] = lp_acc_ref[...]


def _gelu_quant_ptoken(
    qact, ascales, qweight, wscales, lora_act, proj_up, bias,
    rsmooth_next, proj_down_next, *,
    act_unsigned_next, gelu_shift, bm, bn, layer_idx, interpret,
):
    """Launch the per-token-scale chain producer (grid (i, j), full-row
    scratch — see ``_gemm_w8a8_gelu_quant_ptoken_kernel``). Returns
    (qout (M, N) int8, qscales (1, M) f32, lora_next (M, R) f32): the
    consumer routes as a plain per-token int8 GEMM (XLA dot)."""
    m, k = qact.shape
    stacked = layer_idx is not None
    n = qweight.shape[2] if stacked else qweight.shape[1]
    # full-row f32 scratch: keep bm moderate so (bm, N) f32 + (bm, N) int8
    # out stay well inside VMEM (512 x 12288 -> 25.2 + 6.3 MB at FLUX fc1)
    if m % bm or n % bn:
        raise ValueError(f"shape ({m},{n}) not divisible by ({bm},{bn})")
    nj = n // bn
    r = proj_down_next.shape[1]
    has_lora = lora_act is not None
    has_bias = bias is not None

    qw_spec = (
        pl.BlockSpec((1, k, bn), lambda i, j, L: (L[0], 0, j), memory_space=pltpu.VMEM)
        if stacked
        else pl.BlockSpec((k, bn), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM),
        qw_spec,
        pl.BlockSpec((1, bn), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [qact, ascales.astype(jnp.float32), qweight, wscales.astype(jnp.float32)]
    if has_lora:
        in_specs += [
            pl.BlockSpec((bm, lora_act.shape[1]), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lora_act.shape[1], bn), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM))
        inputs.append(bias.reshape(1, n))
    in_specs += [
        pl.BlockSpec((1, bn), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, r), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [
        rsmooth_next.reshape(1, n).astype(jnp.float32),
        proj_down_next.astype(jnp.bfloat16),
    ]

    kernel = functools.partial(
        _gemm_w8a8_gelu_quant_ptoken_kernel,
        nj=nj, has_lora=has_lora, has_bias=has_bias,
        act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
        stacked_w=stacked,
    )
    grid = (m // bm, nj)
    out_specs = [
        pl.BlockSpec((bm, n), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, r), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), jnp.int8),
        jax.ShapeDtypeStruct((1, m), jnp.float32),
        jax.ShapeDtypeStruct((m, r), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((bm, n), jnp.float32),
        pltpu.VMEM((bm, 128), jnp.float32),
        pltpu.VMEM((bm, r), jnp.float32),
    ]
    compiler_params = pltpu.CompilerParams(
        # j carries the row-scratch/absmax dependence — sequential
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * k + 2 * m * n * r,
        bytes_accessed=qact.nbytes + k * n + m * n,
        transcendentals=m * n,
    )
    if stacked:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )
        qout, qs, lp = call(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    else:
        qout, qs, lp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    return qout, qs, lp


def _gemm_w4a8_gelu_quant_kernel(
    *refs, group, has_lora, has_bias, act_unsigned_next, gelu_shift,
    stacked_w=False,
):
    """w4a8 variant of the GELU_QUANT chain producer: grid (j, i, kk) with
    the int4->int8 weight dequant hoisted into (K/2, bn) plane scratches at
    i == 0 (see ``_gemm_w4a8h_kernel``); the dot + GELU->requantize epilogue
    are identical to ``_gemm_w8a8_gelu_quant_kernel`` — together with the
    grouped-as consumer this runs the reference's 4-bit-weight fc1->fc2
    chain (src/Linear.cpp:270-438) straight from packed int4 HBM."""
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qa_ref, as_ref, qw_ref, rs_ref, ws_ref = refs[:5]
    mid = refs[5:-6]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        b_ref, mid = mid[0], mid[1:]
    rsm_ref, pd_ref = mid
    qout_ref, qs_ref, lp_ref, acc_ref, wlo_ref, whi_ref = refs[-6:]

    i = pl.program_id(1)
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(i == 0)
    def _dequant():
        _w4a8_dequant_stripe(qw_ref, rs_ref, wlo_ref, whi_ref, k_idx,
                             group=group, stacked_w=stacked_w)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_lo, a_hi = _act_planes(qa_ref[...])
    bm, half = a_lo.shape
    w_lo = wlo_ref[pl.ds(k_idx * half, half), :]
    w_hi = whi_ref[pl.ds(k_idx * half, half), :]
    dims = (((1,), (0,)), ((), ()))
    d = jax.lax.dot_general(a_lo, w_lo, dims, preferred_element_type=jnp.int32)
    d += jax.lax.dot_general(a_hi, w_hi, dims, preferred_element_type=jnp.int32)
    acc_ref[...] += d.astype(jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _done():
        out = acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
        if has_lora:
            out = out + jnp.dot(
                la_ref[...].astype(jnp.bfloat16),
                pu_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_bias:
            out = out + b_ref[...].astype(jnp.float32)
        g = _tanh_gelu(out)
        lp_ref[0] = jnp.dot(
            g.astype(jnp.bfloat16), pd_ref[...], preferred_element_type=jnp.float32
        )
        if act_unsigned_next:
            g = g + gelu_shift
        h = g * rsm_ref[...].astype(jnp.float32)  # x / smooth_next
        absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)  # (bm, 1)
        scale = absmax / 127.0
        rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
        qout_ref[...] = jnp.clip(jnp.round(h * rcp), -127, 127).astype(jnp.int8)
        qs_ref[...] = scale.reshape(1, 1, bm)


def _gemm_w8a8_gelu_quant_pipe_kernel(
    *refs, has_lora, has_bias, act_unsigned_next, gelu_shift, nj,
):
    """Software-pipelined variant of the GELU_QUANT chain (requires nk == 1).

    The j (N-tile) grid axis runs one step long: cell j issues tile j's
    int8 MXU dot into acc[j % 2] and, in the same body, runs tile j-1's
    VPU epilogue (gelu + requantize + lora_down) out of acc[(j-1) % 2].
    The two halves have no data dependence, so Mosaic's VLIW scheduler can
    overlap the MXU contraction with the previous tile's VPU work — the
    serialized dot->epilogue structure of the plain kernel leaves the MXU
    idle for the whole epilogue (~27% of runtime at FLUX shapes).
    N-indexed epilogue operands (wscales/bias/proj_up/rsmooth/proj_down)
    arrive lagged via their index_maps; output windows use the same lagged
    map, so the j=0 cell's garbage epilogue write is overwritten at j=1
    before the block ever flushes to HBM.
    """
    qa_ref, as_ref, qw_ref, ws_ref = refs[:4]
    mid = refs[4:-4]
    la_ref = pu_ref = b_ref = None
    if has_lora:
        la_ref, pu_ref, mid = mid[0], mid[1], mid[2:]
    if has_bias:
        b_ref, mid = mid[0], mid[1:]
    rsm_ref, pd_ref = mid
    qout_ref, qs_ref, lp_ref, acc_ref = refs[-4:]

    j = pl.program_id(1)
    par = jax.lax.rem(j, 2)

    @pl.when(j < nj)
    def _dot():
        d = jax.lax.dot_general(
            qa_ref[...], qw_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[par] = d.astype(jnp.float32)

    bm = acc_ref.shape[1]
    out = acc_ref[1 - par] * as_ref[...].reshape(bm, 1) * ws_ref[...].astype(jnp.float32)
    if has_lora:
        out = out + jnp.dot(
            la_ref[...].astype(jnp.bfloat16),
            pu_ref[...],
            preferred_element_type=jnp.float32,
        )
    if has_bias:
        out = out + b_ref[...].astype(jnp.float32)
    g = _tanh_gelu(out)
    lp_ref[0] = jnp.dot(
        g.astype(jnp.bfloat16), pd_ref[...], preferred_element_type=jnp.float32
    )
    if act_unsigned_next:
        g = g + gelu_shift
    h = g * rsm_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)  # (bm, 1)
    scale = absmax / 127.0
    rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
    qout_ref[...] = jnp.clip(jnp.round(h * rcp), -127, 127).astype(jnp.int8)
    qs_ref[...] = scale.reshape(1, 1, bm)


# Per-(K, N) tuned-tile table: standalone sweeps ranked other tiles ahead,
# but in-model (scan-pipelined) they measured neutral-to-worse, so the
# heuristic picker below stays authoritative. Left empty deliberately.
_TUNED_INT8: dict = {}


def _int8_use_xla(m: int, k: int, n: int) -> bool:
    """Dispatch: XLA dot_general vs the Pallas kernel for int8.

    In-model A/B on the full FLUX step (tools/ablate_fused.py — standalone
    probes over the axon tunnel are dispatch-polluted and unreliable):
    routing EVERY standalone int8 GEMM to XLA's native int8 dot measured
    9 ms/step faster than the large-shape-only heuristic, including the
    M=512 txt-stream and (M,3072,3072) shapes the standalone sweep had
    flagged as XLA-slow. The Pallas kernel remains for the fused
    GELU->quantize chain (grouped-as producer/consumer), w4a8, int4, and
    explicitly-tiled calls.
    """
    return True


def _w4a8_use_xla(m: int, k: int, n: int) -> bool:
    """Dispatch: XLA dequant+int8-dot vs the Pallas hybrid kernel for w4a8.

    The Pallas kernel re-dequantizes each weight tile once per M-tile
    (grid m/bm sweeps) and lands at ~100 TF/s; dequantizing ONCE per layer
    into a (K, N) int8 buffer costs one extra HBM write+read (~3 bytes/elem
    vs 0.5) but moves the contraction onto XLA's int8 dot (~318 TF/s
    in-model). Env NUNCHAKU_TPU_W4A8_XLA=0 restores the Pallas kernel."""
    import os

    return os.environ.get("NUNCHAKU_TPU_W4A8_XLA", "1") != "0"


def _w4a8_fused() -> bool:
    """Fused-dequant w4a8 routes (NUNCHAKU_TPU_W4A8_FUSED, default 1): the
    GELU_QUANT chain and grouped-as consumer read int4-PACKED weights and
    dequantize each stripe once into VMEM plane scratches
    (``_w4a8_dequant_stripe``) — no (K, N) int8 HBM round trip per layer.
    REJECTED as the default on chip (2026-08-19): the in-kernel dequant
    stalls the kernels' pipelines (+101 ms/step vs the int8 chain in the
    device trace); a separate Pallas dequant-to-HBM pass + the unmodified
    int8 chain kernels measures 331.2 vs 457.8 ms/step. The reference keeps
    weights 4-bit into the MMA (gemm_w4a4.cuh:832) because NVIDIA tensor
    cores decode inline; on the TPU the MXU wants int8 operands and the
    (K, N) int8 HBM round trip is the cheaper currency."""
    import os

    return os.environ.get("NUNCHAKU_TPU_W4A8_FUSED", "0") != "0"


def _chain_ptoken() -> bool:
    """Per-token-scale chain producer (NUNCHAKU_TPU_CHAIN_PTOKEN): the
    GELU_QUANT producer quantizes each row with ONE scale (the reference's
    own granularity, EpilogueQuantize gemm_w4a4.cuh:931) so the fc2
    consumer rides XLA's int8 dot instead of the Pallas grouped-as kernel.
    Opt-in until the on-chip A/B settles the default."""
    import os

    return os.environ.get("NUNCHAKU_TPU_CHAIN_PTOKEN", "0") != "0"


def _read_gemm_flags() -> tuple:
    """Snapshot the route-selection env flags OUTSIDE jit so they become a
    static part of the jit cache key (an env flip mid-process then actually
    retraces instead of silently reusing the other route's executable)."""
    return (
        _w4a8_use_xla(0, 0, 0),
        _int4_use_xla(),
        _grouped_use_xla(),
        _lora_bf16_epilogue(),
        _w4a8_fused(),
        _w4a8_deq_pallas(),
    )


def _int4_use_xla() -> bool:
    """Opt-in (NUNCHAKU_TPU_INT4_XLA=1): route int4/nvfp4 GEMMs through an
    XLA bf16 dequant + bf16 dot instead of the Pallas plane-split kernel.
    The Pallas kernel re-dequantizes each weight tile once per M-tile
    (~90 TF/s); dequantizing once per layer into bf16 buffers moves the
    contraction onto XLA's bf16 dot (~160 TF/s in-model) at the cost of a
    bf16 HBM round trip for weights AND activations — needs an on-chip A/B
    before becoming the default (w4a8/int8 remain the fast serving modes).
    """
    import os

    return os.environ.get("NUNCHAKU_TPU_INT4_XLA", "0") == "1"


def _expand_group_scales(scales, k, axis_len_is_rows: bool):
    """(K/G, X) group scales -> full-K expansion along axis 0."""
    g = k // scales.shape[0]
    tiled = jnp.broadcast_to(
        scales.astype(jnp.float32)[:, None, :],
        (scales.shape[0], g, scales.shape[1]),
    )
    return tiled.reshape(k, scales.shape[1])


def _gemm_w4a4_xla(qact, ascales_t, qweight, wscales, lora_act, proj_up,
                   bias, *, precision, act_unsigned, out_dtype, layer_idx,
                   lora_bf16=None):
    """int4/nvfp4 GEMM as XLA dequant + bf16 dot (same per-element math as
    the Pallas kernel: values and group scales multiply in bf16, the dot
    accumulates in f32)."""
    from ..core.packing import unpack_int4

    if layer_idx is not None:
        qweight = jax.lax.dynamic_index_in_dim(
            qweight, layer_idx.reshape(()), 0, keepdims=False
        )
    m = qact.shape[0]
    k = qact.shape[1] * 2
    n = qweight.shape[1]

    def vals(packed, axis, unsigned):
        raw = unpack_int4(packed, axis=axis, unsigned=unsigned)
        if precision == "nvfp4":
            # e2m1 codes are signed nibbles in [-7, 7] (same extraction as
            # the kernel's _plane_values)
            return _decode_e2m1(raw.astype(jnp.int32)).astype(jnp.bfloat16)
        return raw.astype(jnp.bfloat16)

    a = vals(qact, -1, act_unsigned)  # (M, K)
    w = vals(qweight, 0, False)  # (K, N)
    a_s = _expand_group_scales(ascales_t, k, True)  # (K, M)
    w_s = _expand_group_scales(wscales, k, False)  # (K, N)
    a = a * a_s.T.astype(jnp.bfloat16)
    w = w * w_s.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if lora_act is not None:
        if _lora_bf16_epilogue() if lora_bf16 is None else lora_bf16:
            out = out.astype(jnp.bfloat16).astype(jnp.float32)
        out = out + jnp.dot(
            lora_act.astype(jnp.bfloat16), proj_up.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.reshape(1, -1).astype(jnp.float32)
    return out.astype(out_dtype)


def dequant_w4a8_to_int8(qweight, rescales, layer_idx=None, codes="int4"):
    """int4-packed w4a8 weights -> per-channel int8 (K, N), in-graph.

    Same math as the Pallas w4a8 kernel's in-VMEM rescale
    (``_gemm_w4a8_kernel``: w8 = clip(round(nibble * rs), -127, 127)), so
    feeding the result to the int8 MXU is numerically identical — but as an
    XLA elementwise fusion it runs at HBM speed once per layer and the dot
    itself rides XLA's 2x-bf16-rate int8 path instead of the ~100 TF/s
    Pallas hybrid. ``layer_idx`` selects a layer from a stacked (L, K/2, N)
    array (the dynamic-slice fuses into the dequant fusion — this is an XLA
    op, not a custom call, so no extra copy materializes).

    ``codes="e2m1"`` (nvfp4-a8 serving mode): the packed nibbles are signed
    e2m1 codes; they decode arithmetically to the fp4 grid before the
    rescale — the rescale factors then fold the checkpoint's fp8-e4m3 group
    scales over the per-channel int8 scale (models/requantize.py,
    loader.py), so nvfp4 checkpoints ride the unmodified int8 kernels the
    same way int4 ones do (the trick that took w4a8 499 -> 331 ms/step).
    """
    if layer_idx is not None:
        qweight = jax.lax.dynamic_index_in_dim(
            qweight, layer_idx.reshape(()), 0, keepdims=False
        )
    half, n = qweight.shape
    k = half * 2
    g = k // rescales.shape[0]
    # Unpack along axis 0 WITHOUT the unpack_int4 moveaxis: a transpose of
    # the (K/2, N) weight breaks XLA fusion and materialized ~150 MB of f32
    # per layer (round-3 trace: transpose-shaped add_convert fusions +
    # broadcast_in_dim ~70 ms/step). Packed row 128b+j holds logical
    # elements 256b+j (low nibble) and 256b+128+j (high), so a stack along
    # a fresh axis restores logical order with bitcast reshapes only.
    p = qweight.reshape(k // PACK_BLOCK, PACK_BLOCK // 2, n)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
    w4 = jnp.stack([lo, hi], axis=1).reshape(k // g, g, n)
    if codes == "e2m1":
        vals = _decode_e2m1(w4.astype(jnp.int32))
    else:
        vals = w4.astype(jnp.float32)
    # rescale broadcast rides the multiply (never materialized at (K, N))
    w = vals * rescales.astype(jnp.float32)[:, None, :]
    return jnp.clip(jnp.round(w), -127, 127).astype(jnp.int8).reshape(k, n)


def _w4a8_deq_pallas() -> bool:
    """NUNCHAKU_TPU_W4A8_DEQ (default ``pallas``) routes the per-layer
    int4->int8 dequant through a dedicated Pallas kernel instead of the XLA
    fusion. The XLA fusion materializes the rescale broadcast as an f32
    (K/G, G, N) HBM buffer (~113 MB per qkv layer, ~12 ms/step in the w4a8
    trace) because the middle-axis broadcast doesn't fuse into the
    clamp-convert; the kernel rescales in VMEM and writes only the (K, N)
    int8 result. Settled on chip 2026-08-19: standalones 457.8 -> 424 ms,
    and with the chain also on this route (W4A8_FUSED=0) 424 -> 331.2 ms —
    the full w4a8 ladder is 577 (per-M-tile hybrid) / 499 (XLA dequant) /
    457.8 (in-kernel fused dequant) / **331.2** (Pallas dequant-to-HBM +
    int8 chain kernels), 1.07x the int8 step at 4-bit weight memory."""
    import os

    return os.environ.get("NUNCHAKU_TPU_W4A8_DEQ", "pallas") == "pallas"


def dequant_w4a8_auto(qweight, rescales, layer_idx=None, interpret=None,
                      codes="int4"):
    """Flag-dispatched per-layer dequant: the Pallas kernel when enabled
    and the shape tiles legally (K % 256, N % 128 — Mosaic lane rules),
    the XLA fusion otherwise. Both emit identical int8 codes (tests)."""
    half = qweight.shape[1 if layer_idx is not None else 0]
    n = qweight.shape[2 if layer_idx is not None else 1]
    if _w4a8_deq_pallas() and (half * 2) % 256 == 0 and n % 128 == 0:
        return dequant_w4a8_pallas(qweight, rescales, layer_idx,
                                   interpret=interpret, codes=codes)
    return dequant_w4a8_to_int8(qweight, rescales, layer_idx, codes=codes)


def _dequant_w4a8_kernel(*refs, group, stacked_w, codes="int4"):
    if stacked_w:  # scalar-prefetch mode: refs[0] is the layer-index ref
        refs = refs[1:]
    qw_ref, rs_ref, out_ref = refs
    # int32 shifts (Mosaic cannot legalize int8 shli)
    wp = (qw_ref[0] if stacked_w else qw_ref[...]).astype(jnp.int32)
    half, bn = wp.shape
    lo = (wp << 28) >> 28
    hi = (wp << 24) >> 28
    if codes == "e2m1":
        lo_v, hi_v = _decode_e2m1(lo), _decode_e2m1(hi)
    else:
        lo_v, hi_v = lo.astype(jnp.float32), hi.astype(jnp.float32)
    rs_lo, rs_hi = _wgt_plane_scales(rs_ref[...], half * 2, group)
    w_lo = jnp.clip(
        jnp.round(lo_v * rs_lo.astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)
    w_hi = jnp.clip(
        jnp.round(hi_v * rs_hi.astype(jnp.float32)),
        -127, 127,
    ).astype(jnp.int8)
    # packed row 128b+j holds logical rows 256b+j (lo) and 256b+128+j (hi)
    nb = half // 128
    out = jnp.stack(
        [w_lo.reshape(nb, 128, bn), w_hi.reshape(nb, 128, bn)], axis=1
    )
    out_ref[...] = out.reshape(half * 2, bn)


def dequant_w4a8_pallas(qweight, rescales, layer_idx=None, *,
                        bkk=1024, bnn=None, interpret=None, codes="int4"):
    """Pallas counterpart of :func:`dequant_w4a8_to_int8`: same
    clip(round(nibble*rs)) math and logical-order output, but the rescale
    expansion happens in VMEM (two 0/1-matrix MXU dots, `_wgt_plane_scales`)
    — HBM sees only packed int4 in and (K, N) int8 out. ``codes="e2m1"``
    decodes nvfp4 nibbles arithmetically first (nvfp4-a8 serving mode)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    stacked = layer_idx is not None
    half, n = (qweight.shape[1], qweight.shape[2]) if stacked else qweight.shape
    k = half * 2
    group = k // rescales.shape[0]
    bkk = min(bkk, k)
    if k % bkk:
        # odd-dim models (padded K = 256-multiple, e.g. SANA 2304): largest
        # 256-multiple tile that divides K (bkk//2 must stay 128-aligned)
        bkk = _pick_dim(k, (1024, 768, 512, 256))
    if bnn is None:
        bnn = _pick_dim(n, (4608, 3072, 2304, 1536, 1024, 512, 256, 128))
    if k % bkk or n % bnn or (bkk // 2) % 128:
        raise ValueError(f"dequant tiles ({bkk},{bnn}) don't divide ({k},{n})")
    qw_spec = (
        pl.BlockSpec((1, bkk // 2, bnn), lambda kk, j, L: (L[0], kk, j), memory_space=pltpu.VMEM)
        if stacked
        else pl.BlockSpec((bkk // 2, bnn), lambda kk, j, *_: (kk, j), memory_space=pltpu.VMEM)
    )
    in_specs = [
        qw_spec,
        pl.BlockSpec((bkk // group, bnn), lambda kk, j, *_: (kk, j), memory_space=pltpu.VMEM),
    ]
    inputs = [qweight, rescales.astype(jnp.bfloat16)]
    kernel = functools.partial(_dequant_w4a8_kernel, group=group,
                               stacked_w=stacked, codes=codes)
    grid = (k // bkk, n // bnn)
    out_spec = pl.BlockSpec((bkk, bnn), lambda kk, j, *_: (kk, j), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((k, n), jnp.int8)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    cost = pl.CostEstimate(flops=2 * k * n, bytes_accessed=(k // 2) * n + k * n,
                           transcendentals=0)
    if stacked:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape, compiler_params=params, cost_estimate=cost,
            interpret=interpret,
        )(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, compiler_params=params, cost_estimate=cost,
        interpret=interpret,
    )(*inputs)


def _grouped_use_xla() -> bool:
    """Opt-in (NUNCHAKU_TPU_GROUPED_XLA=1): route the chain consumer's
    grouped-scale int8 GEMM through per-group XLA int8 dots instead of the
    Pallas grouped-as kernel. On-chip A/B pending before any default flip."""
    import os

    return os.environ.get("NUNCHAKU_TPU_GROUPED_XLA", "0") == "1"


def _gemm_grouped_xla(qact, ascales, qweight, wscales, lora_act, proj_up,
                      bias, out_dtype, *, layer_idx=None):
    """Grouped-act-scale int8 GEMM as XLA: out = sum_g (qact_g @ w_g) *
    ascale_g — bitwise the same accumulation order as the Pallas grouped-as
    kernel (one f32 scale-multiply per K group, f32 partial adds)."""
    if layer_idx is not None:
        qweight = jax.lax.dynamic_index_in_dim(
            qweight, layer_idx.reshape(()), 0, keepdims=False
        )
    m, k = qact.shape
    ga = ascales.shape[0]
    bk = k // ga
    out = None
    for g in range(ga):
        d = jax.lax.dot_general(
            qact[:, g * bk : (g + 1) * bk],
            qweight[g * bk : (g + 1) * bk],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = d.astype(jnp.float32) * ascales[g].reshape(m, 1).astype(jnp.float32)
        out = part if out is None else out + part
    out = out * wscales.astype(jnp.float32)
    if lora_act is not None:
        out = out + jnp.dot(
            lora_act.astype(jnp.bfloat16), proj_up.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.reshape(1, -1).astype(jnp.float32)
    return out.astype(out_dtype)


def _lora_bf16_epilogue() -> bool:
    """Two XLA dots (main int8 + lora-up) cannot share one fusion: the
    main dot's (M, N) result materializes in HBM and the lora-dot fusion
    reads it back. Default ON: the main term materializes as bf16 instead
    (half the epilogue traffic; on-chip A/B 2026-08-19: int8 step 319.2 ->
    309.1 ms). The only added rounding is one extra bf16 quantization of
    the main term before the lora add — the output is bf16 anyway, so the
    measured model drift is ~0.3% (tests pin < 1%). Set
    NUNCHAKU_TPU_XLA_LORA_BF16=0 for the exact f32 epilogue (e.g. the
    Pallas-route bit-equality tests)."""
    import os

    return os.environ.get("NUNCHAKU_TPU_XLA_LORA_BF16", "1") == "1"


def _gemm_w8a8_xla(qact, ascales, qweight, wscales, lora_act, proj_up, bias,
                   out_dtype, lora_bf16=None):
    """int8 GEMM on XLA's native int8 MXU path (2x bf16 rate at large
    shapes) with the scale/lora/bias epilogue as one fused consumer.

    Accepts qact (M, K) with ascales (1, M), or batched (B, S, K) with
    ascales (B, 1, S) / lora (B, S, R) — the batched form keeps (B, S, ·)
    shapes through the whole dot+epilogue so no flatten-reshape sits next
    to neighboring Pallas custom calls (the B>1 layout-copy source)."""
    batched = qact.ndim == 3
    cdim = 2 if batched else 1
    d = jax.lax.dot_general(
        qact, qweight, (((cdim,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if batched:
        b, s, _ = qact.shape
        a_s = ascales.reshape(b, s, 1).astype(jnp.float32)
    else:
        a_s = ascales.reshape(qact.shape[0], 1).astype(jnp.float32)
    out = d.astype(jnp.float32) * a_s * wscales.astype(jnp.float32)
    if lora_act is not None:
        if _lora_bf16_epilogue() if lora_bf16 is None else lora_bf16:
            # materialize the main term bf16: the lora-dot fusion (the
            # second fusion's hero op) then reads half the bytes back
            out = out.astype(jnp.bfloat16).astype(jnp.float32)
        out = out + jax.lax.dot_general(
            lora_act.astype(jnp.bfloat16), proj_up.astype(jnp.bfloat16),
            (((cdim,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.reshape((1,) * cdim + (-1,)).astype(jnp.float32)
    return out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "act_unsigned_next", "gelu_shift", "bm", "bn", "bk", "pipelined",
        "interpret", "precision", "ptoken",
    ),
)
def svdq_gemm_w8a8_gelu_quant(
    qact: jnp.ndarray,
    ascales: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    lora_act: jnp.ndarray | None,
    proj_up: jnp.ndarray | None,
    bias: jnp.ndarray | None,
    rsmooth_next: jnp.ndarray,
    proj_down_next: jnp.ndarray,
    *,
    act_unsigned_next: bool = False,
    gelu_shift: float = 0.171875,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    pipelined: bool | None = None,
    layer_idx: jnp.ndarray | None = None,
    interpret: bool | None = None,
    rescales: jnp.ndarray | None = None,
    precision: str = "int8",
    ptoken: bool = False,
):
    """int8 GEMM + fused GELU->requantize chain (reference GELU_QUANT,
    src/Linear.cpp:270-438): returns the NEXT layer's quantized activations.

    Inputs follow the int8 layouts of :func:`svdq_gemm_w4a4` plus
    ``rsmooth_next`` (N,) = 1/next.smooth and ``proj_down_next`` (N, R).
    Returns (qout (M, N) int8, qscales (N/bn, M) f32, lora_next (M, R) f32).
    Feed all three to the consumer: grouped qscales are consumed by the
    int8 GEMM's grouped-as path (consumer bk must equal this bn).

    ``layer_idx``: scalar int32 + stacked (L, K, N) ``qweight`` — the
    kernel reads layer ``layer_idx``'s weight tile directly from the
    stacked array via scalar prefetch. Inside a ``lax.scan`` over layers
    this avoids the 37.7 MB dynamic-slice copy XLA otherwise materializes
    per block for a Pallas operand (measured ~10 ms/step at FLUX 1024px;
    XLA dots fuse the slice, custom calls cannot).

    ``precision="w4a8"``: ``qweight`` is int4-packed (K/2, N) with
    ``rescales`` (K/G, N) — the kernel dequantizes each weight stripe ONCE
    into VMEM scratch and runs the same int8 chain (4-bit weight memory,
    int8-turbo compute; reference gemm_w4a4.cuh:832's 4-bit identity).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w4a8 = precision == "w4a8"
    if qact.ndim == 3:
        # batched (B, S, K): vmap the 2D chain — the custom call then takes
        # the 3D operands natively (no flatten at the boundary; B>1 layout
        # copies, see svdq_gemm_w4a4's batched path)
        fn = functools.partial(
            svdq_gemm_w8a8_gelu_quant,
            act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
            bm=bm, bn=bn, bk=bk, pipelined=pipelined, interpret=interpret,
            precision=precision, ptoken=ptoken,
        )
        return jax.vmap(
            lambda q, a, la: fn(q, a, qweight, wscales, la, proj_up, bias,
                                rsmooth_next, proj_down_next,
                                layer_idx=layer_idx, rescales=rescales),
            in_axes=(0, 0, 0 if lora_act is not None else None),
        )(qact, ascales, lora_act)
    m, k = qact.shape
    stacked = layer_idx is not None
    n = qweight.shape[2] if stacked else qweight.shape[1]
    if bm is None:
        # epilogue holds acc + qout + gelu temps in VMEM: bm 512 is the cap
        bm = _pick_dim(m, (512, 256, 128))
    if bn is None:
        bn = _pick_dim(n, (1536, 1024, 512, 256, 128))
    if bk is None:
        # deepest K first: fewer accumulator revisits (in-model: bk=3072
        # beats 768 by ~4 ms/step on FLUX; vmem_limit raised below).
        # w4a8: the hoisted-dequant f32 temps are (bk/2, bn) — keep bk
        # moderate; bk must be a 512-multiple (rescale block rows % 8)
        bk = _pick_dim(
            k, (1536, 1024, 512) if w4a8 else (3072, 1536, 768, 512, 1024, 256)
        )
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    if w4a8:
        return _gelu_quant_w4a8(
            qact, ascales, qweight, rescales, wscales, lora_act, proj_up,
            bias, rsmooth_next, proj_down_next,
            act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
            bm=bm, bn=bn, bk=bk, layer_idx=layer_idx, interpret=interpret,
        )
    if ptoken:
        return _gelu_quant_ptoken(
            qact, ascales, qweight, wscales, lora_act, proj_up, bias,
            rsmooth_next, proj_down_next,
            act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
            bm=bm, bn=bn, layer_idx=layer_idx, interpret=interpret,
        )
    if m % bm or n % bn or k % bk:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by ({bm},{bn},{bk})")
    nj = n // bn
    r = proj_down_next.shape[1]
    has_lora = lora_act is not None
    has_bias = bias is not None

    # Default OFF: measured in-model at FLUX 1024px (tools/ablate_fused.py
    # fused): 363.3 ms/step with the conditional dot, 366.6 with an
    # unconditional dot, vs 359.4 plain — Mosaic does not co-issue the MXU
    # contraction with the lagged VPU epilogue, so the extra grid cell and
    # double-buffered accumulator are pure overhead. Kept opt-in for
    # hardware where the VLIW scheduler does overlap them.
    if pipelined is None:
        pipelined = False
    if pipelined and k == bk and not stacked:
        return _gelu_quant_pipelined(
            qact, ascales, qweight, wscales, lora_act, proj_up, bias,
            rsmooth_next, proj_down_next,
            act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
            bm=bm, bn=bn, interpret=interpret,
        )

    qw_spec = (
        pl.BlockSpec((1, bk, bn), lambda i, j, kk, L: (L[0], kk, j), memory_space=pltpu.VMEM)
        if stacked
        else pl.BlockSpec((bk, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk, *_: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i, j, kk, *_: (0, i), memory_space=pltpu.VMEM),
        qw_spec,
        pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [qact, ascales.astype(jnp.float32), qweight, wscales.astype(jnp.float32)]
    if has_lora:
        in_specs += [
            pl.BlockSpec((bm, lora_act.shape[1]), lambda i, j, kk, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lora_act.shape[1], bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM))
        inputs.append(bias.reshape(1, n))
    in_specs += [
        pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, r), lambda i, j, kk, *_: (j, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [
        rsmooth_next.reshape(1, n).astype(jnp.float32),
        proj_down_next.astype(jnp.bfloat16),
    ]

    kernel = functools.partial(
        _gemm_w8a8_gelu_quant_kernel,
        has_lora=has_lora, has_bias=has_bias,
        act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
        stacked_w=stacked,
    )
    grid = (m // bm, nj, k // bk)
    out_specs = [
        pl.BlockSpec((bm, bn), lambda i, j, kk, *_: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bm), lambda i, j, kk, *_: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, r), lambda i, j, kk, *_: (j, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), jnp.int8),
        jax.ShapeDtypeStruct((nj, 1, m), jnp.float32),
        jax.ShapeDtypeStruct((nj, m, r), jnp.float32),
    ]
    scratch_shapes = [pltpu.VMEM((bm, bn), jnp.float32)]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        # the epilogue's f32 gelu/quantize temps exceed the default
        # 16 MiB scoped budget at larger tiles; v5e VMEM is 128 MiB
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * k + 2 * m * n * r,
        bytes_accessed=qact.nbytes + qweight.nbytes // (qweight.shape[0] if stacked else 1) + m * n,
        transcendentals=m * n,
    )
    if stacked:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )
        qout, qs3, lp = call(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    else:
        qout, qs3, lp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    return qout, qs3.reshape(nj, m), lp.sum(axis=0)


def _gelu_quant_w4a8(
    qact, ascales, qweight, rescales, wscales, lora_act, proj_up, bias,
    rsmooth_next, proj_down_next, *,
    act_unsigned_next, gelu_shift, bm, bn, bk, layer_idx, interpret,
):
    """Launch the w4a8 GELU_QUANT chain producer: (j, i, kk) grid, packed
    int4 weights dequantized once per call into VMEM plane scratches (see
    ``_gemm_w4a8_gelu_quant_kernel``). Outputs match the int8 chain's."""
    m, k = qact.shape
    stacked = layer_idx is not None
    n = qweight.shape[2] if stacked else qweight.shape[1]
    if m % bm or n % bn or k % bk:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by ({bm},{bn},{bk})")
    nj = n // bn
    r = proj_down_next.shape[1]
    has_lora = lora_act is not None
    has_bias = bias is not None
    group = k // rescales.shape[0]

    # weight/rescale index maps pin the block index to (0, j) for i > 0:
    # after the i == 0 dequant pass the packed tile is dead weight, and
    # consecutive identical indices elide the HBM refetch DMA
    qw_spec = (
        pl.BlockSpec(
            (1, bk // 2, bn),
            lambda j, i, kk, L: (L[0], jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        )
        if stacked
        else pl.BlockSpec(
            (bk // 2, bn),
            lambda j, i, kk, *_: (jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        )
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda j, i, kk, *_: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda j, i, kk, *_: (0, i), memory_space=pltpu.VMEM),
        qw_spec,
        pl.BlockSpec(
            (bk // group, bn),
            lambda j, i, kk, *_: (jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [qact, ascales.astype(jnp.float32), qweight,
              rescales.astype(jnp.bfloat16), wscales.astype(jnp.float32)]
    if has_lora:
        in_specs += [
            pl.BlockSpec((bm, lora_act.shape[1]), lambda j, i, kk, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lora_act.shape[1], bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM))
        inputs.append(bias.reshape(1, n))
    in_specs += [
        pl.BlockSpec((1, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, r), lambda j, i, kk, *_: (j, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [
        rsmooth_next.reshape(1, n).astype(jnp.float32),
        proj_down_next.astype(jnp.bfloat16),
    ]

    kernel = functools.partial(
        _gemm_w4a8_gelu_quant_kernel,
        group=group, has_lora=has_lora, has_bias=has_bias,
        act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift,
        stacked_w=stacked,
    )
    grid = (nj, m // bm, k // bk)
    out_specs = [
        pl.BlockSpec((bm, bn), lambda j, i, kk, *_: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bm), lambda j, i, kk, *_: (j, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, r), lambda j, i, kk, *_: (j, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), jnp.int8),
        jax.ShapeDtypeStruct((nj, 1, m), jnp.float32),
        jax.ShapeDtypeStruct((nj, m, r), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((bm, bn), jnp.float32),
        pltpu.VMEM((k // 2, bn), jnp.int8),
        pltpu.VMEM((k // 2, bn), jnp.int8),
    ]
    compiler_params = pltpu.CompilerParams(
        # j carries the scratch dependence per stripe (each core's scratch
        # is private, so j may still split across cores); i and kk must run
        # in order for the i == 0 dequant pass to precede its consumers
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * k + 2 * m * n * r,
        bytes_accessed=qact.nbytes + (k // 2) * n + m * n,
        transcendentals=m * n,
    )
    if stacked:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )
        qout, qs3, lp = call(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    else:
        qout, qs3, lp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    return qout, qs3.reshape(nj, m), lp.sum(axis=0)


def _gelu_quant_pipelined(
    qact, ascales, qweight, wscales, lora_act, proj_up, bias,
    rsmooth_next, proj_down_next, *,
    act_unsigned_next, gelu_shift, bm, bn, interpret,
):
    """Launch wrapper for the software-pipelined GELU_QUANT chain: the j
    axis runs nj+1 cells, epilogue operands and output windows lag one
    N-tile behind the dot (see _gemm_w8a8_gelu_quant_pipe_kernel)."""
    m, k = qact.shape
    n = qweight.shape[1]
    nj = n // bn
    r = proj_down_next.shape[1]
    has_lora = lora_act is not None
    has_bias = bias is not None

    def cur(jj):  # dot-side N index (tile j, clamped at the flush cell)
        return jnp.minimum(jj, nj - 1)

    def prev(jj):  # epilogue-side N index (tile j-1, clamped at j=0)
        return jnp.maximum(jj - 1, 0)

    in_specs = [
        pl.BlockSpec((bm, k), lambda i, jj: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i, jj: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, jj: (0, cur(jj)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, jj: (0, prev(jj)), memory_space=pltpu.VMEM),
    ]
    inputs = [qact, ascales.astype(jnp.float32), qweight, wscales.astype(jnp.float32)]
    if has_lora:
        in_specs += [
            pl.BlockSpec((bm, lora_act.shape[1]), lambda i, jj: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lora_act.shape[1], bn), lambda i, jj: (0, prev(jj)), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, jj: (0, prev(jj)), memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(1, n))
    in_specs += [
        pl.BlockSpec((1, bn), lambda i, jj: (0, prev(jj)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, r), lambda i, jj: (prev(jj), 0), memory_space=pltpu.VMEM),
    ]
    inputs += [
        rsmooth_next.reshape(1, n).astype(jnp.float32),
        proj_down_next.astype(jnp.bfloat16),
    ]

    kernel = functools.partial(
        _gemm_w8a8_gelu_quant_pipe_kernel,
        has_lora=has_lora, has_bias=has_bias,
        act_unsigned_next=act_unsigned_next, gelu_shift=gelu_shift, nj=nj,
    )
    qout, qs3, lp = pl.pallas_call(
        kernel,
        grid=(m // bm, nj + 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, jj: (i, prev(jj)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bm), lambda i, jj: (prev(jj), 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, r), lambda i, jj: (prev(jj), i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.int8),
            jax.ShapeDtypeStruct((nj, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((nj, m, r), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 2 * m * n * r,
            bytes_accessed=qact.nbytes + qweight.nbytes + m * n,
            transcendentals=m * n,
        ),
        interpret=interpret,
    )(*inputs)
    return qout, qs3.reshape(nj, m), lp.sum(axis=0)


def _pick_dim(dim, prefs):
    for p in prefs:
        if dim % p == 0:
            return p
    return dim


def _gemm_w4a8_hoisted(
    qact, ascales, qweight, rescales, wscales, lora_act, proj_up, bias, *,
    out_dtype, grouped_as, bm, bn, bk, layer_idx, interpret,
):
    """Launch the hoisted-dequant w4a8 GEMM (``_gemm_w4a8h_kernel``): grid
    (j, i, kk) with N-stripes OUTERMOST — at i == 0 each packed int4 K-tile
    of stripe j is rescaled once into (K/2, bn) int8 plane scratches, and
    every M-tile contracts against the scratch. ``grouped_as`` consumes the
    GELU_QUANT chain producer's (Ga, M) per-(token, N-tile) scales exactly
    like the int8 grouped-as kernel (reference src/Linear.cpp:270-438's
    fc2.forward_quant, at 4-bit weight memory)."""
    m, k = qact.shape
    stacked = layer_idx is not None
    n = qweight.shape[2] if stacked else qweight.shape[1]
    group = k // rescales.shape[0]
    if bm is None:
        bm = _pick_dim(m, (512, 256, 128))
    if bn is None:
        bn = _pick_dim(n, (1536, 1024, 512, 256, 128))
    if bk is None:
        # (bk/group) rescale block rows must be a multiple of 8 -> 512s
        bk = _pick_dim(k, (1536, 1024, 512))
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    if m % bm or n % bn or k % bk:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by ({bm},{bn},{bk})")
    has_lora = lora_act is not None
    has_bias = bias is not None

    qw_spec = (
        pl.BlockSpec(
            (1, bk // 2, bn),
            lambda j, i, kk, L: (L[0], jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        )
        if stacked
        else pl.BlockSpec(
            (bk // 2, bn),
            lambda j, i, kk, *_: (jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        )
    )
    as_spec = (
        pl.BlockSpec((1, 1, bm), lambda j, i, kk, *_: (kk, 0, i), memory_space=pltpu.VMEM)
        if grouped_as
        else pl.BlockSpec((1, bm), lambda j, i, kk, *_: (0, i), memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda j, i, kk, *_: (i, kk), memory_space=pltpu.VMEM),
        as_spec,
        qw_spec,
        pl.BlockSpec(
            (bk // group, bn),
            lambda j, i, kk, *_: (jnp.where(i == 0, kk, 0), j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM),
    ]
    asc = ascales.astype(jnp.float32)
    if grouped_as:
        asc = asc.reshape(asc.shape[0], 1, asc.shape[1])
    inputs = [qact, asc, qweight, rescales.astype(jnp.bfloat16),
              wscales.astype(jnp.float32)]
    if has_lora:
        r = lora_act.shape[1]
        in_specs += [
            pl.BlockSpec((bm, r), lambda j, i, kk, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda j, i, kk, *_: (0, j), memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(1, n))

    kernel = functools.partial(
        _gemm_w4a8h_kernel, group=group, has_lora=has_lora,
        has_bias=has_bias, out_dtype=out_dtype, grouped_as=grouped_as,
        stacked_w=stacked,
    )
    grid = (n // bn, m // bm, k // bk)
    out_spec = pl.BlockSpec((bm, bn), lambda j, i, kk, *_: (i, j), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    scratch_shapes = [
        pltpu.VMEM((bm, bn), jnp.float32),
        pltpu.VMEM((k // 2, bn), jnp.int8),
        pltpu.VMEM((k // 2, bn), jnp.int8),
    ]
    compiler_params = pltpu.CompilerParams(
        # j may split across cores (scratch is core-private); i and kk must
        # run in order so the i == 0 dequant pass precedes its consumers
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=2 * m * n * k + (2 * m * n * (lora_act.shape[1] if has_lora else 0)),
        bytes_accessed=qact.nbytes + (k // 2) * n + m * n * 2,
        transcendentals=0,
    )
    if stacked:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(*inputs)


def svdq_gemm_w4a4(
    qact: jnp.ndarray,
    ascales: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    lora_act: jnp.ndarray | None = None,
    proj_up: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    rescales: jnp.ndarray | None = None,
    *,
    precision: str = "int4",
    act_unsigned: bool = False,
    out_dtype=jnp.bfloat16,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    layer_idx: jnp.ndarray | None = None,
    residual=None,
    interpret: bool | None = None,
    wcodes: str = "int4",
) -> jnp.ndarray:
    """Public entry: snapshots the route-selection env flags outside jit so
    they key the compiled-executable cache (see :func:`_read_gemm_flags`;
    an env flip between two same-shape calls retraces instead of silently
    reusing the first route's executable). See :func:`_svdq_gemm_w4a4` for
    the layout/semantics contract.

    ``residual = (x, gate[, extra[, extra_lora_act, extra_proj_up]])``
    computes ``x + gate * (round(out) + round(extra + extra_lora))`` —
    the transformer block's gated residual add, fused into the Pallas
    grouped-as consumer's epilogue on the int8 chain route (other routes
    apply it as XLA ops, same rounding semantics). ``gate`` is the (B, N)
    AdaLN gate vector; ``extra`` an already-computed partial (e.g. the
    single block's attn_out main term with its low-rank branch passed
    separately so its full-width XLA add fusion disappears)."""
    res = None
    if residual is not None:
        res = tuple(residual) + (None,) * (5 - len(residual))
    return _svdq_gemm_w4a4(
        qact, ascales, qweight, wscales, lora_act, proj_up, bias, rescales,
        precision=precision, act_unsigned=act_unsigned, out_dtype=out_dtype,
        bm=bm, bn=bn, bk=bk, layer_idx=layer_idx, interpret=interpret,
        flags=_read_gemm_flags(), wcodes=wcodes,
        res_x=None if res is None else res[0],
        res_gate=None if res is None else res[1],
        res_extra=None if res is None else res[2],
        res_ela=None if res is None else res[3],
        res_epu=None if res is None else res[4],
    )


def _res_apply_xla(out, res_x, res_gate, res_extra, res_ela, res_epu):
    """XLA form of the gated-residual epilogue (for routes that don't fuse
    it in-kernel). Matches the kernel's rounding: the main term arrives
    already rounded to out dtype; extra + extra_lora round to bf16 once."""
    t = out.astype(jnp.float32)
    if res_extra is not None:
        e = res_extra.astype(jnp.float32)
        if res_ela is not None:
            e = e + jax.lax.dot_general(
                res_ela.astype(jnp.bfloat16), res_epu.astype(jnp.bfloat16),
                (((res_ela.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        e = e.astype(jnp.bfloat16).astype(jnp.float32)
        t = t + e
    g = res_gate.astype(jnp.float32)
    if out.ndim == 3:
        g = g.reshape(g.shape[0], 1, g.shape[-1])
    else:
        g = g.reshape(1, g.shape[-1])
    return (res_x.astype(jnp.float32) + g * t).astype(out.dtype)


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
        "flags",
        "wcodes",
    ),
)
def _svdq_gemm_w4a4(
    qact: jnp.ndarray,
    ascales: jnp.ndarray,
    qweight: jnp.ndarray,
    wscales: jnp.ndarray,
    lora_act: jnp.ndarray | None = None,
    proj_up: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    rescales: jnp.ndarray | None = None,  # w4a8: (K/G, N) int4->int8 rescale
    *,
    precision: str = "int4",
    act_unsigned: bool = False,
    out_dtype=jnp.bfloat16,
    bm: int | None = None,
    bn: int | None = None,
    bk: int | None = None,
    layer_idx: jnp.ndarray | None = None,
    interpret: bool | None = None,
    flags: tuple | None = None,
    res_x: jnp.ndarray | None = None,
    res_gate: jnp.ndarray | None = None,
    res_extra: jnp.ndarray | None = None,
    res_ela: jnp.ndarray | None = None,
    res_epu: jnp.ndarray | None = None,
    wcodes: str = "int4",
) -> jnp.ndarray:
    """Quantized GEMM: ``dequant(qact) @ dequant(qweight) + lora + bias``.

    int4 / nvfp4 layouts (see core/packing.py for the packing):
      qact     (M, K/2)   int8, block-split-half packed along K
      ascales  (K/G, M)   bf16/f32 per-token-per-group scales (transposed —
                          token-minor, like the reference's [K//G, M])
      qweight  (K/2, N)   int8, packed along K
      wscales  (K/G, N)   bf16/f32 (nvfp4: alpha & wcscales pre-folded)

    int8 (turbo) layouts:
      qact (M, K) int8; ascales (1, M) f32 per-token
      qweight (K, N) int8; wscales (1, N) f32 per-channel

    common: lora_act (M, R) f32; proj_up (R, N) bf16; bias (N,).
    Returns (M, N) in ``out_dtype``. M, N, K must divide by the blocks
    (SVDQW4A4Linear pads M; weights are padded at load).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # tests run interpreted
    if flags is None:
        flags = _read_gemm_flags()
    w4a8_xla, int4_xla, grouped_xla, lora_bf16, w4a8_fused, deq_pallas = flags

    have_res = res_x is not None

    def _fin(o):
        # gated-residual epilogue for routes that don't fuse it in-kernel
        if not have_res:
            return o
        return _res_apply_xla(o, res_x, res_gate, res_extra, res_ela, res_epu)

    def _w4a8_dequant(qw, rs, idx):
        # standalone dequant route: Pallas kernel (NUNCHAKU_TPU_W4A8_DEQ=
        # pallas, default) dodges the XLA fusion's materialized f32 rescale
        # broadcast; both produce identical int8 codes. Shape guard mirrors
        # dequant_w4a8_auto (Mosaic lane rules)
        half = qw.shape[1 if idx is not None else 0]
        nn = qw.shape[2 if idx is not None else 1]
        if deq_pallas and (half * 2) % 256 == 0 and nn % 128 == 0:
            return dequant_w4a8_pallas(qw, rs, idx, interpret=interpret,
                                       codes=wcodes)
        return dequant_w4a8_to_int8(qw, rs, idx, codes=wcodes)

    # e2m1-coded w4a8 (nvfp4-a8) only has the dequant+int8-dot route: the
    # hoisted Pallas GEMM reads raw nibbles as integers
    w4a8_xla = w4a8_xla or wcodes == "e2m1"
    is_int8 = precision == "int8"
    is_w4a8 = precision == "w4a8"
    stacked = layer_idx is not None

    if qact.ndim == 3:
        # batched (B, S, ·) operands: XLA routes run natively 3D; Pallas
        # routes vmap the 2D kernel (vmap prepends a batch grid dim, so the
        # custom call takes the (B, S, K) operand directly — no flatten at
        # the boundary, which at B>1 forced XLA layout copies around the
        # call; see tools/bench_batch.py)
        m3 = qact.shape[0] * qact.shape[1]  # routing sees the flattened M
        if is_int8 and not stacked and bm is None and bn is None and bk is None:
            grouped3 = ascales.ndim == 3 and ascales.shape[1] > 1
            if not grouped3 and _int8_use_xla(m3, qact.shape[2],
                                              qweight.shape[-1]):
                return _fin(_gemm_w8a8_xla(
                    qact, ascales, qweight, wscales, lora_act, proj_up,
                    bias, out_dtype, lora_bf16=lora_bf16,
                ))
        if (is_w4a8 and bm is None and bn is None and bk is None
                and not (ascales.ndim == 3 and ascales.shape[1] > 1)
                and w4a8_xla):
            w8 = _w4a8_dequant(qweight, rescales, layer_idx)
            return _fin(_gemm_w8a8_xla(
                qact, ascales, w8, wscales, lora_act, proj_up, bias,
                out_dtype, lora_bf16=lora_bf16,
            ))
        fn = functools.partial(
            _svdq_gemm_w4a4, precision=precision, act_unsigned=act_unsigned,
            out_dtype=out_dtype, bm=bm, bn=bn, bk=bk, interpret=interpret,
            flags=flags, wcodes=wcodes,
        )
        return jax.vmap(
            lambda q, a, la, rx, rg, re, rl: fn(
                q, a, qweight, wscales, la, proj_up, bias, rescales,
                layer_idx=layer_idx, res_x=rx, res_gate=rg, res_extra=re,
                res_ela=rl, res_epu=res_epu,
            ),
            in_axes=(0, 0, 0 if lora_act is not None else None,
                     0 if res_x is not None else None,
                     0 if res_gate is not None else None,
                     0 if res_extra is not None else None,
                     0 if res_ela is not None else None),
        )(qact, ascales, lora_act, res_x, res_gate, res_extra, res_ela)

    m = qact.shape[0]
    k = qact.shape[1] * (1 if (is_int8 or is_w4a8) else 2)
    n = qweight.shape[2] if stacked else qweight.shape[1]
    if is_int8 or is_w4a8:
        group = GROUP_INT4 if is_w4a8 else k
    else:
        group = GROUP_INT4 if precision == "int4" else GROUP_FP4

    # shape-adaptive defaults (tuned on v5e at FLUX shapes with the fused
    # lora+bias epilogue: int8 768^3 -> 121 TF/s, int4 768x1536x512 -> 90)
    def _pick(dim, prefs):
        for p in prefs:
            if dim % p == 0:
                return p
        return dim

    # grouped act scales (Ga, M) with Ga > 1: the fused requant chain's
    # consumer — one scale group per k step (bk forced to the group size).
    # int8 AND w4a8 (the w4a8 chain consumer contracts packed int4 weights
    # against the producer's per-(token, N-tile) scale groups); int4/nvfp4
    # per-group ascales are (K/G, M) and are NOT this layout.
    grouped_as = (is_int8 or is_w4a8) and ascales.ndim == 2 and ascales.shape[0] > 1
    if grouped_as:
        if k % ascales.shape[0]:
            raise ValueError(f"K={k} not divisible by {ascales.shape[0]} scale groups")
        bk = k // ascales.shape[0]

    if (is_int8 and not grouped_as and not stacked
            and bm is None and bn is None and bk is None
            and _int8_use_xla(m, k, n)):
        return _fin(_gemm_w8a8_xla(
            qact, ascales, qweight, wscales, lora_act, proj_up, bias,
            out_dtype, lora_bf16=lora_bf16,
        ))

    if grouped_as and grouped_xla and is_int8:
        # chain consumer on XLA: one int8 dot per K scale-group, each
        # scaled by its (M,) group scale and summed — moves the fc2 GEMM
        # from the Pallas grouped-as kernel (~230 TF/s) to XLA's int8 dot
        # (~318 TF/s in-model); the Ga partial (M, N) f32 adds are XLA
        # fusions (~0.1 ms of extra HBM traffic at FLUX shapes).
        # Opt-in; A/B measured on chip 2026-08-19: 353.7 vs 319.8 ms/step for
        # the Pallas grouped-as kernel - stays opt-in (the Ga partial adds
        # cost ~34 ms/step, not the ~0.1 ms estimated).
        return _fin(_gemm_grouped_xla(
            qact, ascales, qweight, wscales, lora_act, proj_up, bias,
            out_dtype, layer_idx=layer_idx,
        ))

    if (precision in ("int4", "nvfp4") and bm is None and bn is None
            and bk is None and int4_xla):
        return _fin(_gemm_w4a4_xla(
            qact, ascales, qweight, wscales, lora_act, proj_up, bias,
            precision=precision, act_unsigned=act_unsigned,
            out_dtype=out_dtype, layer_idx=layer_idx, lora_bf16=lora_bf16,
        ))

    if is_w4a8 and grouped_as:
        if wcodes == "e2m1":
            raise ValueError(
                "e2m1-coded w4a8 has no packed chain kernel; dequant the "
                "weights first (gelu_mlp routes this automatically)"
            )
        # chain consumer on packed int4 weights: the hoisted-dequant kernel
        # rescales each weight stripe ONCE into VMEM plane scratches and
        # contracts the producer's grouped-scale int8 activations — the
        # 4-bit fc1->fc2 chain never materializes an int8 (K, N) buffer
        return _fin(_gemm_w4a8_hoisted(
            qact, ascales, qweight, rescales, wscales, lora_act, proj_up,
            bias, out_dtype=out_dtype, grouped_as=True, bm=bm, bn=bn, bk=bk,
            layer_idx=layer_idx, interpret=interpret,
        ))

    if (is_w4a8 and bm is None and bn is None and bk is None and w4a8_xla):
        # standalone w4a8: dequant the layer's int4 weights to int8 in-graph
        # (one HBM-bound fusion) and ride XLA's native int8 dot — int8-turbo
        # compute at 4-bit weight memory; bit-identical to the Pallas hybrid
        # when no lora branch is present or NUNCHAKU_TPU_XLA_LORA_BF16=0
        # (the default-on bf16 lora epilogue adds one bf16 rounding of the
        # main term that the Pallas kernel's f32 epilogue does not)
        w8 = _w4a8_dequant(qweight, rescales, layer_idx)
        return _fin(_gemm_w8a8_xla(
            qact, ascales, w8, wscales, lora_act, proj_up, bias, out_dtype,
            lora_bf16=lora_bf16,
        ))

    if is_w4a8 and bm is None and bn is None and bk is None:
        # W4A8_XLA=0 Pallas route: hoisted-dequant kernel (each weight
        # element rescaled once per call, not once per M-tile — the round-3
        # per-M-tile hybrid measured 577 vs 499 ms/step on chip)
        return _fin(_gemm_w4a8_hoisted(
            qact, ascales, qweight, rescales, wscales, lora_act, proj_up,
            bias, out_dtype=out_dtype, grouped_as=False, bm=None, bn=None,
            bk=None, layer_idx=layer_idx, interpret=interpret,
        ))

    if is_int8 and bm is None and bn is None and bk is None:
        tuned = _TUNED_INT8.get((k, n))
        if tuned and m % min(tuned[0], m) == 0:
            bm, bn, bk = tuned

    if bm is None:
        # w4a8 (in-kernel rescale temps) and grouped-as (forced large bk)
        # VMEM budgets cap bm at 512
        small_bm = is_w4a8 or grouped_as
        bm = _pick(m, (512, 256, 128) if small_bm else (768, 512, 256, 128))
    if bn is None:
        bn = _pick(n, (1536, 1024, 512, 256, 128))
    if bk is None:
        if is_int8:
            bk = _pick(k, (768, 512, 1024, 256))
        else:
            # int4/w4a8 scale blocks need (bk/group) % 8 == 0 -> multiple
            # of 512 (group 64) / 128 (group 16). Odd-dim K (SANA 2304,
            # SDXL 768) has no such divisor: fall back to full-K blocks —
            # block rows == array rows satisfies Mosaic's tiling rule even
            # when (K/group) % 8 != 0
            bk = _pick(k, tuple(c for c in (512, 1024, 256)
                                if c % group == 0 and (c // group) % 8 == 0))
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    if m % bm or n % bn or k % bk:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by blocks ({bm},{bn},{bk})")

    has_lora = lora_act is not None
    has_bias = bias is not None
    grid = (m // bm, n // bn, k // bk)

    if is_int8:
        # grouped scales carry a singleton mid-axis so the (1, 1, bm) block
        # satisfies Pallas' last-two-dims tiling constraint
        as_spec = (
            pl.BlockSpec((1, 1, bm), lambda i, j, kk, *_: (kk, 0, i), memory_space=pltpu.VMEM)
            if grouped_as
            else pl.BlockSpec((1, bm), lambda i, j, kk, *_: (0, i), memory_space=pltpu.VMEM)
        )
        qw_spec = (
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, L: (L[0], kk, j), memory_space=pltpu.VMEM)
            if stacked
            else pl.BlockSpec((bk, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM)
        )
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, *_: (i, kk), memory_space=pltpu.VMEM),
            as_spec,
            qw_spec,
            pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        n_res = 0
        if have_res:
            n_res = 2 + (res_extra is not None) + 2 * (res_ela is not None)
        kernel = functools.partial(
            _gemm_w8a8_kernel, has_lora=has_lora, has_bias=has_bias,
            out_dtype=out_dtype, grouped_as=grouped_as, stacked_w=stacked,
            n_res=n_res, has_extra=res_extra is not None,
            has_extra_lora=res_ela is not None,
        )
        asc = ascales.astype(jnp.float32)
        if grouped_as:
            asc = asc.reshape(asc.shape[0], 1, asc.shape[1])
        inputs = [qact, asc, qweight, wscales.astype(jnp.float32)]
    elif is_w4a8:
        if wcodes == "e2m1":
            raise ValueError(
                "e2m1-coded w4a8 (nvfp4-a8) has no per-M-tile hybrid kernel; "
                "leave bm/bn/bk unset to take the dequant+int8-dot route"
            )
        qw_spec = (
            pl.BlockSpec((1, bk // 2, bn), lambda i, j, kk, L: (L[0], kk, j), memory_space=pltpu.VMEM)
            if stacked
            else pl.BlockSpec((bk // 2, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM)
        )
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk, *_: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk, *_: (0, i), memory_space=pltpu.VMEM),
            qw_spec,
            pl.BlockSpec(
                (bk // group, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(
            _gemm_w4a8_kernel, group=group,
            has_lora=has_lora, has_bias=has_bias, out_dtype=out_dtype,
            stacked_w=stacked,
        )
        inputs = [qact, ascales.astype(jnp.float32), qweight,
                  rescales.astype(jnp.bfloat16), wscales.astype(jnp.float32)]
    else:
        qw_spec = (
            pl.BlockSpec((1, bk // 2, bn), lambda i, j, kk, L: (L[0], kk, j), memory_space=pltpu.VMEM)
            if stacked
            else pl.BlockSpec((bk // 2, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM)
        )
        in_specs = [
            pl.BlockSpec((bm, bk // 2), lambda i, j, kk, *_: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // group, bm), lambda i, j, kk, *_: (kk, i), memory_space=pltpu.VMEM
            ),
            qw_spec,
            pl.BlockSpec(
                (bk // group, bn), lambda i, j, kk, *_: (kk, j), memory_space=pltpu.VMEM
            ),
        ]
        kernel = functools.partial(
            _gemm_w4a4_kernel,
            precision=precision,
            act_unsigned=act_unsigned,
            group=group,
            has_lora=has_lora,
            has_bias=has_bias,
            out_dtype=out_dtype,
            stacked_w=stacked,
        )
        inputs = [qact, ascales, qweight, wscales]

    if has_lora:
        r = lora_act.shape[1]
        in_specs += [
            pl.BlockSpec((bm, r), lambda i, j, kk, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [lora_act, proj_up.astype(jnp.bfloat16)]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(1, n))
    res_fused = is_int8 and have_res
    if res_fused:
        # gated-residual epilogue operands (kernel n_res block)
        in_specs += [
            pl.BlockSpec((bm, bn), lambda i, j, kk, *_: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
        ]
        inputs += [res_x, res_gate.reshape(1, n)]
        if res_extra is not None:
            in_specs.append(
                pl.BlockSpec((bm, bn), lambda i, j, kk, *_: (i, j), memory_space=pltpu.VMEM)
            )
            inputs.append(res_extra)
        if res_ela is not None:
            r2 = res_ela.shape[-1]
            in_specs += [
                pl.BlockSpec((bm, r2), lambda i, j, kk, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r2, bn), lambda i, j, kk, *_: (0, j), memory_space=pltpu.VMEM),
            ]
            inputs += [res_ela, res_epu.astype(jnp.bfloat16)]
    flops = 2 * m * n * k + (2 * m * n * (lora_act.shape[1] if has_lora else 0))
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk, *_: (i, j), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    scratch_shapes = [pltpu.VMEM((bm, bn), jnp.float32)]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        # allow deep-K tiles (explicit bk overrides); v5e VMEM is 128 MiB
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=qact.nbytes
        + qweight.nbytes // (qweight.shape[0] if stacked else 1) + m * n * 2,
        transcendentals=0,
    )
    if stacked:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(layer_idx.reshape(1).astype(jnp.int32), *inputs)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    return out if res_fused else _fin(out)
