"""On-the-fly activation quantization (+ fused LoRA down-projection).

TPU-native counterpart of the reference's ``quantize_w4a4_act_fuse_lora``
CUDA kernel (src/kernels/zgemm/gemm_w4a4.cuh:1098-1187 and Python wrapper
nunchaku/ops/quantize.py:11): divides by the SVDQuant smooth factor,
quantizes per-token per-group (G=64 int4 absmax/7, G=16 nvfp4 e2m1 with
e4m3 scales), packs two nibbles per byte, and computes the low-rank branch
``lora_act = x @ proj_down`` on the *raw* activation with f32 accumulation.

This op is bandwidth-bound and reshape/reduction-heavy (64-minor group
reductions that Mosaic cannot lower today), so it runs as straight XLA —
the reductions, rounding, and nibble packing all fuse into one pass over
the activation; the lora matmul rides the MXU. The packed-int4 output is
what keeps the downstream Pallas GEMM HBM traffic at 4 bits.

Output layouts (canonical for nunchaku_tpu kernels):
  qact    (M, K/2)  int8  — block-split-half packed (core/packing.py)
  ascales (K/G, M)  bf16  — token-minor, like the reference's [K//G, M]
  lora_act (M, R)   f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dtypes import E2M1_MAX
from ..core.packing import pack_int4
from .reference import GROUP_FP4, GROUP_INT4, GELU_SHIFT


@functools.partial(
    jax.jit, static_argnames=("precision", "act_unsigned", "fuse_glu", "glu_act")
)
def quantize_w4a4_act_fuse_lora(
    x: jnp.ndarray,
    proj_down: jnp.ndarray,
    smooth: jnp.ndarray | None = None,
    *,
    precision: str = "int4",
    act_unsigned: bool = False,
    fuse_glu: bool = False,
    glu_act: str = "silu",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize (M, K) activations; return (qact, ascales_t, lora_act).

    ``fuse_glu`` mirrors the reference's GLU fusion: the input is (M, 2K)
    laid out [value, gate] and the quantized value is ``value * act(gate)``
    (SANA GLUMBConv / Z-Image SwiGLU use silu; SDXL's GEGLU uses gelu —
    ``glu_act`` selects, matching diffusers' SwiGLU/GEGLU chunk order).
    """
    if fuse_glu:
        # diffusers GLUMBConv convention: value = x1 * act(x2) over split
        # halves (the reference kernel uses interleaved pairs,
        # gemm_base.cuh:622 — its converter pre-interleaves the weights;
        # ours keeps half-split and reorders at load instead)
        k2 = x.shape[-1] // 2
        hidden, gate = x[..., :k2], x[..., k2:]
        gf = gate.astype(jnp.float32)
        act = jax.nn.silu(gf) if glu_act == "silu" else jax.nn.gelu(gf, approximate=True)
        x = (hidden.astype(jnp.float32) * act).astype(x.dtype)

    if x.shape[-1] < proj_down.shape[0]:
        # odd-dim model (SANA 2240, SDXL 640, ...): weight buffers are
        # zero-padded to kernel-legal K (models/linear.py random_init /
        # from_weights) — pad the activation columns to match. Padded
        # weight rows hold zero codes, so the padded columns contribute
        # nothing even when act_unsigned shifts the activation codes.
        x = jnp.pad(x, ((0, 0), (0, proj_down.shape[0] - x.shape[-1])))
    m, k = x.shape
    lora_act = jnp.dot(
        x.astype(jnp.bfloat16),
        proj_down.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    # Per-element work uses multiplies only: a VPU divide costs ~20 cycles
    # and this op is VPU-bound at model shapes (per-element divides measured
    # 18 GB/s effective); reciprocals are computed on the tiny scale vectors.
    xs = x.astype(jnp.float32)
    if act_unsigned:
        xs = xs + GELU_SHIFT
    if smooth is not None:
        sm = smooth.astype(jnp.float32)
        rsmooth = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
        xs = xs * rsmooth[None, :]  # (K,) reciprocal, negligible

    def _rcp(scale):
        return jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))

    if precision in ("int8", "w4a8"):
        # turbo path: per-token int8 (the reference's quantize_w8a8_act,
        # zgemm.h:54-63, with per-token scales); no packing, scale (1, M)
        absmax = jnp.max(jnp.abs(xs), axis=-1)
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(xs * _rcp(scale)[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.reshape(1, m), lora_act

    g = GROUP_INT4 if precision == "int4" else GROUP_FP4
    grp = xs.reshape(m, k // g, g)
    absmax = jnp.max(jnp.abs(grp), axis=-1)

    if precision == "int4":
        qmax = 15.0 if act_unsigned else 7.0
        # round the scale to its bf16 storage precision *before* dividing so
        # quantize and dequantize use the identical scale (the reference
        # computes/stores half-precision scales, gemm_w4a4.cuh:594-610)
        scale = (absmax / qmax).astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.round(grp * _rcp(scale)[..., None])
        q = jnp.clip(q, 0.0 if act_unsigned else -qmax, qmax).astype(jnp.int8)
    else:
        scale = (absmax / E2M1_MAX).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        v = grp * _rcp(scale)[..., None]
        # e2m1 round-to-nearest-even (arithmetic form): snap |v| to the grid
        # {0, .5, 1, 1.5, 2, 3, 4, 6}, whose spacing is 2^(e-1) with
        # e = clip(floor(log2|v|), 0, 2) (subnormals share the 0.5 spacing).
        av = jnp.clip(jnp.abs(v), 0.0, E2M1_MAX)
        e = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(av, 1.0))), 0.0, 2.0)
        step = jnp.exp2(e - 1.0)
        mag = jnp.round(av * jnp.exp2(1.0 - e)) * step
        q_val = jnp.where(v < 0, -mag, mag)
        q = _e2m1_value_to_code(q_val)

    qact = pack_int4(q.reshape(m, k), axis=-1)
    ascales_t = scale.T.astype(jnp.bfloat16)
    return qact, ascales_t, lora_act


def _e2m1_value_to_code(v: jnp.ndarray) -> jnp.ndarray:
    """Map exact e2m1 values {0,±.5,±1,±1.5,±2,±3,±4,±6} to int8 codes."""
    a = jnp.abs(v)
    # magnitudes are exactly representable; 2*a gives {0,1,2,3,4,6,8,12}
    t = (2.0 * a).astype(jnp.int32)
    idx = jnp.where(
        t <= 4, t, jnp.where(t == 6, 5, jnp.where(t == 8, 6, 7))
    ).astype(jnp.int8)
    return jnp.where(v < 0, -idx, idx).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Fused LayerNorm + AdaLN-modulate + int8 quantize producer (Pallas)


def _ln_mod_quant_kernel(
    x_ref, sc_ref, sh_ref, rsm_ref, pd_ref, q_ref, s_ref, la_ref,
    *, eps: float, apply_ln: bool, apply_mod: bool,
):
    x = x_ref[0].astype(jnp.float32)  # (bm, K)
    if apply_ln:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    else:
        y = x
    if apply_mod:
        y = y * (1.0 + sc_ref[0].astype(jnp.float32)) + sh_ref[0].astype(jnp.float32)
    # next layer's low-rank branch on the raw modulated activation
    # (ops/quantize.py contract: lora before smooth/shift)
    la_ref[0] = jnp.dot(
        y.astype(jnp.bfloat16), pd_ref[...], preferred_element_type=jnp.float32
    )
    h = y * rsm_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)  # (bm, 1)
    scale = absmax / 127.0
    rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
    q_ref[0] = jnp.clip(jnp.round(h * rcp), -127, 127).astype(jnp.int8)
    s_ref[0] = scale.reshape(1, -1)


@functools.partial(
    jax.jit, static_argnames=("eps", "bm", "apply_ln", "flatten", "interpret")
)
def ln_mod_quant_int8(
    x: jnp.ndarray,  # (B, S, K) residual stream
    mod_scale: jnp.ndarray | None,  # (B, K); None = plain quantize producer
    mod_shift: jnp.ndarray | None,  # (B, K)
    smooth: jnp.ndarray | None,  # (K,)
    proj_down: jnp.ndarray,  # (K, R)
    *,
    eps: float = 1e-6,
    bm: int = 512,
    apply_ln: bool = True,
    flatten: bool = True,
    interpret: bool | None = None,
):
    """LN(x) * (1 + scale) + shift, smoothed and int8-quantized, in ONE HBM
    read of the stream (the XLA path reads the (M, K) activation 2-3 times
    across the LN-reduction / modulate / absmax / round passes).

    Returns (qact (M, K) int8, ascales (1, M) f32, lora_act (M, R) f32)
    with M = B*S — exactly SVDQW4A4Linear.quantize's int8 contract.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, k = x.shape
    bm = min(bm, s)
    if s % bm:
        raise ValueError(f"S={s} not divisible by bm={bm}")
    if not interpret and bm != s and bm % 128:
        # Mosaic tiling: the (1, 1, bm) scales-output block carries bm as
        # its LAST dim, which must be a multiple of 128 or equal S
        # (caught by the on-chip smoke tier; interpret mode can't model it)
        bm = next((c for c in (512, 384, 256, 128) if s % c == 0), s)
    r = proj_down.shape[1]
    if smooth is None:
        rsmooth = jnp.ones((1, k), jnp.float32)
    else:
        sm = smooth.astype(jnp.float32)
        rsmooth = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
        rsmooth = rsmooth.reshape(1, k)

    apply_mod = mod_scale is not None
    if not apply_mod:
        mod_scale = jnp.zeros((b, k), jnp.bfloat16)
        mod_shift = jnp.zeros((b, k), jnp.bfloat16)
    q, sc, la = pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, eps=eps,
                          apply_ln=apply_ln, apply_mod=apply_mod),
        grid=(b, s // bm),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, k), lambda bi, i: (0, 0)),
            pl.BlockSpec((k, r), lambda bi, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, 1, bm), lambda bi, i: (bi, 0, i)),
            pl.BlockSpec((1, bm, r), lambda bi, i: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((b, s, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # f32 LN temps at (bm, K) tiles exceed the 16 MiB default scope
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * k * r + 8 * b * s * k,
            bytes_accessed=x.nbytes + b * s * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, mod_scale.reshape(b, 1, k), mod_shift.reshape(b, 1, k),
      rsmooth, proj_down.astype(jnp.bfloat16))
    if not flatten:
        # batched consumers keep (B, S, ·): no reshape touches the custom
        # call's results (the B>1 layout-copy source; svdq_gemm_w4a4's
        # batched path consumes these shapes directly)
        return q, sc, la
    m = b * s
    return q.reshape(m, k), sc.reshape(1, m), la.reshape(m, r)


def _ln_mod_quant2_kernel(
    x_ref, sc_ref, sh_ref, rsm_a_ref, pd_a_ref, rsm_b_ref, pd_b_ref,
    qa_ref, sa_ref, laa_ref, qb_ref, sb_ref, lab_ref,
    *, eps: float,
):
    x = x_ref[0].astype(jnp.float32)  # (bm, K)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + sc_ref[0].astype(jnp.float32)) + sh_ref[0].astype(jnp.float32)
    yb = y.astype(jnp.bfloat16)

    def quant(rsm_ref, pd_ref, q_ref, s_ref, la_ref):
        la_ref[0] = jnp.dot(yb, pd_ref[...], preferred_element_type=jnp.float32)
        h = y * rsm_ref[...].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        scale = absmax / 127.0
        rcp = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
        q_ref[0] = jnp.clip(jnp.round(h * rcp), -127, 127).astype(jnp.int8)
        s_ref[0] = scale.reshape(1, -1)

    quant(rsm_a_ref, pd_a_ref, qa_ref, sa_ref, laa_ref)
    quant(rsm_b_ref, pd_b_ref, qb_ref, sb_ref, lab_ref)


@functools.partial(jax.jit, static_argnames=("eps", "bm", "interpret"))
def ln_mod_quant_int8_dual(
    x: jnp.ndarray,  # (B, S, K) residual stream
    mod_scale: jnp.ndarray,  # (B, K)
    mod_shift: jnp.ndarray,  # (B, K)
    smooth_a: jnp.ndarray | None,
    proj_down_a: jnp.ndarray,
    smooth_b: jnp.ndarray | None,
    proj_down_b: jnp.ndarray,
    *,
    eps: float = 1e-6,
    bm: int = 512,
    interpret: bool | None = None,
):
    """Shared-AdaLN dual producer (FLUX single blocks: one modulated norm
    feeds BOTH the attention qkv and the MLP fc1, each with its own smooth
    factor): one HBM read and one LayerNorm emit two quantized activations.
    Returns ((qa, sa, la_a), (qb, sb, la_b))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, k = x.shape
    bm = min(bm, s)
    if s % bm:
        raise ValueError(f"S={s} not divisible by bm={bm}")
    if not interpret and bm != s and bm % 128:
        # Mosaic tiling: the (1, 1, bm) scales-output block carries bm as
        # its LAST dim, which must be a multiple of 128 or equal S
        # (caught by the on-chip smoke tier; interpret mode can't model it)
        bm = next((c for c in (512, 384, 256, 128) if s % c == 0), s)

    def _rsm(smooth):
        if smooth is None:
            return jnp.ones((1, k), jnp.float32)
        sm = smooth.astype(jnp.float32)
        r = jnp.where(sm == 0, 1.0, 1.0 / jnp.where(sm == 0, 1.0, sm))
        return r.reshape(1, k)

    ra, rb = _rsm(smooth_a), _rsm(smooth_b)
    r1, r2 = proj_down_a.shape[1], proj_down_b.shape[1]

    vec = pl.BlockSpec((1, 1, k), lambda bi, i: (bi, 0, 0))
    row = pl.BlockSpec((1, k), lambda bi, i: (0, 0))
    outs = lambda r: [
        pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
        pl.BlockSpec((1, 1, bm), lambda bi, i: (bi, 0, i)),
        pl.BlockSpec((1, bm, r), lambda bi, i: (bi, i, 0)),
    ]
    shapes = lambda r: [
        jax.ShapeDtypeStruct((b, s, k), jnp.int8),
        jax.ShapeDtypeStruct((b, 1, s), jnp.float32),
        jax.ShapeDtypeStruct((b, s, r), jnp.float32),
    ]
    qa, sa, laa, qb, sb, lab = pl.pallas_call(
        functools.partial(_ln_mod_quant2_kernel, eps=eps),
        grid=(b, s // bm),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, i: (bi, i, 0)),
            vec, vec, row,
            pl.BlockSpec((k, r1), lambda bi, i: (0, 0)),
            row,
            pl.BlockSpec((k, r2), lambda bi, i: (0, 0)),
        ],
        out_specs=outs(r1) + outs(r2),
        out_shape=shapes(r1) + shapes(r2),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * k * (r1 + r2) + 12 * b * s * k,
            bytes_accessed=x.nbytes + 2 * b * s * k,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, mod_scale.reshape(b, 1, k), mod_shift.reshape(b, 1, k),
      ra, proj_down_a.astype(jnp.bfloat16), rb, proj_down_b.astype(jnp.bfloat16))
    m = b * s
    return (
        (qa.reshape(m, k), sa.reshape(1, m), laa.reshape(m, r1)),
        (qb.reshape(m, k), sb.reshape(1, m), lab.reshape(m, r2)),
    )
