"""16-bit reference twin of a quantized model (golden-test support).

The reference's quality contract compares quantized generations against a
16-bit model via LPIPS (/root/reference/tests/v1/flux/test_flux1_dev.py:
20-135). ``dequantized_twin(model)`` produces an *exact infinite-precision-
activation* twin of a loaded quantized graph: every ``SVDQW4A4Linear`` /
``AWQW4A16Linear`` is replaced by a plain ``Linear`` whose weight is the
mathematically-dequantized effective weight

    W_eff = diag(1/smooth) @ dequant(qweight, scales) + proj_down @ proj_up

so the only difference between twin and engine output is the *activation*
quantization (+ kernel arithmetic) — precisely what golden tests must bound.
For layers loaded from an int4 checkpoint with ``act_unsigned`` (the GELU
+0.171875 shift, gemm_w4a4_launch_impl.cuh:286) the constant shift term
``GELU_SHIFT * sum_k(Wq_eff[k, :])`` is folded into the bias (the low-rank
branch sees the *unshifted* activation, matching ops/quantize.py ordering).

Works on stacked (scan-axis) modules: all dequant math is vectorized over
leading axes.
"""

from __future__ import annotations

import copy

import jax.numpy as jnp

from ..core.packing import unpack_int4
from ..ops.reference import GELU_SHIFT, GROUP_FP4, GROUP_INT4
from .linear import AWQW4A16Linear, Linear, SVDQW4A4Linear


def _dequant_e2m1(codes: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(codes.astype(jnp.int32))
    e = a >> 1
    m = (a & 1).astype(jnp.float32)
    mag = jnp.where(e == 0, 0.5 * m, (1.0 + 0.5 * m) * jnp.exp2((e - 1).astype(jnp.float32)))
    return jnp.where(codes < 0, -mag, mag)


def _svdq_weight(lin: SVDQW4A4Linear) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Effective (.., K, N) f32 weight + adjusted bias of one quantized linear."""
    ws = lin.wscales.astype(jnp.float32)
    if lin.precision == "int8":
        wq = lin.qweight.astype(jnp.float32) * ws  # (.., K, N) * (.., 1, N)
    else:
        vals = unpack_int4(lin.qweight, axis=-2).astype(jnp.float32)
        k = vals.shape[-2]
        if lin.precision == "w4a8":
            rs = lin.rescales.astype(jnp.float32)  # (.., K/G, N)
            g = k // rs.shape[-2]  # 64 for int4 codes, 16 for e2m1 (nvfp4-a8)
            rse = jnp.repeat(rs, g, axis=-2)
            w8 = jnp.clip(jnp.round(_vals_e(vals, lin) * rse), -127, 127)
            wq = w8 * ws  # per-channel (.., 1, N)
        else:
            g = GROUP_INT4 if lin.precision == "int4" else GROUP_FP4
            wse = jnp.repeat(ws, g, axis=-2)
            wq = _vals_e(vals, lin) * wse
    smooth = lin.smooth.astype(jnp.float32)
    wq = wq / smooth[..., :, None]
    w_eff = wq + jnp.matmul(
        lin.proj_down.astype(jnp.float32), lin.proj_up.astype(jnp.float32)
    )
    bias = None if lin.bias is None else lin.bias.astype(jnp.float32)
    if lin.act_unsigned:
        # quantized path sees x + GELU_SHIFT; low-rank path sees raw x
        shift_term = GELU_SHIFT * jnp.sum(wq, axis=-2)
        bias = shift_term if bias is None else bias + shift_term
    return w_eff, bias


def _vals_e(vals: jnp.ndarray, lin) -> jnp.ndarray:
    if lin.precision == "nvfp4" or getattr(lin, "wcodes", "int4") == "e2m1":
        return _dequant_e2m1(vals.astype(jnp.int8))
    return vals


def _awq_weight(lin: AWQW4A16Linear) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    q = unpack_int4(lin.qweight, axis=-2, unsigned=True).astype(jnp.float32)
    g = lin.group_size
    s = jnp.repeat(lin.wscales.astype(jnp.float32), g, axis=-2)
    z = jnp.repeat(lin.wzeros.astype(jnp.float32), g, axis=-2)
    w = q * s - z
    if lin.lora_down is not None:
        w = w + jnp.matmul(
            lin.lora_down.astype(jnp.float32), lin.lora_up.astype(jnp.float32)
        )
    bias = None if lin.bias is None else lin.bias.astype(jnp.float32)
    return w, bias


def _twin_linear(lin) -> Linear:
    if isinstance(lin, SVDQW4A4Linear):
        w, b = _svdq_weight(lin)
    elif isinstance(lin, AWQW4A16Linear):
        w, b = _awq_weight(lin)
    else:
        return lin
    out = Linear(
        w.astype(jnp.bfloat16), None if b is None else b.astype(jnp.bfloat16)
    )
    # preserve logical (unpadded) dims if the source tracked them; padded
    # K rows hold zero codes/proj_down rows by construction, so slicing
    # them off is exact and lets the twin accept logical-dim activations
    lo = getattr(lin, "logical_out", None)
    if lo is not None and lo < w.shape[-1]:
        out.weight = out.weight[..., :lo]
        if out.bias is not None:
            out.bias = out.bias[..., :lo]
    li = getattr(lin, "logical_in", None)
    if li is not None and li < out.weight.shape[-2]:
        out.weight = out.weight[..., :li, :]
    return out


def dequantized_twin(model):
    """Deep-copied model with every quantized linear replaced by a bf16
    ``Linear`` carrying the exact dequantized effective weight."""
    twin = copy.deepcopy(model)
    for _, mod in twin.modules():
        for attr, child in list(vars(mod).items()):
            if isinstance(child, (SVDQW4A4Linear, AWQW4A16Linear)):
                setattr(mod, attr, _twin_linear(child))
    return twin
