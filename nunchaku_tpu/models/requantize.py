"""In-memory precision conversion of quantized linears / whole models.

The int8 turbo and w4a8 serving modes re-round the checkpoint's 4-bit
residual weights to per-channel int8 (loader.py _decode_svdq:89-126 does
this from checkpoint tensors at load). This module applies the *same math*
to an already-built model, so tests and tools can isolate the quality cost
of that re-rounding: ``dequantized_twin(requantize_model(m, "int8"))`` vs
``dequantized_twin(m)`` differ ONLY by the weight re-rounding (no
activation quantization in either), which is exactly the error the
reference's LPIPS tables cannot see (they compare one quantized mode to
bf16: /root/reference/tests/v1/flux/test_flux1_dev.py:66-135).

Works on stacked (scan-axis) modules: all math is vectorized over leading
axes, mirroring bf16_ref.py.
"""

from __future__ import annotations

import copy

import jax.numpy as jnp

from ..core.packing import unpack_int4
from .bf16_ref import _dequant_e2m1
from .linear import SVDQW4A4Linear


def requantize_svdq(lin: SVDQW4A4Linear, out_precision: str) -> SVDQW4A4Linear:
    """Convert an int4/nvfp4 SVDQ linear to the int8 or w4a8 serving mode.

    Same math as the loader (loader.py _decode_svdq): int8 dequantizes the
    group-scaled 4-bit residual and re-rounds to per-channel int8; w4a8
    keeps the packed int4 codes and adds the per-channel int8 scale +
    per-group rescale factors the kernel re-rounds with in VMEM
    (ops/gemm.py _gemm_w4a8_kernel — numerically identical to the int8
    re-round, at 4-bit weight memory)."""
    if lin.precision == out_precision:
        return lin
    if lin.precision not in ("int4", "nvfp4"):
        raise ValueError(f"cannot requantize from {lin.precision}")

    ws = lin.wscales.astype(jnp.float32)  # (.., K/G, N)

    if out_precision == "w4a8":
        # nvfp4 source keeps the packed e2m1 codes (wcodes="e2m1", the
        # nvfp4-a8 serving mode): the dequant pass decodes the fp4 grid
        # (max |value| 6.0 vs int4's 7) before the rescale, so the
        # per-channel int8 scale bound uses 6.0 and the fp8-e4m3 group
        # scales (already folded into wscales by the loader) ride the
        # rescale factors — same ladder trick as int4 w4a8 (499 -> 331 ms)
        cmax = 6.0 if lin.precision == "nvfp4" else 7.0
        s8 = jnp.maximum(
            jnp.max(ws, axis=-2, keepdims=True) * (cmax / 127.0), 1e-12
        )  # (.., 1, N)
        new = SVDQW4A4Linear(
            lin.qweight,
            s8.astype(jnp.float32),
            lin.smooth,
            lin.proj_down,
            lin.proj_up,
            lin.bias,
            rescales=(ws / s8).astype(jnp.bfloat16),
            precision="w4a8",
            act_unsigned=lin.act_unsigned,
            wcodes="e2m1" if lin.precision == "nvfp4" else "int4",
        )
    elif out_precision == "int8":
        vals = unpack_int4(lin.qweight, axis=-2).astype(jnp.float32)
        if lin.precision == "nvfp4":
            vals = _dequant_e2m1(vals.astype(jnp.int8))
        g = vals.shape[-2] // ws.shape[-2]
        w_deq = vals * jnp.repeat(ws, g, axis=-2)  # (.., K, N)
        absmax = jnp.max(jnp.abs(w_deq), axis=-2, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        q8 = jnp.clip(jnp.round(w_deq / scale), -127, 127).astype(jnp.int8)
        new = SVDQW4A4Linear(
            q8,
            scale.astype(jnp.float32),
            lin.smooth,
            lin.proj_down,
            lin.proj_up,
            lin.bias,
            precision="int8",
            act_unsigned=lin.act_unsigned,
        )
    else:
        raise ValueError(f"unsupported target precision {out_precision}")
    new.logical_in = lin.logical_in
    new.logical_out = lin.logical_out
    return new


def requantize_model(model, out_precision: str):
    """Deep-copied model with every 4-bit SVDQ linear converted to
    ``out_precision`` (int8 linears and AWQ modulation linears are left
    as-is, matching the loader's per-module handling)."""
    new = copy.deepcopy(model)
    for _, mod in new.modules():
        for attr, child in list(vars(mod).items()):
            if isinstance(child, SVDQW4A4Linear) and child.precision in (
                "int4",
                "nvfp4",
            ):
                setattr(mod, attr, requantize_svdq(child, out_precision))
    cfg = getattr(new, "cfg", None)
    if cfg is not None and hasattr(cfg, "precision"):
        try:
            cfg.precision = out_precision
        except AttributeError:
            pass  # frozen config: modules carry their own precision
    return new
