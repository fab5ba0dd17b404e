"""Utilities (counterpart of nunchaku/utils.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_precision(precision: str = "auto", device=None) -> str:
    """Reference nunchaku/utils.py:189 chooses int4 vs fp4 by GPU SM.

    On TPU there is no fp4 hardware; the modes trade weight HBM for speed:

    ==========  ============  =====================================
    mode        weight HBM    notes
    ==========  ============  =====================================
    ``int8``    ~12.3 GB      fastest (int8 MXU end to end)
    ``w4a8``    ~6.8 GB       int4 weights rescaled in-VMEM to the
                              int8 MXU; ~1.45x slower than int8
    ``int4``    ~6.8 GB       checkpoint-parity dequant path; slowest
    ==========  ============  =====================================

    "auto" picks ``int8`` when the chip has headroom for it (>14 GB free
    HBM fits FLUX int8 + activations at 1024px) and ``w4a8`` otherwise.
    nvfp4 checkpoints remain loadable in any mode.
    """
    if precision == "auto":
        try:
            mem = get_device_memory(device)
            free = mem["bytes_limit"] - mem["bytes_in_use"]
        except Exception:  # noqa: BLE001 — CPU/virtual backends: no stats
            return "int8"
        if mem["bytes_limit"] == 0:  # backend without memory stats
            return "int8"
        return "int8" if free > 14 * 2**30 else "w4a8"
    assert precision in ("int4", "nvfp4", "int8", "w4a8")
    return precision


def get_device_memory(device=None) -> dict:
    """HBM stats of one chip (reference get_gpu_memory, utils.py:255)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
    }


def check_hardware_compatibility(quantization_config: dict, device=None) -> None:
    """Reference utils.py:288 validates precision vs GPU SM; on TPU every
    precision is emulatable, so only the config shape is validated."""
    w = quantization_config.get("weight", {}) if quantization_config else {}
    dtype = str(w.get("dtype", "int4"))
    if not any(t in dtype for t in ("int4", "fp4", "sint4")):
        raise ValueError(f"unsupported quantized dtype {dtype!r}")


def pad_tensor(x: jnp.ndarray, multiple: int, axis: int = 0, value=0):
    """Pad one axis up to a multiple (reference utils.py:17)."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)
