"""Measure FLUX dense step time for a list of serving modes, one at a time
(the 16 GiB chip can't hold two full models).

  python tools/bench_modes.py w4a8 nvfp4-a8 int8 dial2 dial4 dialfull

Modes: int8 | w4a8 | nvfp4-a8 | int4 | nvfp4 | dial<G> (w4a8 +
w4a8_cache_dequant with G GiB of resident int8 copies; dialfull = 16).
Prints one line per mode: step ms, dev-50step s, weights GiB.
"""

import gc
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def measure(mode: str, nsteps: int = 10, B: int = 1):
    from __graft_entry__ import _flux_inputs
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    prec = "w4a8" if mode.startswith("dial") else mode
    cfg = FluxConfig(precision=prec)
    model = FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    if mode.startswith("dial"):
        from nunchaku_tpu.models.requantize import w4a8_cache_dequant

        gib = 16.0 if mode == "dialfull" else float(mode[4:])
        model = w4a8_cache_dequant(model, gib, inplace=True)
        gc.collect()
    args = _flux_inputs(cfg, B=B, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    t0 = time.time()
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{mode}] compile+first: {time.time() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / nsteps
    w = sum(int(np.prod(a.shape)) * a.dtype.itemsize
            for _, a in model.named_parameters()) / 2**30
    print(
        f"[{mode}] B={B} step {dt * 1e3:.1f} ms -> dev-50step {dt * 50:.2f} s"
        f"  weights {w:.2f} GiB  vs_baseline {10.83 / (dt * 50):.3f}",
        flush=True,
    )
    del model, args, out, fwd
    gc.collect()
    return dt


if __name__ == "__main__":
    modes = [a for a in sys.argv[1:] if not a.startswith("-")] or ["w4a8"]
    B = 1
    for a in sys.argv[1:]:
        if a.startswith("-B"):
            B = int(a[2:])
    for mo in modes:
        measure(mo, B=B)
