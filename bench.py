"""Benchmark: FLUX.1-dev 1024px 50-step transformer latency on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): nunchaku INT4 on RTX 4090 — FLUX.1-schnell
30-step e2e = 6.50 s (tests/flux/test_flux_speed.py) scales to dev-50-step
~= 6.50 / 30 * 50 = 10.83 s/image. vs_baseline = baseline_sec / our_sec
(>1 means faster than the reference).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

BASELINE_DEV50_S = 6.50 / 30.0 * 50.0  # 10.83 s/image on RTX 4090


def main():
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from __graft_entry__ import _flux_inputs

    cfg = FluxConfig(precision="int8")  # int8-MXU turbo mode (SVDQuant checkpoints requantized at load)
    model = FluxTransformer2DModel.dummy_init(cfg)
    # turbo config: bf16 residual streams, matching the reference C++
    # engine's bf16 hidden states (src/FluxModel.cpp), plus the fused
    # attention prologue (head-gridded Pallas qkv_rope_producer)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)

    fwd = jax.jit(lambda m, *a: m(*a))
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force completion (warmup)

    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    per_step = (time.perf_counter() - t0) / steps
    sec_per_image = per_step * 50.0

    print(
        json.dumps(
            {
                "metric": "FLUX.1-dev 1024px 50-step sec/image (SVDQuant engine, int8-MXU mode, 1 chip)",
                "value": round(sec_per_image, 3),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_DEV50_S / sec_per_image, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
