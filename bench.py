"""Benchmark: FLUX.1-dev 1024px 50-step serving latency on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baseline (BASELINE.json): nunchaku INT4 on RTX 4090 — FLUX.1-schnell
30-step e2e = 6.50 s (tests/flux/test_flux_speed.py) scales to dev-50-step
~= 6.50 / 30 * 50 = 10.83 s/image. vs_baseline = baseline_sec / our_sec
(>1 means faster than the reference).

Headline: full-pipeline e2e (T5-XXL AWQ encode + 50 jitted transformer
steps + VAE decode) with the double-FB cache running the reference's own
claimed hit pattern — 2x at 50 steps (docs/source/usage/cache.rst:24) ==
25 hits — via an explicit forced schedule (caching/fbcache.py
make_hit_schedule). Random sandbox weights make the *threshold* decision
degenerate (49/50 hits measured — residuals of an untrained model barely
move), so the schedule states the hit count instead of pretending the
threshold produced it; every hit executes the real replay compute (embed +
block-0 + cached residuals + head). The dense step time and dense s/image
ride along in the same JSON so the no-cache mode stays recorded.

Modes: default = headline above; --dense = transformer-step metric only
(rounds 1-2 format); --full = dense e2e without cache.
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


def _build(tiny: bool, with_encoders: bool = True):
    from nunchaku_tpu.models.autoencoder import AutoencoderKL
    from nunchaku_tpu.models.text_encoders.t5 import T5EncoderModel
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

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
        dims = dict(size=128, s_txt=64, steps=2, pooled_dim=256)
    else:
        cfg = FluxConfig(precision="int8")
        model = FluxTransformer2DModel.dummy_init(cfg)
        # turbo serving config: bf16 residual streams (the reference C++
        # engine's own contract, src/FluxModel.cpp) + fused qkv prologue
        model.set_stream_dtype(jnp.bfloat16)
        model.enable_fused_qkv_prep()
        t5 = None
        if with_encoders:
            # T5-XXL shapes, 4-bit AWQ like the reference's quantized encoder
            t5 = T5EncoderModel.random_init(
                jax.random.PRNGKey(0), d_model=4096, d_ff=10240, d_kv=64,
                heads=64, layers=24, quantized=True,
            )
        vae = AutoencoderKL.random_init(jax.random.PRNGKey(1)) if with_encoders else None
        if vae is not None:
            # 512px-tile decode (diffusers enable_vae_tiling): the whole-
            # image 1024px decode cannot compile/fit beside the resident
            # transformer + T5 (~14.5 GiB) on a 16 GiB chip; tiled decode
            # measured 0.35 s steady-state next to a 14 GiB ballast.
            vae.enable_tiling()
        dims = dict(size=1024, s_txt=512, steps=50, pooled_dim=768)
    pipe = FluxPipeline(model, vae=vae)
    return pipe, t5, cfg, dims


def _dense_step_time(pipe, cfg, steps=10):
    from __graft_entry__ import _flux_inputs

    args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    out = fwd(pipe.transformer, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force completion (warmup)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(pipe.transformer, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    """Headline: cached e2e at the reference's 2x hit pattern + dense stats."""
    tiny = os.environ.get("NUNCHAKU_BENCH_TINY") == "1"  # CPU smoke config
    pipe, t5, cfg, d = _build(tiny)
    ids = jnp.ones((1, d["s_txt"]), jnp.int32)
    pe = t5(ids).astype(jnp.bfloat16)
    pooled = jnp.zeros((1, d["pooled_dim"]), jnp.bfloat16)

    hits = [0]

    def run_cached():
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pooled,
            height=d["size"], width=d["size"],
            num_inference_steps=d["steps"], seed=0,
            cache="double_fb", cache_hit_ratio=0.5,
        )
        hits[0] = int(out.cache_hits)
        return float(jnp.sum(out.images.astype(jnp.float32)))

    run_cached()  # warmup/compile
    cached_runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(jnp.sum(t5(ids).astype(jnp.float32)))  # encode in the timing
        run_cached()
        cached_runs.append(round(time.perf_counter() - t0, 3))
    cached_sec = min(cached_runs)

    # natural-threshold trajectory: the SAME cached program with the
    # lax.cond *threshold* deciding (no forced schedule). On random sandbox
    # weights the decision is degenerate (~49/50 hits — residuals of an
    # untrained model barely move); recorded with its own hit count so the
    # threshold-driven path has an auditable e2e number beside the forced
    # one (the threshold logic itself is validated on an engineered
    # non-degenerate trajectory in tests/test_pipeline_caching.py).
    nat_hits = [0]

    def run_natural():
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pooled,
            height=d["size"], width=d["size"],
            num_inference_steps=d["steps"], seed=0,
            cache="double_fb", residual_diff_threshold=0.12,
            single_residual_diff_threshold=0.09,
        )
        nat_hits[0] = int(out.cache_hits)
        return float(jnp.sum(out.images.astype(jnp.float32)))

    run_natural()  # warmup/compile
    t0 = time.perf_counter()
    _ = float(jnp.sum(t5(ids).astype(jnp.float32)))
    run_natural()
    natural_sec = time.perf_counter() - t0

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30

    dense_step = None if tiny else _dense_step_time(pipe, cfg)

    weights_gib = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for _, a in pipe.transformer.named_parameters()
    ) / 2**30
    rec = {
        "metric": (
            f"FLUX.1-dev {d['size']}px {d['steps']}-step e2e sec/image"
            " (T5-XXL AWQ + transformer + VAE, int8-MXU turbo, double-FB"
            f" cache at the reference's 2x hit pattern: forced"
            f" {hits[0]}/{d['steps']} hits, 1 chip)"
        ),
        "value": round(cached_sec, 3),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_DEV50_S / cached_sec, 4),
        "cache_hits": hits[0],
        "forced_hit_ratio": 0.5,
        # run-to-run spread of the headline (min reported as value):
        # recorded so two rounds' numbers can be compared with variance
        # in view (round-3 recorded 9.596 then 9.0 on different days)
        "cached_runs_s": cached_runs,
        "natural_s_per_image": round(natural_sec, 3),
        "natural_cache_hits": nat_hits[0],
        "natural_threshold": 0.12,
        "transformer_weights_gib": round(weights_gib, 2),
    }
    if peak > 0:  # axon tunnel: memory_stats() is None — omit rather than 0
        rec["peak_hbm_gib"] = round(peak, 2)
    if not tiny:
        # compile-time peak HBM (arguments + outputs + temps + code) of the
        # dense step — the contract the reference asserts with
        # max_memory_reserved (tests/flux/test_flux_memory.py:10-46); the
        # tunnel has no runtime memory_stats, the compiled executable's
        # buffer-assignment totals are available everywhere
        from __graft_entry__ import _flux_inputs

        args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
        ma = (jax.jit(lambda m, *a: m(*a))
              .lower(pipe.transformer, *args).compile().memory_analysis())
        rec["dense_peak_hbm_gib"] = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes) / 2**30, 3)

        # the 4-bit-weight-memory serving mode rides along: free the int8
        # weights first (12.3 + 7.7 GiB don't coexist on a 16 GiB chip)
        import gc

        from nunchaku_tpu.models.transformers.transformer_flux import (
            FluxConfig,
            FluxTransformer2DModel,
        )

        # run_cached/run_natural close over pipe — drop them too or the
        # closure cells keep the 12.3 GiB int8 weights alive
        del pipe, ma, args, run_cached, run_natural
        gc.collect()
        cfg8 = FluxConfig(precision="w4a8")
        m8 = FluxTransformer2DModel.dummy_init(cfg8)
        m8.set_stream_dtype(jnp.bfloat16)
        m8.enable_fused_qkv_prep()
        args8 = _flux_inputs(cfg8, B=1, S_img=4096, S_txt=512)
        fwd8 = jax.jit(lambda m, *a: m(*a))
        out8 = fwd8(m8, *args8)
        _ = float(jnp.sum(out8.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10):
            out8 = fwd8(m8, *args8)
        _ = float(jnp.sum(out8.astype(jnp.float32)))
        w4a8_step = (time.perf_counter() - t0) / 10
        rec["w4a8_step_s"] = round(w4a8_step, 4)
        rec["w4a8_s_per_image"] = round(w4a8_step * 50.0, 3)
        rec["w4a8_vs_baseline"] = round(
            BASELINE_DEV50_S / (w4a8_step * 50.0), 4)
        w4a8_w = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for _, a in m8.named_parameters()
        ) / 2**30
        rec["w4a8_weights_gib"] = round(w4a8_w, 2)
    if dense_step is not None:
        rec["dense_step_s"] = round(dense_step, 4)
        rec["dense_s_per_image"] = round(dense_step * 50.0, 3)
        rec["dense_vs_baseline"] = round(BASELINE_DEV50_S / (dense_step * 50.0), 4)
    print(json.dumps(rec))


def main_full():
    """Dense (no-cache) e2e: T5 encode + 50 jitted transformer steps + VAE
    decode, plus the peak-HBM figure — the same scope as the baseline's
    tests/flux/test_flux_speed.py / test_flux_memory.py numbers."""
    tiny = os.environ.get("NUNCHAKU_BENCH_TINY") == "1"
    pipe, t5, cfg, d = _build(tiny)
    ids = jnp.ones((1, d["s_txt"]), jnp.int32)
    pe = t5(ids).astype(jnp.bfloat16)
    pooled = jnp.zeros((1, d["pooled_dim"]), jnp.bfloat16)

    def run():
        out = pipe(prompt_embeds=pe, pooled_prompt_embeds=pooled,
                   height=d["size"], width=d["size"],
                   num_inference_steps=d["steps"], seed=0)
        return float(jnp.sum(out.images.astype(jnp.float32)))

    run()  # warmup/compile
    t0 = time.perf_counter()
    _ = float(jnp.sum(t5(ids).astype(jnp.float32)))  # encode in the timing
    run()
    sec = time.perf_counter() - t0
    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
    rec = {
        "metric": "FLUX.1-dev 1024px 50-step e2e sec/image (T5 + transformer + VAE, int8-MXU, 1 chip)",
        "value": round(sec, 3), "unit": "s/image",
        "vs_baseline": round(BASELINE_DEV50_S / sec, 4),
    }
    if peak > 0:
        rec["peak_hbm_gib"] = round(peak, 2)
    print(json.dumps(rec))


def main_dense():
    """Transformer-step metric (rounds 1-2 recorded format)."""
    pipe, _, cfg, _ = _build(tiny=False, with_encoders=False)
    per_step = _dense_step_time(pipe, cfg)
    sec_per_image = per_step * 50.0
    print(json.dumps({
        "metric": "FLUX.1-dev 1024px 50-step sec/image (SVDQuant engine, int8-MXU mode, 1 chip)",
        "value": round(sec_per_image, 3),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_DEV50_S / sec_per_image, 4),
    }))


if __name__ == "__main__":
    import sys

    if "--full" in sys.argv:
        main_full()
    elif "--dense" in sys.argv:
        main_dense()
    else:
        main()
