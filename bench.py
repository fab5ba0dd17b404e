"""Benchmark: FLUX.1-dev 1024px 50-step serving latency on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baselines (BASELINE.json, like-for-like both ways):
- dense: nunchaku INT4 on RTX 4090 — FLUX.1-schnell 30-step e2e = 6.50 s
  (tests/flux/test_flux_speed.py) scales to dev-50-step ~= 10.83 s/image.
- cached: the reference ships the same first-block cache and claims 2x at
  50 steps (docs/source/usage/cache.rst:24) -> ~5.42 s/image cached.

Headline (round 5): the **w4a8 serving mode** — 4-bit weight memory
(7.67 GiB), int8 MXU compute — the mode that carries the reference's
identity claim (4-bit weights, README.md:74 / gemm_w4a4.cuh:832). Full
pipeline e2e (T5-XXL AWQ encode + 50 jitted transformer steps + tiled VAE
decode) with the double-FB cache at the reference's own claimed hit
pattern (25/50 hits via an explicit forced schedule; random sandbox
weights make the *threshold* decision degenerate, so the natural-threshold
line is recorded separately and flagged). value = MEDIAN of 3 runs
(reference's speed CI uses the mean over runs, test_flux_speed.py:64-74);
vs_baseline = cached-vs-cached (like-for-like). The dense-vs-dense ratio,
the int8-turbo and nvfp4-a8 ride-along modes, and one dequant-cache dial
point are recorded in the same JSON.

v5e physics note (README "Performance"): the int8 dense step floor on one
v5e is ~230 ms (weights 12.3 GiB/step at 819 GB/s + MXU flops); matching
the 4090's dense 10.83 s needs 216 ms/step — dense parity is below this
chip's bandwidth floor, which is why the honest dense_vs_dense sits ~0.7.

Modes: default = headline above; --dense = transformer-step metric only
(rounds 1-2 format); --full = dense e2e without cache.
"""

import gc
import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

BASELINE_DEV50_S = 6.50 / 30.0 * 50.0  # 10.83 s/image dense on RTX 4090
BASELINE_CACHED_S = BASELINE_DEV50_S / 2.0  # reference cache.rst:24: 2x


def _build(tiny: bool, with_encoders: bool = True, precision: str = "w4a8"):
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
        cfg = FluxConfig(precision=precision)
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
            # transformer + T5 on a 16 GiB chip; tiled decode measured
            # 0.35 s steady-state next to a 14 GiB ballast.
            vae.enable_tiling()
        dims = dict(size=1024, s_txt=512, steps=50, pooled_dim=768)
    pipe = FluxPipeline(model, vae=vae)
    return pipe, t5, cfg, dims


def _step_time(model, cfg, steps=10, B=1):
    from __graft_entry__ import _flux_inputs

    args = _flux_inputs(cfg, B=B, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # force completion (warmup)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(model, *args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def _weights_gib(model) -> float:
    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for _, a in model.named_parameters()
    ) / 2**30


def _fresh_transformer(precision: str):
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    cfg = FluxConfig(precision=precision)
    m = FluxTransformer2DModel.dummy_init(cfg)
    m.set_stream_dtype(jnp.bfloat16)
    m.enable_fused_qkv_prep()
    return m, cfg


def main():
    """Headline: w4a8 cached e2e, like-for-like ratios + ride-along modes."""
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
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(t5(ids).astype(jnp.float32)))  # encode in the timing
        run_cached()
        cached_runs.append(round(time.perf_counter() - t0, 3))
    cached_sec = statistics.median(cached_runs)

    # natural-threshold trajectory: the SAME cached program with the
    # lax.cond *threshold* deciding (no forced schedule). On random sandbox
    # weights the decision is DEGENERATE (~49/50 hits — residuals of an
    # untrained model barely move); flagged in the JSON so it is not read
    # as a representative number. The threshold logic itself is validated
    # on an engineered non-degenerate trajectory in
    # tests/test_pipeline_caching.py.
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

    dense_step = None if tiny else _step_time(pipe.transformer, cfg)
    weights_gib = _weights_gib(pipe.transformer)

    rec = {
        "metric": (
            f"FLUX.1-dev {d['size']}px {d['steps']}-step e2e sec/image"
            " (w4a8 serving mode: 4-bit weight memory + int8 MXU; T5-XXL"
            " AWQ + transformer + tiled VAE; double-FB cache at the"
            f" reference's 2x hit pattern: forced {hits[0]}/{d['steps']}"
            " hits, 1 chip)"
        ),
        "value": round(cached_sec, 3),
        "unit": "s/image",
        # like-for-like: our cached vs the reference's own cached claim
        # (2x at 50 steps, docs/source/usage/cache.rst:24)
        "vs_baseline": round(BASELINE_CACHED_S / cached_sec, 4),
        "baseline_dense_s": round(BASELINE_DEV50_S, 3),
        "baseline_cached_s": round(BASELINE_CACHED_S, 3),
        "cached_vs_cached": round(BASELINE_CACHED_S / cached_sec, 4),
        "cached_vs_dense_baseline": round(BASELINE_DEV50_S / cached_sec, 4),
        "cache_hits": hits[0],
        "forced_hit_ratio": 0.5,
        "cached_runs_s": cached_runs,  # all runs; value = median
        "natural_s_per_image": round(natural_sec, 3),
        "natural_cache_hits": nat_hits[0],
        "natural_threshold": 0.12,
        # random-weight artifact: ~49/50 hits because an untrained model's
        # residuals barely move — NOT a representative serving number
        "natural_degenerate": True,
        "transformer_weights_gib": round(weights_gib, 2),
    }
    if peak > 0:  # axon tunnel: memory_stats() is None — omit rather than 0
        rec["peak_hbm_gib"] = round(peak, 2)
    if dense_step is not None:
        rec["dense_step_s"] = round(dense_step, 4)
        rec["dense_s_per_image"] = round(dense_step * 50.0, 3)
        rec["dense_vs_dense"] = round(
            BASELINE_DEV50_S / (dense_step * 50.0), 4)
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

        # ---- ride-along modes (one at a time on the 16 GiB chip) ----
        # run_cached/run_natural close over pipe — drop them too or the
        # closure cells keep the w4a8 weights alive; t5 (T5-XXL AWQ,
        # ~2.4 GiB) must go too or the 12.3 GiB int8 build OOMs
        del pipe, ma, args, run_cached, run_natural, t5
        gc.collect()

        # int8 turbo (12.3 GiB weights): the speed ceiling the dial reaches
        m8, cfg8 = _fresh_transformer("int8")
        int8_step = _step_time(m8, cfg8)
        rec["int8_step_s"] = round(int8_step, 4)
        rec["int8_s_per_image"] = round(int8_step * 50.0, 3)
        rec["int8_weights_gib"] = round(_weights_gib(m8), 2)
        rec["w4a8_vs_int8"] = round(dense_step / int8_step, 3)
        del m8
        gc.collect()

        # nvfp4-a8 (e2m1-coded w4a8): nvfp4 checkpoints on the same
        # dequant-pass + int8-kernel route (was 1025.8 ms on the in-kernel
        # decode route in round 4)
        mf, cfgf = _fresh_transformer("nvfp4-a8")
        f_step = _step_time(mf, cfgf)
        rec["nvfp4a8_step_s"] = round(f_step, 4)
        rec["nvfp4a8_s_per_image"] = round(f_step * 50.0, 3)
        rec["nvfp4a8_weights_gib"] = round(_weights_gib(mf), 2)
        del mf
        gc.collect()

        # dequant-cache dial, one point: +4 GiB of resident int8 copies
        # (models/requantize.w4a8_cache_dequant — the explicit memory/speed
        # trade between 4-bit residency and the int8 ceiling)
        from nunchaku_tpu.models.requantize import w4a8_cache_dequant

        md, cfgd = _fresh_transformer("w4a8")
        md = w4a8_cache_dequant(md, 4.0, inplace=True)
        gc.collect()
        d_step = _step_time(md, cfgd)
        rec["w4a8_dial4_step_s"] = round(d_step, 4)
        rec["w4a8_dial4_weights_gib"] = round(_weights_gib(md), 2)
        del md
        gc.collect()
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
        "metric": "FLUX.1-dev 1024px 50-step e2e sec/image (T5 + w4a8 transformer + VAE, 1 chip)",
        "value": round(sec, 3), "unit": "s/image",
        "vs_baseline": round(BASELINE_DEV50_S / sec, 4),
    }
    if peak > 0:
        rec["peak_hbm_gib"] = round(peak, 2)
    print(json.dumps(rec))


def main_dense():
    """Transformer-step metric (rounds 1-2 recorded format, int8 turbo)."""
    pipe, _, cfg, _ = _build(tiny=False, with_encoders=False, precision="int8")
    per_step = _step_time(pipe.transformer, cfg)
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
