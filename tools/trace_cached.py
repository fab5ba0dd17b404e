"""Device trace of the CACHED 50-step denoise program (the bench headline).

The step-level traces (trace_step.py) decompose a dense forward; this
captures the whole `_denoise_scanned` double-FB program at the bench's
forced 25/50 hit schedule, to attribute the cached-run time between miss
steps, hit steps, and any unconditional per-step work (indicator blocks,
dequant passes, state compares). Motivation (round 5): w4a8 cached e2e
measured 11.33 s vs int8's 9.16 s — only ~0.58 s of the delta is the
slower miss step; this names the rest.

  python tools/trace_cached.py [precision] [steps] [hit_ratio]   # w4a8 50 0.5

No T5 / VAE: `_denoise_scanned` is its own jit, so the program is the
same one bench.py runs (persistent-cache hit) and the trace isolates it.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else "w4a8"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    hit_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5

    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline

    cfg = FluxConfig(precision=precision)
    model = FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    pipe = FluxPipeline(model, vae=None)
    pe = jnp.zeros((1, 512, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((1, cfg.pooled_projection_dim), jnp.bfloat16)

    def run():
        out = pipe(
            prompt_embeds=pe, pooled_prompt_embeds=pooled,
            height=1024, width=1024, num_inference_steps=steps, seed=0,
            cache="double_fb", cache_hit_ratio=hit_ratio,
        )
        return (float(jnp.sum(out.latents.astype(jnp.float32))),
                int(out.cache_hits))

    _, hits = run()  # warmup/compile
    t0 = time.perf_counter()
    _, hits = run()
    wall = time.perf_counter() - t0
    print(f"cached denoise ({precision}, {steps} steps, {hits} hits): "
          f"{wall:.3f} s untraced", flush=True)

    logdir = f"/tmp/trace_cached_{precision}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    run()
    jax.profiler.stop_trace()

    from trace_step import summarize

    summarize(logdir, nsteps=1)


if __name__ == "__main__":
    main()
