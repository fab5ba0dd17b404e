import sys, time, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nunchaku_tpu.models.transformers.transformer_flux import FluxConfig, FluxTransformer2DModel
from nunchaku_tpu.pipeline.pipeline_flux import FluxPipeline
from nunchaku_tpu.utils import get_device_memory

for prec in ["int8", "int4"]:
    cfg = FluxConfig(precision=prec)
    model = FluxTransformer2DModel.dummy_init(cfg)
    pipe = FluxPipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 4096), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(3), (1, 768), jnp.bfloat16)

    def run(steps, cache=None, thresh=0.12):
        t0 = time.perf_counter()
        out = pipe(prompt_embeds=pe, pooled_prompt_embeds=pool, height=1024, width=1024,
                   num_inference_steps=steps, cache=cache, residual_diff_threshold=thresh,
                   single_residual_diff_threshold=thresh*0.75, seed=0)
        _ = float(jnp.sum(out.latents.astype(jnp.float32)))  # forced readback sync
        return time.perf_counter() - t0

    run(10)  # warm compile (scan loop compiles per step-count)
    base = run(10)
    mem = get_device_memory()
    print(f"[{prec}] 10-step uncached: {base:.2f}s  peak HBM {mem['peak_bytes_in_use']/1e9:.2f} GB")
    if prec == "int4":  # int8 weights ~12GB: double-FB cond branches OOM 16GB at 1024px
        run(10, cache="double_fb", thresh=1e9)
        forced = run(10, cache="double_fb", thresh=1e9)  # every step hits -> mechanical ceiling
        print(f"[{prec}] 10-step double-FB forced-hit: {forced:.2f}s ({base/forced:.2f}x ceiling)")
    del model, pipe
