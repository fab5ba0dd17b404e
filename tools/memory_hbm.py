"""Compile-time peak-HBM analysis per serving mode, via XLA's
``jit(step).lower(...).compile().memory_analysis()``.

Counterpart of the reference's memory contract
(/root/reference/tests/flux/test_flux_memory.py:10-46: ``torch.cuda.
max_memory_reserved`` asserted under 17/13/12/6 GiB across qencoder/offload
configs). The axon tunnel exposes no runtime ``memory_stats()``, but the
compiled executable's buffer-assignment totals (argument + output + temp +
generated-code bytes) are available and are an upper bound on what the
program itself can touch — arguments cover the resident weights, temps the
activation/fusion buffers XLA actually reserved.

Prints one JSON line per mode and (with --gate) exits non-zero when a mode
exceeds its budget:

  python tools/memory_hbm.py                 # measure dense int8/w4a8 + cached
  python tools/memory_hbm.py --gate          # enforce budgets
  python tools/memory_hbm.py --modes int8    # subset

Budgets (GiB, total = args+outputs+temps+code): chosen against the 16 GiB
v5e — int8 weights are ~12.3 GiB so the dense step must keep temps under
~2.7 GiB; w4a8 stores int4-packed weights (~6.9 GiB incl. embeds) and may
spend temps on per-layer dequant buffers; the cached step adds the FB-cache
state (5 bf16 stream-sized buffers, ~0.3 GiB).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

GIB = 2.0**30

# mode -> total-bytes budget (GiB). Regression gates, not aspirations:
# recorded totals + ~8% headroom.
BUDGETS = {
    "int8_dense": 15.0,
    "w4a8_dense": 10.0,
    "int4_dense": 10.0,
    "nvfp4a8_dense": 11.0,
    "int8_cached": 15.5,
    "int8_offload_resident": 8.0,
}


def _stats_record(mode, ma, extra=None):
    total = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.generated_code_size_in_bytes
        - ma.alias_size_in_bytes  # donated buffers double-count arg+out
    )
    rec = {
        "mode": mode,
        "argument_gib": round(ma.argument_size_in_bytes / GIB, 3),
        "output_gib": round(ma.output_size_in_bytes / GIB, 3),
        "temp_gib": round(ma.temp_size_in_bytes / GIB, 3),
        "alias_gib": round(ma.alias_size_in_bytes / GIB, 3),
        "total_gib": round(total / GIB, 3),
    }
    if extra:
        rec.update(extra)
    return rec


def _build(precision):
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    cfg = FluxConfig(precision=precision)
    model = FluxTransformer2DModel.dummy_init(cfg)
    model.set_stream_dtype(jnp.bfloat16)
    model.enable_fused_qkv_prep()
    return cfg, model


def dense_analysis(precision):
    from __graft_entry__ import _flux_inputs

    cfg, model = _build(precision)
    args = _flux_inputs(cfg, B=1, S_img=4096, S_txt=512)
    fwd = jax.jit(lambda m, *a: m(*a))
    return fwd.lower(model, *args).compile().memory_analysis()


def cached_analysis():
    """The real serving program: the full 50-step double-FB denoise scan
    (donated latent + cache state), as compiled by FluxPipeline."""
    from nunchaku_tpu.caching.fbcache import init_fb_state, make_hit_schedule
    from nunchaku_tpu.pipeline.pipeline_flux import (
        _denoise_scanned,
        flux_sigmas,
        make_img_ids,
    )

    cfg, model = _build("int8")
    b, s_img, s_txt, steps = 1, 4096, 512, 50
    lat0 = jnp.zeros((b, s_img, 64), jnp.float32)
    state = init_fb_state(b, s_img, s_txt, cfg.dim)
    pe = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pool = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
    g = jnp.full((b,), 3.5, jnp.float32)
    img_ids = make_img_ids(64, 64)
    txt_ids = jnp.zeros((s_txt, 3), jnp.int32)
    sigmas = flux_sigmas(steps, image_seq_len=s_img)
    sig_pairs = jnp.stack(
        [jnp.asarray(sigmas[:-1]), jnp.asarray(sigmas[1:])], axis=1
    )
    force = jnp.asarray(make_hit_schedule(steps, 0.5))
    lowered = _denoise_scanned.lower(
        model, lat0, state, pe, pool, g, None, None, img_ids, txt_ids,
        sig_pairs, None, None, force,
        cache_kind="double_fb", thresh=0.12, single_thresh=0.09,
        tea_thresh=0.6, num_steps=steps,
    )
    return lowered.compile().memory_analysis()


def offload_resident_analysis(lookahead=1):
    """Offloaded serving: a sound resident-HBM bound built from parts —
    resident params (embeds + head; the block stacks live in host RAM,
    utils/offload.py) + (lookahead+1) in-flight copies of the largest
    streamed block + the worst per-block program's temps + the streamed
    activations. Unlike the single-program modes there is no one executable
    to ask, so the bound sums the per-program compile-time figures without
    double-counting the shared model arguments."""
    import numpy as np

    from nunchaku_tpu.utils.offload import OffloadedFluxForward

    cfg, model = _build("int8")
    off = OffloadedFluxForward(model, lookahead=lookahead)
    b, s_img, s_txt = 1, 4096, 512
    hs = jnp.zeros((b, s_img, 64), jnp.bfloat16)
    pe = jnp.zeros((b, s_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pool = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids = make_ids(s_img)
    txt_ids = jnp.zeros((s_txt, 3), jnp.int32)
    g = jnp.full((b,), 3.5, jnp.float32)

    def nbytes(tree):
        return sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "shape")
        )

    m = off.model
    resident_params = nbytes(m)
    # stage the sample blocks onto the accelerator exactly like
    # _StreamedBlocks.run does at serve time — host_blocks are committed to
    # the CPU device, and lowering with CPU-resident args would compile the
    # per-block program for CPU (where the Pallas kernels only interpret)
    dev = jax.devices()[0]
    dual0 = jax.device_put(off.dual.host_blocks[0], dev)
    single0 = jax.device_put(off.single.host_blocks[0], dev)
    block_bytes = max(nbytes(dual0), nbytes(single0))

    img0, txt0, temb, rot = off._embed(m, hs, pe, pool, t, img_ids, txt_ids, g)
    emb = off._embed.lower(m, hs, pe, pool, t, img_ids, txt_ids, g).compile()
    dual = off._dual_fn.lower(dual0, (img0, txt0), temb, rot).compile()
    x1 = jnp.concatenate([txt0, img0], axis=1)
    single = off._single_fn.lower(single0, x1, temb, rot).compile()
    head = off._head.lower(m, img0, temb).compile()

    mas = [p.memory_analysis() for p in (emb, dual, single, head)]
    worst_temp = max(ma.temp_size_in_bytes for ma in mas)
    code = sum(ma.generated_code_size_in_bytes for ma in mas)
    acts = nbytes((img0, txt0, temb, rot)) * 2  # in + out of a block

    class MA:  # aggregate view in CompiledMemoryStats fields
        argument_size_in_bytes = (
            resident_params + (lookahead + 1) * block_bytes + acts
        )
        output_size_in_bytes = nbytes(hs)
        temp_size_in_bytes = worst_temp
        generated_code_size_in_bytes = code
        alias_size_in_bytes = 0

    return MA


def make_ids(s_img):
    import numpy as np

    side = int(np.sqrt(s_img))
    ii = np.zeros((s_img, 3), np.int32)
    ii[:, 1] = np.arange(s_img) // side
    ii[:, 2] = np.arange(s_img) % side
    return jnp.asarray(ii)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gate", action="store_true")
    p.add_argument("--modes", nargs="*", default=None,
                   help="subset of: int8 w4a8 int4 cached offload")
    args = p.parse_args()
    modes = args.modes or ["int8", "w4a8", "cached"]

    runners = {
        "int8": ("int8_dense", lambda: dense_analysis("int8")),
        "w4a8": ("w4a8_dense", lambda: dense_analysis("w4a8")),
        "int4": ("int4_dense", lambda: dense_analysis("int4")),
        "nvfp4-a8": ("nvfp4a8_dense", lambda: dense_analysis("nvfp4-a8")),
        "cached": ("int8_cached", cached_analysis),
        "offload": ("int8_offload_resident", offload_resident_analysis),
    }
    ok = True
    for key in modes:
        name, fn = runners[key]
        ma = fn()
        rec = _stats_record(name, ma, {"budget_gib": BUDGETS[name]})
        rec["ok"] = rec["total_gib"] <= BUDGETS[name]
        ok = ok and rec["ok"]
        print(json.dumps(rec), flush=True)
    if args.gate and not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
