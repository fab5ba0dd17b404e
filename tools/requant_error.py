"""Per-mode requantization error table (VERDICT round-2 item 6).

Quantifies what the int8 / w4a8 serving modes add on top of the int4
checkpoint: the loaders re-round the 4-bit residual weights to per-channel
int8 (loader.py _decode_svdq:89-126); no LPIPS table bounds that cost
because the reference only ever compares one quantized mode against bf16
(/root/reference/tests/v1/flux/test_flux1_dev.py:66-135).

Method: build an int4 FLUX model at full hidden dims (depth reduced so the
bf16 twins fit next to it in HBM), convert with requantize_model, and
compare:
  * twin(mode) vs twin(int4)   — weight re-rounding ONLY (no act quant)
  * engine(mode) vs twin(int4) — total serving error vs the parity contract
  * engine(int4) vs twin(int4) — the parity mode's own activation envelope

Prints one JSON line per mode. Run on the real chip:
    python tools/requant_error.py [--layers 4 --single-layers 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def rel(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--single-layers", type=int, default=8)
    p.add_argument("--s-img", type=int, default=1024)
    p.add_argument("--s-txt", type=int, default=512)
    args = p.parse_args()

    from nunchaku_tpu.models.bf16_ref import dequantized_twin
    from nunchaku_tpu.models.requantize import requantize_model
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    cfg = FluxConfig(
        num_layers=args.layers,
        num_single_layers=args.single_layers,
        precision="int4",
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    # checkpoint-realistic code range: deepcompressor int4 is symmetric
    # [-7, 7] (ops/reference.py quantize_weight); random_init's raw bytes
    # include -8s that hit the w4a8 clip and ~4x-overstate the error
    from nunchaku_tpu.core.packing import pack_int4, unpack_int4
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    for _, m in model.modules():
        if isinstance(m, SVDQW4A4Linear) and m.precision == "int4":
            codes = jnp.clip(unpack_int4(m.qweight, axis=-2), -7, 7)
            m.qweight = pack_int4(codes.astype(jnp.int8), axis=-2)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, args.s_img, 64), jnp.bfloat16)
    pe = jax.random.normal(
        jax.random.PRNGKey(2), (1, args.s_txt, cfg.joint_attention_dim), jnp.bfloat16
    )
    pool = jax.random.normal(
        jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim), jnp.bfloat16
    )
    side = int(args.s_img**0.5)
    iids = np.zeros((args.s_img, 3), np.int32)
    iids[:, 1] = np.arange(args.s_img) // side
    iids[:, 2] = np.arange(args.s_img) % side
    iids = jnp.asarray(iids)
    tids = jnp.zeros((args.s_txt, 3), jnp.int32)
    t = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 3.5, jnp.float32) if cfg.guidance_embeds else None

    fwd = jax.jit(lambda m: m(x, pe, pool, t, iids, tids, g))

    y_twin4 = np.asarray(fwd(dequantized_twin(model)), np.float32)
    y_eng4 = np.asarray(fwd(model), np.float32)
    rows = [
        {
            "mode": "int4",
            "weight_rounding_err": 0.0,
            "engine_vs_int4_twin": rel(y_eng4, y_twin4),
            "note": "parity mode (checkpoint-exact weights)",
        }
    ]
    for mode in ("int8", "w4a8"):
        m2 = requantize_model(model, mode)
        y_twin = np.asarray(fwd(dequantized_twin(m2)), np.float32)
        y_eng = np.asarray(fwd(m2), np.float32)
        rows.append(
            {
                "mode": mode,
                "weight_rounding_err": rel(y_twin, y_twin4),
                "engine_vs_int4_twin": rel(y_eng, y_twin4),
                "engine_vs_own_twin": rel(y_eng, y_twin),
            }
        )
        del m2
    meta = {
        "config": f"FLUX dims, {args.layers}+{args.single_layers} blocks, "
        f"S_img={args.s_img}, S_txt={args.s_txt}, random int4 weights",
        "metric": "relative L2 of the velocity output",
    }
    print(json.dumps({"meta": meta, "rows": rows}))


if __name__ == "__main__":
    main()
