"""Qwen-Image loader tests: synthesized v2 checkpoint -> load -> forward."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.utils import nunchaku_format as NF
from nunchaku_tpu.utils.safetensors import save_safetensors

DIM, HEADS, HD, TXT, LAYERS = 512, 4, 128, 448, 2
RANK = 16


def _svdq_v2(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    vals = r.integers(-8, 8, (n, k)).astype(np.int8)
    ws = r.random((k // 64, n)).astype(np.float32) * 0.01 + 0.001
    return {
        f"{key}.qweight": NF.pack_weight_int4(vals),
        f"{key}.wscales": NF.pack_scale_ref(ws).astype(ml_dtypes.bfloat16),
        f"{key}.smooth_factor": (r.random(k).astype(np.float32) + 0.5).astype(ml_dtypes.bfloat16),
        f"{key}.proj_down": (r.standard_normal((k, RANK)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{key}.proj_up": (r.standard_normal((n, RANK)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{key}.bias": (r.standard_normal(n) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _awq(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    codes = r.integers(0, 16, (n, k)).astype(np.int8)
    return {
        f"{key}.qweight": NF.pack_awq_gemv(codes),
        f"{key}.wscales": (r.random((k // 64, n)).astype(np.float32) * 0.01).astype(ml_dtypes.bfloat16),
        f"{key}.wzeros": (r.standard_normal((k // 64, n)).astype(np.float32) * 0.01).astype(ml_dtypes.bfloat16),
        f"{key}.bias": (r.standard_normal(n) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _lin(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {
        f"{key}.weight": (r.standard_normal((n, k)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{key}.bias": (r.standard_normal(n) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _norm(key, d, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {f"{key}.weight": (r.random(d).astype(np.float32) + 0.5).astype(ml_dtypes.bfloat16)}


def _build_ckpt(tmp_path):
    t = {}
    for i in range(LAYERS):
        p = f"transformer_blocks.{i}"
        t |= _svdq_v2(f"{p}.attn.to_qkv", DIM, 3 * DIM, 10 + i)
        t |= _svdq_v2(f"{p}.attn.to_out.0", DIM, DIM, 20 + i)
        t |= _svdq_v2(f"{p}.attn.add_qkv_proj", DIM, 3 * DIM, 30 + i)
        t |= _svdq_v2(f"{p}.attn.to_add_out", DIM, DIM, 40 + i)
        for nm, sd in [("norm_q", 50), ("norm_k", 51), ("norm_added_q", 52), ("norm_added_k", 53)]:
            t |= _norm(f"{p}.attn.{nm}", HD, sd + i)
        t |= _awq(f"{p}.img_mod.1", DIM, 6 * DIM, 60 + i)
        t |= _awq(f"{p}.txt_mod.1", DIM, 6 * DIM, 70 + i)
        t |= _svdq_v2(f"{p}.img_mlp.net.0.proj", DIM, 4 * DIM, 80 + i)
        t |= _svdq_v2(f"{p}.img_mlp.net.2", 4 * DIM, DIM, 90 + i)
        t |= _svdq_v2(f"{p}.txt_mlp.net.0.proj", DIM, 4 * DIM, 100 + i)
        t |= _svdq_v2(f"{p}.txt_mlp.net.2", 4 * DIM, DIM, 110 + i)
    t |= _lin("img_in", 64, DIM, 1)
    t |= _lin("txt_in", TXT, DIM, 2)
    t |= _norm("txt_norm", TXT, 3)
    t |= _lin("time_text_embed.timestep_embedder.linear_1", 256, DIM, 4)
    t |= _lin("time_text_embed.timestep_embedder.linear_2", DIM, DIM, 5)
    t |= _lin("norm_out.linear", DIM, 2 * DIM, 6)
    t |= _lin("proj_out", DIM, 64, 7)
    config = {
        "num_layers": LAYERS, "attention_head_dim": HD, "num_attention_heads": HEADS,
        "joint_attention_dim": TXT, "in_channels": 64, "out_channels": 16,
        "axes_dims_rope": [16, 56, 56],
    }
    qcfg = {"weight": {"dtype": "int4", "group_size": 64}, "rank": RANK}
    path = tmp_path / "qwen-tiny.safetensors"
    save_safetensors(path, t, {"config": json.dumps(config),
                               "quantization_config": json.dumps(qcfg)})
    return path


@pytest.mark.parametrize("precision", [None, "int8", "w4a8"])
def test_qwen_load_and_run(tmp_path, precision):
    from nunchaku_tpu.models.transformers.loader_qwenimage import load_qwenimage_transformer

    path = _build_ckpt(tmp_path)
    model = load_qwenimage_transformer(path, precision=precision)
    assert model.cfg.num_layers == LAYERS and model.cfg.dim == DIM
    assert model.txt_norm is not None
    B, S_img, S_txt = 1, 256, 64
    ii = np.zeros((S_img, 3), np.int32)
    ii[:, 1] = np.arange(S_img) // 16
    ii[:, 2] = np.arange(S_img) % 16
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, TXT), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
        jnp.asarray(ii),
    )
    assert out.shape == (B, S_img, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_qwen_pipeline_runs(tmp_path):
    """QwenImagePipeline: CFG path + lightning preset both produce finite
    latents; CFG changes the result vs no-CFG."""
    from nunchaku_tpu.models.transformers.loader_qwenimage import load_qwenimage_transformer
    from nunchaku_tpu.pipeline.pipeline_qwenimage import QwenImagePipeline

    path = _build_ckpt(tmp_path)
    model = load_qwenimage_transformer(path)
    pipe = QwenImagePipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(0), (1, 64, TXT), jnp.bfloat16)
    npe = jax.random.normal(jax.random.PRNGKey(1), (1, 64, TXT), jnp.bfloat16)
    out = pipe(pe, npe, height=128, width=128, num_inference_steps=2, true_cfg_scale=3.0)
    assert out.latents.shape == (1, 64, 64)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())
    base = pipe(pe, None, height=128, width=128, num_inference_steps=2)
    a = np.asarray(out.latents, np.float32)
    c = np.asarray(base.latents, np.float32)
    assert np.linalg.norm(a - c) / np.linalg.norm(c) > 1e-3
    lit = pipe(pe, height=128, width=128, lightning="lightning-4step")
    assert bool(jnp.isfinite(lit.latents.astype(jnp.float32)).all())
