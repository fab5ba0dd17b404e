"""SANA model tests: LiteLA numerics + tiny model forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.transformers.transformer_sana import (
    SanaConfig,
    SanaTransformer2DModel,
    lite_la,
)

TINY = SanaConfig(
    num_layers=2,
    num_attention_heads=8,  # dim 256
    num_cross_attention_heads=2,
    caption_channels=320,
    expand_ratio=2.0,
)


def test_lite_la_matches_naive():
    rng = np.random.default_rng(0)
    b, s, dim = 1, 64, 256
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * dim)), jnp.bfloat16)
    out = lite_la(qkv, dim)
    # naive per-head relu linear attention
    q, k, v = np.split(np.asarray(qkv, np.float32), 3, axis=-1)
    h, d = dim // 32, 32
    q = np.maximum(q.reshape(b, s, h, d), 0)
    k = np.maximum(k.reshape(b, s, h, d), 0)
    v = v.reshape(b, s, h, d)
    ref = np.zeros_like(v)
    for bi in range(b):
        for hi in range(h):
            vk = k[bi, :, hi].T @ v[bi, :, hi]  # (d, d)
            ks = k[bi, :, hi].sum(0)  # (d,)
            num = q[bi, :, hi] @ vk
            den = q[bi, :, hi] @ ks + 1e-15
            ref[bi, :, hi] = num / den[:, None]
    ref = ref.reshape(b, s, dim)
    err = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err


@pytest.fixture(scope="module")
def model():
    return SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), TINY)


def test_forward(model):
    b, side = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, side * side, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 48, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    out = jax.jit(lambda m, *a: m(*a))(model, x, cond, t)
    assert out.shape == (b, side * side, 32)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_forward_with_cond_mask(model):
    b, side = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, side * side, 32), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 48, 320), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    mask = jnp.arange(48)[None, :] < 30
    f = jax.jit(lambda m, *a, **k: m(*a, **k))
    out = f(model, x, cond, t, cond_mask=mask)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    # masking out padded tokens must differ from attending to them
    out_full = f(model, x, cond, t)
    assert not np.allclose(
        np.asarray(out, np.float32), np.asarray(out_full, np.float32), atol=1e-3
    )


def test_odd_dim_padding():
    """SANA-like odd dims (not 128-multiples) work via weight padding."""
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(320, 192)) * 0.05, jnp.bfloat16)
    lin = SVDQW4A4Linear.from_weights(w, rank=16)
    x = jnp.asarray(rng.normal(size=(1, 40, 320)), jnp.bfloat16)
    out = lin(x)
    assert out.shape == (1, 40, 192)
    ref = x.astype(jnp.float32) @ w.astype(jnp.float32)
    err = float(jnp.linalg.norm(out.astype(jnp.float32) - ref) / jnp.linalg.norm(ref))
    assert err < 0.2, err


def test_sana_pipeline(model):
    from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline

    pipe = SanaPipeline(model)
    pe = jax.random.normal(jax.random.PRNGKey(5), (1, 48, 320), jnp.bfloat16)
    out = pipe(
        prompt_embeds=pe, height=256, width=256,
        num_inference_steps=2, guidance_scale=2.0, seed=0,
    )
    assert out.latents.shape == (1, 32, 8, 8)
    assert bool(jnp.isfinite(out.latents.astype(jnp.float32)).all())


# ---------------------------------------------------------------------------
# synthesized v1-format SANA checkpoint -> loader round trip
# ---------------------------------------------------------------------------

def _sana_svdq(key, k, n, seed, rank=16, bias=True):
    import ml_dtypes
    from nunchaku_tpu.utils import nunchaku_format as NF

    r = np.random.default_rng(seed)
    vals = r.integers(-8, 8, (n, k)).astype(np.int8)
    ws = r.random((k // 64, n)).astype(np.float32) * 0.01 + 0.001
    smooth = r.random(k).astype(np.float32) + 0.5
    ld = (r.standard_normal((rank, k)) * 0.02).astype(np.float32)
    lu = (r.standard_normal((n, rank)) * 0.02).astype(np.float32)
    bf = lambda a: a.astype(ml_dtypes.bfloat16)
    t = {
        f"{key}.qweight": NF.pack_weight_int4(vals),
        f"{key}.wscales": bf(NF.pack_scale_ref(ws)),
        f"{key}.smooth": bf(smooth),
        f"{key}.lora_down": bf(NF.pack_lowrank_weight_ref(ld, down=True)),
        f"{key}.lora_up": bf(NF.pack_lowrank_weight_ref(lu, down=False)),
    }
    if bias:
        t[f"{key}.bias"] = bf((r.standard_normal(n) * 0.01).astype(np.float32))
    return t


def _sana_linear(key, k, n, seed):
    import ml_dtypes

    r = np.random.default_rng(seed)
    return {
        f"{key}.weight": (r.standard_normal((n, k)) * 0.02).astype(ml_dtypes.bfloat16),
        f"{key}.bias": (r.standard_normal(n) * 0.01).astype(ml_dtypes.bfloat16),
    }


def _build_sana_ckpt(tmp_path, pag_layers=(1,)):
    import json
    import ml_dtypes
    from nunchaku_tpu.utils.safetensors import save_safetensors

    DIM, LAYERS, HID = 512, 2, 1280
    t = {}
    for i in range(LAYERS):
        p = f"transformer_blocks.{i}"
        t |= _sana_svdq(f"{p}.attn.qkv_proj", DIM, 3 * DIM, 10 + i, bias=False)
        t |= _sana_svdq(f"{p}.attn.out_proj", DIM, DIM, 20 + i, bias=False)
        if i in pag_layers:
            t |= _sana_svdq(f"{p}.attn.pag_to_v", DIM, DIM, 30 + i, bias=False)
        t |= _sana_svdq(f"{p}.cross_attn.q_linear", DIM, DIM, 40 + i)
        t |= _sana_linear(f"{p}.cross_attn.kv_linear", DIM, 2 * DIM, 50 + i)
        t |= _sana_svdq(f"{p}.cross_attn.out_proj", DIM, DIM, 60 + i)
        t |= _sana_svdq(f"{p}.ff.inverted_conv", DIM, 2 * HID, 70 + i)
        r = np.random.default_rng(80 + i)
        t[f"{p}.ff.depth_conv.weight"] = (r.standard_normal((2 * HID, 1, 3, 3)) * 0.1).astype(ml_dtypes.bfloat16)
        t[f"{p}.ff.depth_conv.bias"] = (r.standard_normal(2 * HID) * 0.01).astype(ml_dtypes.bfloat16)
        t |= _sana_svdq(f"{p}.ff.point_conv", HID, DIM, 90 + i, bias=False)
        t[f"{p}.scale_shift_table"] = (np.random.default_rng(100 + i).standard_normal((6, DIM)) * 0.02).astype(np.float32)
    # unquantized diffusers part
    r = np.random.default_rng(0)
    t["patch_embed.proj.weight"] = (r.standard_normal((DIM, 32, 1, 1)) * 0.02).astype(ml_dtypes.bfloat16)
    t["patch_embed.proj.bias"] = (r.standard_normal(DIM) * 0.01).astype(ml_dtypes.bfloat16)
    t |= _sana_linear("caption_projection.linear_1", 1152, DIM, 200)
    t |= _sana_linear("caption_projection.linear_2", DIM, DIM, 201)
    t |= _sana_linear("adaln_single.emb.timestep_embedder.linear_1", 256, DIM, 202)
    t |= _sana_linear("adaln_single.emb.timestep_embedder.linear_2", DIM, DIM, 203)
    t |= _sana_linear("adaln_single.linear", DIM, 6 * DIM, 204)
    t["scale_shift_table"] = (r.standard_normal((2, DIM)) * 0.02).astype(np.float32)
    t |= _sana_linear("proj_out", DIM, 32, 205)
    config = {
        "num_layers": LAYERS, "num_attention_heads": 16, "attention_head_dim": 32,
        "num_cross_attention_heads": 4, "cross_attention_head_dim": 128,
        "caption_channels": 1152, "in_channels": 32, "out_channels": 32,
        "expand_ratio": 2.5,
    }
    qcfg = {"weight": {"dtype": "int4", "group_size": 64}, "rank": 16,
            "pag_layers": list(pag_layers)}
    path = tmp_path / "sana-tiny.safetensors"
    save_safetensors(path, t, {"config": json.dumps(config),
                               "quantization_config": json.dumps(qcfg)})
    return path


@pytest.mark.parametrize("precision", [None, "int8"])
def test_sana_load_and_run(tmp_path, precision):
    from nunchaku_tpu.models.transformers.loader_sana import load_sana_transformer

    path = _build_sana_ckpt(tmp_path)
    model = load_sana_transformer(path, precision=precision)
    assert model.cfg.num_layers == 2 and model.cfg.dim == 512
    B, S_img, S_txt = 1, 256, 64
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 32), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 1152), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
    )
    assert out.shape == (B, S_img, 32)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_sana_load_pag_forward(tmp_path):
    """PAG layers load (pag_to_v present on a subset) and the perturbed
    forward differs from the normal one."""
    from nunchaku_tpu.models.transformers.loader_sana import load_sana_transformer

    path = _build_sana_ckpt(tmp_path, pag_layers=(1,))
    model = load_sana_transformer(path)
    B, S_img, S_txt = 1, 256, 64
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 32), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 1152), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
    )
    base = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)
    pag = np.asarray(
        jax.jit(lambda m, *a: m(*a, pag=True))(model, *args), np.float32
    )
    assert np.linalg.norm(base - pag) / np.linalg.norm(base) > 1e-3


def test_sana_pipeline_with_dcae_and_gemma():
    """End-to-end SANA smoke: Gemma-2 prompt encoding -> transformer ->
    DC-AE decode (tiny random weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nunchaku_tpu.models.dc_ae import DCAEConfig, load_dc_ae, synthesize_dcae_state_dict
    from nunchaku_tpu.models.text_encoders.gemma2 import Gemma2Encoder
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )
    from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline

    cfg = SanaConfig(
        num_layers=1, num_attention_heads=8, num_cross_attention_heads=2,
        caption_channels=64, expand_ratio=2.0,
        in_channels=4, out_channels=4,
    )
    tr = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    dc_cfg = DCAEConfig(
        latent_channels=4, attention_head_dim=8,
        block_out_channels=(8, 16), encoder_block_types=("res", "res"),
        decoder_block_types=("res", "res"), encoder_layers_per_block=(1, 1),
        decoder_layers_per_block=(1, 1), qkv_multiscales=((), ()),
    )
    vae = load_dc_ae(synthesize_dcae_state_dict(dc_cfg, seed=5), dc_cfg)
    enc = Gemma2Encoder.random_init(jax.random.PRNGKey(1), d=64)

    pipe = SanaPipeline(tr, vae=vae, text_encoder=enc,
                        tokenizer=lambda prompts, n: jnp.asarray(
                            np.random.default_rng(0).integers(1, 256, (len(prompts), n))))
    out = pipe(prompt="a cat", height=32, width=32, num_inference_steps=2)
    # latent 32/2(x downs)=16x16? tiny dc-ae has 1 downsample -> 2x; the
    # pipeline treats vae stride as 32 regardless; just check finiteness
    assert out.images is not None
    assert bool(jnp.isfinite(out.images).all())


def test_sana_pag_layer_selection(tmp_path):
    """pag_layers call-time selection: perturbing only layer 1 (traced
    per-layer flags + per-row mask) equals the whole-model static pag pass
    when layer 1 is the only real PAG layer (layer 0's pag_to_v is the
    loader's zero pad — identical outputs prove zero-padded layers never
    leak into the perturbed path); and cfg.pag_layers records the subset."""
    from nunchaku_tpu.models.transformers.loader_sana import load_sana_transformer

    path = _build_sana_ckpt(tmp_path, pag_layers=(1,))
    model = load_sana_transformer(path)
    assert model.cfg.pag_layers == (1,)
    B, S_img, S_txt = 2, 256, 64
    args = (
        jax.random.normal(jax.random.PRNGKey(1), (B, S_img, 32), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (B, S_txt, 1152), jnp.bfloat16),
        jnp.full((B,), 0.5, jnp.float32),
    )
    # static whole-batch pag (zero-pad on layer 0 yields out=out_proj(0)=0
    # contribution there — NOT the same as no-pag on layer 0)
    rows_all = jnp.ones((B,), bool)
    sel = np.asarray(
        jax.jit(lambda m, *a: m(*a, pag=True, pag_layers=[1],
                                pag_rows=rows_all))(model, *args),
        np.float32,
    )
    base = np.asarray(jax.jit(lambda m, *a: m(*a))(model, *args), np.float32)
    assert np.linalg.norm(base - sel) / np.linalg.norm(base) > 1e-3

    # per-row mask: row 0 normal, row 1 perturbed — row 0 must equal base
    rows = jnp.asarray([False, True])
    mixed = np.asarray(
        jax.jit(lambda m, *a: m(*a, pag=True, pag_layers=[1],
                                pag_rows=rows))(model, *args),
        np.float32,
    )
    np.testing.assert_allclose(mixed[0], base[0], atol=2e-2)
    assert np.linalg.norm(mixed[1] - base[1]) / np.linalg.norm(base[1]) > 1e-3
    np.testing.assert_allclose(mixed[1], sel[1], atol=2e-2)


def test_sana_pipeline_pag():
    """pag_scale>0 drives the 3-branch PAG combine and changes the output
    relative to plain CFG."""
    from nunchaku_tpu.pipeline.pipeline_sana import SanaPipeline
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig, SanaTransformer2DModel,
    )

    cfg = SanaConfig(num_layers=2, num_attention_heads=16,
                     num_cross_attention_heads=2, caption_channels=256,
                     rank=8, pag_layers=(1,))
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 256), jnp.bfloat16)

    pipe = SanaPipeline(model)
    kw = dict(prompt_embeds=pe, height=128, width=128,
              num_inference_steps=2, guidance_scale=4.5, seed=0)
    plain = np.asarray(pipe(**kw).latents, np.float32)
    pag = np.asarray(pipe(**kw, pag_scale=2.0).latents, np.float32)
    assert np.linalg.norm(plain - pag) / np.linalg.norm(plain) > 1e-4
