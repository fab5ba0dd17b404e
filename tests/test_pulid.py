"""PuLID subsystem tests: encoder loading (synthesized checkpoint in the
reference key schema), CA numerics vs a manual oracle, EVA tower forward,
and the 2/4-layer injection cadence on a tiny FLUX graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.pulid.encoders import (
    PerceiverAttentionCA,
    load_pulid,
)
from nunchaku_tpu.models.pulid.eva_clip import EVAVisionTower, eva_rope_table
from nunchaku_tpu.models.pulid.forward import _dual_segments, pulid_forward

rng = np.random.default_rng(11)


def _r(*shape, scale=0.05):
    return (rng.normal(size=shape) * scale).astype(np.float32)


def _synth_pulid_sd(dim=64, depth=10, heads=4, dim_head=16, num_id=5, nq=8,
                    out_dim=48, flux_dim=96, ca_count=4, vit_dim=64):
    """pulid_flux safetensors layout (pipeline_flux_pulid.py:225-237 +
    encoders_transformer.py module attributes), tiny dims."""
    inner = heads * dim_head
    sd = {}
    e = "pulid_encoder."
    sd[e + "latents"] = _r(1, nq, dim)
    sd[e + "proj_out"] = _r(dim, out_dim)
    for i in range(depth):
        p = f"{e}layers.{i}."
        sd[p + "0.norm1.weight"] = np.ones(dim, np.float32)
        sd[p + "0.norm1.bias"] = np.zeros(dim, np.float32)
        sd[p + "0.norm2.weight"] = np.ones(dim, np.float32)
        sd[p + "0.norm2.bias"] = np.zeros(dim, np.float32)
        sd[p + "0.to_q.weight"] = _r(inner, dim)
        sd[p + "0.to_kv.weight"] = _r(inner * 2, dim)
        sd[p + "0.to_out.weight"] = _r(dim, inner)
        sd[p + "1.0.weight"] = np.ones(dim, np.float32)
        sd[p + "1.0.bias"] = np.zeros(dim, np.float32)
        sd[p + "1.1.weight"] = _r(dim * 4, dim)
        sd[p + "1.3.weight"] = _r(dim, dim * 4)
    for i in range(5):
        p = f"{e}mapping_{i}."
        sd[p + "0.weight"] = _r(vit_dim, vit_dim)
        sd[p + "0.bias"] = _r(vit_dim)
        sd[p + "1.weight"] = np.ones(vit_dim, np.float32)
        sd[p + "1.bias"] = np.zeros(vit_dim, np.float32)
        sd[p + "3.weight"] = _r(vit_dim, vit_dim)
        sd[p + "3.bias"] = _r(vit_dim)
        sd[p + "4.weight"] = np.ones(vit_dim, np.float32)
        sd[p + "4.bias"] = np.zeros(vit_dim, np.float32)
        sd[p + "6.weight"] = _r(dim, vit_dim)
        sd[p + "6.bias"] = _r(dim)
    p = e + "id_embedding_mapping."
    id_in = 80
    sd[p + "0.weight"] = _r(vit_dim, id_in)
    sd[p + "0.bias"] = _r(vit_dim)
    sd[p + "1.weight"] = np.ones(vit_dim, np.float32)
    sd[p + "1.bias"] = np.zeros(vit_dim, np.float32)
    sd[p + "3.weight"] = _r(vit_dim, vit_dim)
    sd[p + "3.bias"] = _r(vit_dim)
    sd[p + "4.weight"] = np.ones(vit_dim, np.float32)
    sd[p + "4.bias"] = np.zeros(vit_dim, np.float32)
    sd[p + "6.weight"] = _r(dim * num_id, vit_dim)
    sd[p + "6.bias"] = _r(dim * num_id)
    for i in range(ca_count):
        p = f"pulid_ca.{i}."
        sd[p + "norm1.weight"] = np.ones(out_dim, np.float32)
        sd[p + "norm1.bias"] = np.zeros(out_dim, np.float32)
        sd[p + "norm2.weight"] = np.ones(flux_dim, np.float32)
        sd[p + "norm2.bias"] = np.zeros(flux_dim, np.float32)
        sd[p + "to_q.weight"] = _r(inner, flux_dim)
        sd[p + "to_kv.weight"] = _r(inner * 2, out_dim)
        sd[p + "to_out.weight"] = _r(flux_dim, inner)
    return sd


def test_load_pulid_and_idformer_forward():
    sd = _synth_pulid_sd()
    encoder, cas = load_pulid(sd, heads=4)
    assert len(cas) == 4
    id_cond = jnp.asarray(_r(2, 80, scale=1.0), jnp.bfloat16)
    vit_hidden = [jnp.asarray(_r(2, 17, 64, scale=1.0), jnp.bfloat16) for _ in range(5)]
    out = encoder(id_cond, vit_hidden)
    assert out.shape == (2, 8, 48)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_perceiver_ca_vs_manual():
    """PerceiverAttentionCA matches a numpy oracle of
    encoders_transformer.py:62-129 (double-sqrt scale, kv from ID only)."""
    sd = _synth_pulid_sd()
    _, cas = load_pulid(sd, heads=4)
    ca = cas[1]
    heads, dim_head = 4, 16
    idt = _r(1, 8, 48, scale=1.0)
    img = _r(1, 10, 96, scale=1.0)

    def ln(x):
        return (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)

    p = "pulid_ca.1."
    x = ln(idt)
    lat = ln(img)
    q = lat @ sd[p + "to_q.weight"].T
    kv = x @ sd[p + "to_kv.weight"].T
    k, v = np.split(kv, 2, axis=-1)

    def split(t):
        return t.reshape(1, -1, heads, dim_head).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    s = 1 / np.sqrt(np.sqrt(dim_head))
    w = (qh * s) @ (kh * s).transpose(0, 1, 3, 2)
    w = np.exp(w - w.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    o = (w @ vh).transpose(0, 2, 1, 3).reshape(1, 10, -1)
    ref = o @ sd[p + "to_out.weight"].T

    got = np.asarray(
        ca(jnp.asarray(idt, jnp.bfloat16), jnp.asarray(img, jnp.bfloat16)), np.float32
    )
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err


def test_eva_tower_forward_and_taps():
    m = EVAVisionTower.random_init(
        jax.random.PRNGKey(0), image_size=28, patch=14, d=64, heads=2,
        layers=6, proj_dim=32,
    )
    px = jnp.asarray(_r(2, 3, 28, 28, scale=1.0), jnp.bfloat16)
    emb, taps = m(px)
    assert emb.shape == (2, 32)
    # L2-normalized projection
    n = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1)
    assert bool(jnp.all(jnp.abs(n - 1.0) < 0.05))
    # taps collected before blocks 4 (6 layers -> only idx 4 qualifies)
    assert len(taps) == 1 and taps[0].shape == (2, 5, 64)


def test_eva_rope_table_shapes():
    cos, sin = eva_rope_table(24, 64)
    assert cos.shape == (576, 64) and sin.shape == (576, 64)
    # interleaved-pair repeat: adjacent columns share the frequency
    assert bool(jnp.allclose(cos[:, 0], cos[:, 1]))


def test_injection_cadence():
    """Segments reproduce FluxModel.cpp:1301,1335: CA after dual layers
    0,2,..,18 and single locals 0,4,..,36 -> 10 + 10 modules."""
    dual = _dual_segments(19, 2)
    assert sum(1 for s in dual if s[2]) == 10
    assert dual[0] == (0, 1, True) and dual[1] == (1, 3, True)
    assert dual[-1] == (17, 19, True)
    single = _dual_segments(38, 4)
    assert sum(1 for s in single if s[2]) == 10
    assert single[0] == (0, 1, True) and single[-1] == (37, 38, False)


def test_pulid_forward_tiny_flux():
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    cfg = FluxConfig(
        num_layers=2, num_single_layers=2, num_attention_heads=2,
        joint_attention_dim=512, pooled_projection_dim=256,
    )
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    n_ca = -(-2 // 2) + -(-2 // 4)  # 1 + 1
    cas = [
        PerceiverAttentionCA.random_init(
            jax.random.PRNGKey(i), dim=cfg.dim, dim_head=32, heads=2, kv_dim=48
        )
        for i in range(n_ca)
    ]
    id_emb = jnp.asarray(_r(1, 8, 48, scale=1.0), jnp.bfloat16)

    lat = jnp.asarray(_r(1, 64, 64, scale=1.0), jnp.bfloat16)
    txt = jnp.asarray(_r(1, 32, 512, scale=1.0), jnp.bfloat16)
    pool = jnp.asarray(_r(1, 256, scale=1.0), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    g = jnp.array([3.5], jnp.float32)
    iids = jnp.zeros((64, 3), jnp.int32)
    tids = jnp.zeros((32, 3), jnp.int32)

    out0 = pulid_forward(model, cas, id_emb, 0.0, lat, txt, pool, t, iids, tids, g)
    out1 = pulid_forward(model, cas, id_emb, 1.0, lat, txt, pool, t, iids, tids, g)
    base = model(lat, txt, pool, t, iids, tids, g)
    # zero weight == plain forward; nonzero weight changes the output
    assert np.allclose(np.asarray(out0, np.float32), np.asarray(base, np.float32), atol=2e-2)
    assert not np.allclose(np.asarray(out1, np.float32), np.asarray(base, np.float32), atol=2e-2)

    with pytest.raises(ValueError):
        pulid_forward(model, cas[:1], id_emb, 1.0, lat, txt, pool, t, iids, tids, g)


def test_safety_checker_disabled_and_gated():
    from nunchaku_tpu.models.safety_checker import SafetyChecker

    assert SafetyChecker(disabled=True)("anything") is True
    with pytest.raises(RuntimeError, match="ShieldGemma"):
        SafetyChecker(disabled=False, model_path="/nonexistent/path")
