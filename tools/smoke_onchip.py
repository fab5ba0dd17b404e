"""On-chip kernel smoke tier: compile EVERY Pallas kernel family through
Mosaic at ONE real serving shape and check it against its oracle.

The CPU suite runs kernels in interpret mode, which cannot model Mosaic
layout/tiling constraints — a kernel edit can pass all 200 CPU tests and
fail to compile on hardware (VERDICT round 2, weak #4). This script is the
~10-minute decision-grade check: FLUX-serving shapes, non-interpreted,
loose-tolerance oracle agreement.

  python tools/smoke_onchip.py            # all families
  python tools/smoke_onchip.py flash gemm # subset

Prints one JSON line per family: {"family", "ok", "err", "secs"}.
Exit code = number of failures.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# FLUX.1 1024px serving shapes
B, H, D = 1, 24, 128
S_IMG, S_TXT = 4096, 512
S = S_IMG + S_TXT
K, N, R = 3072, 3072, 32
FF = 12288


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))


def check(name, got, want, tol=5e-2):
    r = _rel(got, want)
    if r > tol:
        raise AssertionError(f"{name}: rel err {r:.4f} > {tol}")


# ---------------------------------------------------------------- families

def _mk_w4a4(precision, seed=0):
    from nunchaku_tpu.ops import reference as Rf
    from nunchaku_tpu.core.packing import pack_int4

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(512, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    qw, ws, alpha = Rf.quantize_weight(w, precision=precision)
    if precision == "nvfp4":
        ws = ws * alpha
    ws = ws.astype(jnp.bfloat16)
    pd = jnp.asarray(rng.normal(size=(K, R)) * 0.02, jnp.bfloat16)
    pu = jnp.asarray(rng.normal(size=(R, N)) * 0.02, jnp.bfloat16)
    qa, asc, la = Rf.quantize_act_fuse_lora(x, None, pd, precision=precision)
    ref = Rf.w4a4_gemm(qa, asc.astype(jnp.bfloat16), qw, ws, lora_act=la,
                       proj_up=pu, bias=None, precision=precision,
                       exact_int_dot=False)
    return (pack_int4(qa, axis=1), asc.T.astype(jnp.bfloat16),
            pack_int4(qw, axis=0), ws, la, pu, ref)


def fam_quantize_gemm_int4():
    """int4 plane-split GEMM vs the pure-jnp oracle at a FLUX shape."""
    from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4

    qa, asc, qw, ws, la, pu, ref = _mk_w4a4("int4")
    out = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu, None, precision="int4")
    check("int4 gemm", out, ref)


def fam_gemm_nvfp4():
    from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4

    qa, asc, qw, ws, la, pu, ref = _mk_w4a4("nvfp4", seed=1)
    out = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu, None, precision="nvfp4")
    check("nvfp4 gemm", out, ref)


def fam_w4a8_pallas():
    """The Pallas hybrid w4a8 kernel (the XLA route rides fam_chain/int8)."""
    os.environ["NUNCHAKU_TPU_W4A8_XLA"] = "0"
    try:
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        lin = SVDQW4A4Linear.random_init(
            jax.random.PRNGKey(2), K, N, rank=R, precision="w4a8"
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 512, K), jnp.bfloat16)
        out_p = lin(x)
    finally:
        os.environ["NUNCHAKU_TPU_W4A8_XLA"] = "1"
    # the XLA dequant+dot route is the bit-identical oracle (tests prove
    # equality in interpret mode; this asserts it on hardware)
    lin2 = jax.tree.map(lambda a: a, lin)
    out_x = lin2(x)
    check("w4a8 pallas vs xla", out_p, out_x, tol=1e-2)


def fam_w4a8_e2m1():
    """nvfp4-a8: the Pallas dequant pass decoding e2m1 nibbles in VMEM
    (Mosaic must legalize the exp2-based fp4-grid decode); XLA-fusion
    route is the bit-identical oracle."""
    from nunchaku_tpu.core.packing import pack_int4
    from nunchaku_tpu.ops.gemm import (
        dequant_w4a8_pallas,
        dequant_w4a8_to_int8,
    )

    rng = np.random.default_rng(11)
    codes = rng.integers(-7, 8, (K, N))
    qw = pack_int4(jnp.asarray(codes), axis=0)
    rs = jnp.asarray(rng.random((K // 16, N)) * 20 + 0.5, jnp.bfloat16)
    got = dequant_w4a8_pallas(qw, rs, codes="e2m1", interpret=False)
    ref = dequant_w4a8_to_int8(qw, rs, codes="e2m1")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def fam_chain():
    """GELU_QUANT chain producer + grouped-as consumer (the int8 MLP)."""
    import nunchaku_tpu.models.attention as A
    from nunchaku_tpu.models.attention import FeedForward, gelu_mlp

    ff = FeedForward.random_init(
        jax.random.PRNGKey(4), K, mult=4, rank=R, precision="int8"
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (1, S_IMG, K), jnp.bfloat16)
    out = gelu_mlp(ff.fc1, ff.fc2, x)
    # unfused oracle: fc1 -> XLA gelu -> fc2
    h = ff.fc1(x)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True)
    ref = ff.fc2(h.astype(jnp.bfloat16))
    check("gelu chain", out, ref)


def fam_ln_producer():
    from nunchaku_tpu.models.linear import SVDQW4A4Linear

    lin = SVDQW4A4Linear.random_init(
        jax.random.PRNGKey(6), K, N, rank=R, precision="int8"
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (1, S_IMG, K), jnp.bfloat16)
    sc = jax.random.normal(jax.random.PRNGKey(8), (1, K), jnp.bfloat16) * 0.1
    sh = jax.random.normal(jax.random.PRNGKey(9), (1, K), jnp.bfloat16) * 0.1
    out = lin.forward_modulated(x, sc, sh)
    from nunchaku_tpu.models.normalization import layer_norm

    y = (layer_norm(x) * (1.0 + sc.astype(jnp.float32))[:, None]
         + sh.astype(jnp.float32)[:, None])
    ref = lin(y.astype(jnp.bfloat16))
    check("ln_mod_quant producer", out, ref)


def fam_flash():
    from nunchaku_tpu.ops.attention import flash_attention, sdpa_reference

    ks = jax.random.split(jax.random.PRNGKey(10), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    ref = sdpa_reference(q, k, v)
    for kwargs in (
        dict(fixed_softmax=True),
        dict(fixed_softmax=False),
        dict(fixed_softmax=True, out_bshd=True),
    ):
        out = flash_attention(q, k, v, **kwargs)
        if kwargs.get("out_bshd"):
            out = out.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        check(f"flash {kwargs}", out, ref)
    # kv-mask variant (padded prompt tokens)
    mask = jnp.arange(S) < (S - 256)
    out = flash_attention(q, k, v, fixed_softmax=True, kv_mask=mask[None])
    ref_m = sdpa_reference(q, k[:, :, : S - 256], v[:, :, : S - 256])
    check("flash kv-mask", out, ref_m)
    # return_denom (the ring-attention building block)
    out, l = flash_attention(q, k, v, fixed_softmax=True, return_denom=True)
    check("flash denom out", out, ref)


def fam_rope_producer():
    from nunchaku_tpu.ops.attention import (
        qkv_rope_producer, rope_table_halfsplit,
    )

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    qkv = jax.random.normal(ks[0], (B, S, 3 * H * D), jnp.bfloat16)
    rot = jax.random.normal(ks[1], (S, D // 2, 2), jnp.float32)
    rot = rot / (jnp.linalg.norm(rot, axis=-1, keepdims=True) + 1e-6)
    nq = jnp.abs(jax.random.normal(ks[2], (D,), jnp.float32)) + 0.5
    nk = jnp.abs(jax.random.normal(ks[3], (D,), jnp.float32)) + 0.5
    cos, sin = rope_table_halfsplit(rot)
    q, k, v = qkv_rope_producer(qkv, cos, sin, nq, nk, heads=H, head_dim=D)
    assert q.shape == (B, H, S, D) and bool(jnp.isfinite(
        q.astype(jnp.float32)).all())
    # v is untouched by norm/rope: compare against the plain transpose
    v_ref = jnp.split(qkv, 3, axis=-1)[2].reshape(B, S, H, D).transpose(0, 2, 1, 3)
    check("rope producer v", v, v_ref, tol=1e-2)


def fam_rope_lora():
    """Producer with the low-rank operands (lora_in_producer mode): each
    (bm, D) tile adds its lora slice before norm/rope — against adding
    lora_act @ proj_up to qkv up front and running the plain producer."""
    from nunchaku_tpu.ops.attention import (
        qkv_rope_producer, rope_table_halfsplit,
    )

    ks = jax.random.split(jax.random.PRNGKey(21), 6)
    qkv = jax.random.normal(ks[0], (B, S, 3 * H * D), jnp.bfloat16)
    rot = jax.random.normal(ks[1], (S, D // 2, 2), jnp.float32)
    rot = rot / (jnp.linalg.norm(rot, axis=-1, keepdims=True) + 1e-6)
    nq = jnp.abs(jax.random.normal(ks[2], (D,), jnp.float32)) + 0.5
    nk = jnp.abs(jax.random.normal(ks[3], (D,), jnp.float32)) + 0.5
    la = jax.random.normal(ks[4], (B, S, R), jnp.float32) * 0.1
    pu = jax.random.normal(ks[5], (R, 3 * H * D), jnp.bfloat16) * 0.05
    cos, sin = rope_table_halfsplit(rot)
    q, k, v = qkv_rope_producer(qkv, cos, sin, nq, nk, heads=H, head_dim=D,
                                lora_act=la, proj_up=pu)
    qkv_ref = (qkv.astype(jnp.float32) + jnp.einsum(
        "bsr,rn->bsn", la.astype(jnp.bfloat16).astype(jnp.float32),
        pu.astype(jnp.float32))).astype(jnp.bfloat16)
    q2, k2, v2 = qkv_rope_producer(qkv_ref, cos, sin, nq, nk,
                                   heads=H, head_dim=D)
    check("rope_lora q", q, q2, tol=3e-2)
    check("rope_lora k", k, k2, tol=3e-2)
    check("rope_lora v", v, v2, tol=3e-2)


def fam_chain_res():
    """Chain consumer with the gated-residual epilogue (+ attn extra +
    extra-lora operands) vs the unfused adds."""
    import nunchaku_tpu.models.transformers.transformer_flux as TFm
    from nunchaku_tpu.models.attention import FeedForward, gelu_mlp

    ks = jax.random.split(jax.random.PRNGKey(22), 5)
    ff = FeedForward.random_init(
        jax.random.PRNGKey(23), K, mult=4, rank=R, precision="int8"
    )
    x = jax.random.normal(ks[0], (1, S_IMG, K), jnp.bfloat16)
    gate = jax.random.normal(ks[1], (1, K), jnp.float32) * 0.5
    extra = jax.random.normal(ks[2], (1, S_IMG, K), jnp.bfloat16)
    ela = jax.random.normal(ks[3], (1, S_IMG, R), jnp.float32) * 0.1
    epu = jax.random.normal(ks[4], (R, K), jnp.bfloat16) * 0.05
    out = gelu_mlp(ff.fc1, ff.fc2, x,
                   residual=(x, gate, extra, ela, epu))
    mlp = gelu_mlp(ff.fc1, ff.fc2, x)
    e = (extra.astype(jnp.float32) + jnp.einsum(
        "bsr,rn->bsn", ela.astype(jnp.bfloat16).astype(jnp.float32),
        epu.astype(jnp.float32))).astype(jnp.bfloat16).astype(jnp.float32)
    ref = (x.astype(jnp.float32)
           + gate[:, None].astype(jnp.float32)
           * (mlp.astype(jnp.float32) + e)).astype(jnp.bfloat16)
    check("chain_res", out, ref, tol=3e-2)


def fam_blocksparse():
    from nunchaku_tpu.ops.attention import (
        block_sparse_attention, block_sparse_reference, select_blocks,
    )

    s = 4096
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (1, 4, s, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 4, s, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 4, s, D), jnp.bfloat16)
    idx = select_blocks(q, k, sparsity_ratio=0.5, bq=768, bkv=1536)
    out = block_sparse_attention(
        q, k, v, sparsity_ratio=0.5, block_idx=idx, bq=768, bkv=1536
    )
    ref = block_sparse_reference(q, k, v, idx, bq=768, bkv=1536)
    check("block sparse", out, ref)


def fam_gemv_awq():
    from nunchaku_tpu.ops import reference as Rf
    from nunchaku_tpu.ops.gemv import awq_w4a16_linear
    from nunchaku_tpu.core.packing import pack_int4

    kk, nn, g = 4096, 4096, 64
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    x = jax.random.normal(ks[0], (8, kk), jnp.bfloat16)
    qv = jax.random.randint(ks[1], (kk, nn), 0, 16, jnp.int8)
    scales = jax.random.uniform(ks[2], (kk // g, nn), jnp.float32, 0.005, 0.02)
    zeros = jax.random.uniform(ks[3], (kk // g, nn), jnp.float32, 0.0, 0.1)
    qw = pack_int4(qv, axis=0)
    out = awq_w4a16_linear(x, qw, scales, zeros)
    wd = (qv.astype(jnp.float32)
          * jnp.repeat(scales, g, 0) - jnp.repeat(zeros, g, 0))
    ref = x.astype(jnp.float32) @ wd
    check("awq gemv", out, ref)


def fam_flash_i8():
    import math

    from nunchaku_tpu.ops.attention import (
        LOG2E, flash_attention_i8, quantize_qk, sdpa_reference,
    )

    ks = jax.random.split(jax.random.PRNGKey(14), 3)
    q = jax.random.normal(ks[0], (B, 4, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, 4, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, 4, S, D), jnp.bfloat16)
    # kernel contract: softmax scale * log2(e) folded into q pre-quant
    qp = (q.astype(jnp.float32) * (LOG2E / math.sqrt(D))).astype(jnp.bfloat16)
    qi, qs, ki, ksc = quantize_qk(qp, k)
    out = flash_attention_i8(qi, qs, ki, ksc, v)
    check("flash int8-qk", out, sdpa_reference(q, k, v), tol=8e-2)


# ------------------------------------------------- model-level forwards
# Graph-level Mosaic smoke (VERDICT r3 #10): the kernel families above
# compile in isolation, but a full model forward can still hit Mosaic
# layout/fusion failures at the graph level. Two layers at REAL per-layer
# serving dims (the layer kernels see serving shapes; only depth and the
# token count are reduced).


def _ids(s_img, side):
    ii = np.zeros((s_img, 3), np.int32)
    ii[:, 1] = np.arange(s_img) // side
    ii[:, 2] = np.arange(s_img) % side
    return jnp.asarray(ii)


def fam_model_qwen():
    from nunchaku_tpu.models.transformers.transformer_qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )

    cfg = QwenImageConfig(num_layers=2, precision="int4")  # real layer dims
    model = QwenImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    s_img, s_txt = 1024, 256
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (1, s_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, s_txt, cfg.joint_attention_dim), jnp.bfloat16),
        jnp.array([0.5], jnp.float32),
        _ids(s_img, 32),
    )
    assert out.shape == (1, s_img, cfg.proj_out_channels)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def fam_model_zimage():
    from nunchaku_tpu.models.transformers.transformer_zimage import (
        ZImageConfig,
        ZImageTransformer2DModel,
    )

    cfg = ZImageConfig(dim=3072, num_attention_heads=24, num_layers=2,
                       num_refiner_layers=1, cap_feat_dim=2048,
                       precision="int4")
    model = ZImageTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    s_img, s_txt = 1024, 256
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (1, s_img, 64), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, s_txt, cfg.cap_feat_dim), jnp.bfloat16),
        jnp.full((1,), 0.5, jnp.float32),
        _ids(s_img, 32),
        jnp.zeros((s_txt, 3), jnp.int32),
    )
    assert out.shape == (1, s_img, 64)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def fam_model_sana():
    from nunchaku_tpu.models.transformers.transformer_sana import (
        SanaConfig,
        SanaTransformer2DModel,
    )

    cfg = SanaConfig(num_layers=2, precision="int4")  # real dim 2240
    model = SanaTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    s_img, s_txt = 1024, 128
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (1, s_img, cfg.in_channels), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(2), (1, s_txt, cfg.caption_channels), jnp.bfloat16),
        jnp.full((1,), 0.5, jnp.float32),
    )
    assert out.shape[0] == 1
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def fam_model_sdxl():
    from nunchaku_tpu.models.unets.unet_sdxl import (
        SDXLConfig,
        SDXLUNet2DConditionModel,
    )

    cfg = SDXLConfig(precision="int4")  # the REAL SDXL topology fits easily
    model = SDXLUNet2DConditionModel.random_init(jax.random.PRNGKey(0), cfg)
    size = 64  # 512px latent
    out = jax.jit(lambda m, *a: m(*a))(
        model,
        jax.random.normal(jax.random.PRNGKey(1), (1, 4, size, size), jnp.bfloat16),
        jnp.full((1,), 500.0, jnp.float32),
        jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim), jnp.bfloat16),
        jax.random.normal(jax.random.PRNGKey(3), (1, 1280), jnp.bfloat16),
        jnp.ones((1, 6), jnp.float32) * 512,
    )
    assert out.shape == (1, 4, size, size)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


FAMILIES = {
    "gemm": fam_quantize_gemm_int4,
    "nvfp4": fam_gemm_nvfp4,
    "w4a8": fam_w4a8_pallas,
    "w4a8_e2m1": fam_w4a8_e2m1,
    "chain": fam_chain,
    "ln": fam_ln_producer,
    "flash": fam_flash,
    "rope": fam_rope_producer,
    "rope_lora": fam_rope_lora,
    "chain_res": fam_chain_res,
    "blocksparse": fam_blocksparse,
    "gemv": fam_gemv_awq,
    "flash_i8": fam_flash_i8,
    "model_qwen": fam_model_qwen,
    "model_zimage": fam_model_zimage,
    "model_sana": fam_model_sana,
    "model_sdxl": fam_model_sdxl,
}


def main():
    names = sys.argv[1:] or list(FAMILIES)
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)
    fails = 0
    for name in names:
        t0 = time.time()
        err = None
        try:
            FAMILIES[name]()
        except Exception as e:  # noqa: BLE001 — report and continue
            err = f"{type(e).__name__}: {e}"[:400]
            fails += 1
        print(json.dumps({
            "family": name, "ok": err is None, "err": err,
            "secs": round(time.time() - t0, 1),
        }), flush=True)
    sys.exit(fails)


if __name__ == "__main__":
    main()
