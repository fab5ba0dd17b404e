"""Kernel-vs-oracle unit tests (Pallas interpret mode on CPU).

The reference has no kernel-level pytest coverage (SURVEY.md §4.5 — it uses
debug taps instead); these tests are the dequant-matmul-oracle checks the
survey recommends adding.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.core.packing import pack_int4
from nunchaku_tpu.ops import reference as R
from nunchaku_tpu.ops.attention import (
    LOG2E,
    block_sparse_attention,
    block_sparse_reference,
    flash_attention,
    sdpa_reference,
    select_blocks,
)
from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
from nunchaku_tpu.ops.gemv import awq_w4a16_linear
from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

rng = np.random.default_rng(0)


def _mk(M, K, N, r=32, precision="int4", unsigned=False):
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    if unsigned:
        x = jnp.abs(x)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    qw, ws, alpha = R.quantize_weight(w, precision=precision)
    if precision == "nvfp4":
        ws = ws * alpha
    ws = ws.astype(jnp.bfloat16)
    pd = jnp.asarray(rng.normal(size=(K, r)) * 0.02, jnp.bfloat16)
    pu = jnp.asarray(rng.normal(size=(r, N)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.bfloat16)
    return x, qw, ws, pd, pu, b


class TestGemmKernel:
    @pytest.mark.parametrize(
        "precision,unsigned", [("int4", False), ("nvfp4", False), ("int4", True)]
    )
    def test_vs_oracle(self, precision, unsigned):
        M, K, N = 256, 512, 256
        x, qw, ws, pd, pu, b = _mk(M, K, N, precision=precision, unsigned=unsigned)
        qa, asc, la = R.quantize_act_fuse_lora(
            x, None, pd, precision=precision, unsigned=unsigned
        )
        ref = R.w4a4_gemm(
            qa, asc.astype(jnp.bfloat16), qw, ws, lora_act=la, proj_up=pu,
            bias=b, precision=precision, exact_int_dot=False,
        )
        out = svdq_gemm_w4a4(
            pack_int4(qa, axis=1), asc.T.astype(jnp.bfloat16), pack_int4(qw, axis=0),
            ws, la, pu, b, precision=precision, act_unsigned=unsigned,
        )
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
            / (float(jnp.max(jnp.abs(ref))) + 1e-9)
        )
        assert err < 3e-2, err

    def test_multi_k_accumulation(self):
        M, K, N = 256, 1024, 256
        x, qw, ws, pd, pu, b = _mk(M, K, N)
        qa, asc, la = R.quantize_act_fuse_lora(x, None, pd)
        ref = R.w4a4_gemm(
            qa, asc.astype(jnp.bfloat16), qw, ws, lora_act=la, proj_up=pu,
            bias=b, exact_int_dot=False,
        )
        out = svdq_gemm_w4a4(
            pack_int4(qa, axis=1), asc.T.astype(jnp.bfloat16), pack_int4(qw, axis=0),
            ws, la, pu, b, bk=512,
        )
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
            / (float(jnp.max(jnp.abs(ref))) + 1e-9)
        )
        assert err < 3e-2, err


class TestQuantizeOp:
    def test_matches_oracle(self):
        M, K, r = 64, 512, 32
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        smooth = jnp.asarray(rng.uniform(0.5, 2.0, (K,)), jnp.bfloat16)
        pd = jnp.asarray(rng.normal(size=(K, r)) * 0.02, jnp.bfloat16)
        qact, asc_t, la = quantize_w4a4_act_fuse_lora(x, pd, smooth)
        q_ref, s_ref, la_ref = R.quantize_act_fuse_lora(x, smooth, pd)
        # scales: transposed bf16
        np.testing.assert_allclose(
            np.asarray(asc_t, np.float32),
            np.asarray(s_ref.T.astype(jnp.bfloat16), np.float32),
            rtol=1e-2,
        )
        assert np.asarray(jnp.abs(la - la_ref)).max() < 1e-3
        # codes: unpack and compare (allow off-by-one from scale rounding)
        from nunchaku_tpu.core.packing import unpack_int4

        q = np.asarray(unpack_int4(qact, axis=1))
        diff = np.abs(q.astype(int) - np.asarray(q_ref, int))
        assert (diff <= 1).all() and (diff > 0).mean() < 0.02

    def test_fuse_glu(self):
        M, K = 64, 512
        x = jnp.asarray(rng.normal(size=(M, 2 * K)), jnp.bfloat16)
        pd = jnp.asarray(rng.normal(size=(K, 32)) * 0.02, jnp.bfloat16)
        qact, asc_t, la = quantize_w4a4_act_fuse_lora(x, pd, None, fuse_glu=True)
        hidden, gate = np.asarray(x, np.float32)[:, :K], np.asarray(x, np.float32)[:, K:]
        glu = hidden * (gate / (1 + np.exp(-gate)))
        q_ref, _ = R.quantize_act(jnp.asarray(glu, jnp.bfloat16), None)
        from nunchaku_tpu.core.packing import unpack_int4

        q = np.asarray(unpack_int4(qact, axis=1))
        diff = np.abs(q.astype(int) - np.asarray(q_ref, int))
        assert (diff <= 1).all()


class TestGemv:
    def test_awq_exact_vs_dequant(self):
        from nunchaku_tpu.core.packing import unpack_int4

        M, K, N = 3, 512, 256
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        q = jnp.asarray(rng.integers(0, 16, (K, N)), jnp.int8)
        ws = jnp.asarray(rng.random((K // 64, N)) * 0.1, jnp.bfloat16)
        wz = jnp.asarray(rng.random((K // 64, N)) * 0.4, jnp.bfloat16)
        out = awq_w4a16_linear(x, pack_int4(q, axis=0), ws, wz, bn=256, bk=512)
        s_full = np.repeat(np.asarray(ws, np.float32), 64, 0)
        z_full = np.repeat(np.asarray(wz, np.float32), 64, 0)
        w_deq = jnp.asarray(np.asarray(q, np.float32) * s_full - z_full, jnp.bfloat16)
        ref = np.asarray(x, np.float32) @ np.asarray(w_deq, np.float32)
        err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 5e-3, err

    @pytest.mark.parametrize("m", [1, 8, 512])
    def test_awq_xla_route_matches_kernel(self, m):
        """The large-M XLA dequant+dot route (round 5: T5-XXL encode was
        VPU-decode/dispatch-bound on the gemv kernel) must agree with the
        Pallas kernel at every M — the AWQW4A16Linear dispatch boundary
        (AWQ_XLA_MIN_M) mirrors the reference's gemv/gemm_awq split
        (text_encoders/linear.py:128-142)."""
        from nunchaku_tpu.models.linear import AWQW4A16Linear
        from nunchaku_tpu.ops.gemv import (
            AWQ_XLA_MIN_M,
            awq_w4a16_linear_xla,
        )

        lin = AWQW4A16Linear.random_init(jax.random.PRNGKey(0), 512, 384)
        x = jnp.asarray(rng.normal(size=(m, 512)), jnp.bfloat16)
        a = np.asarray(awq_w4a16_linear(
            x, lin.qweight, lin.wscales, lin.wzeros, lin.bias,
            group_size=lin.group_size), np.float32)
        b = np.asarray(awq_w4a16_linear_xla(
            x, lin.qweight, lin.wscales, lin.wzeros, lin.bias,
            group_size=lin.group_size), np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 1e-5, rel
        routed = np.asarray(lin(x), np.float32)
        # lin() casts its f32 accumulator back to the activation dtype
        want = np.asarray(jnp.asarray(a if m < AWQ_XLA_MIN_M else b, jnp.bfloat16),
                          np.float32)
        rel2 = np.linalg.norm(routed - want) / (np.linalg.norm(want) + 1e-9)
        assert rel2 < 1e-5, rel2


class TestFlashAttention:
    @pytest.mark.parametrize("s,skv", [(256, 256), (320, 256)])
    def test_vs_sdpa(self, s, skv):
        q = jnp.asarray(rng.normal(size=(1, 2, s, 128)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 2, skv, 128)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 2, skv, 128)), jnp.bfloat16)
        out = flash_attention(q, k, v, bq=256, bkv=256)
        ref = sdpa_reference(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        assert err < 0.05, err

    @pytest.mark.parametrize(
        "kw,tol",
        [(dict(lsum_mxu=True), 2e-2),
         (dict(fast_exp2=True), 5e-2),
         (dict(lsum_mxu=True, fast_exp2=True), 5e-2)],
    )
    def test_vpu_wall_variants(self, kw, tol):
        """Opt-in fixed-softmax variants (MXU row-sum denominator /
        Schraudolph exp2). Both measured SLOWER on-chip at FLUX shapes
        (2026-08-19, tools/probe_flash_variants.py) and stay off by
        default; this pins their numerics so the flags don't rot."""
        q = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)
        out = flash_attention(q, k, v, fixed_softmax=True, bq=256, bkv=256, **kw)
        ref = np.asarray(sdpa_reference(q, k, v), np.float32)
        rel = np.linalg.norm(np.asarray(out, np.float32) - ref) / np.linalg.norm(ref)
        assert rel < tol, (kw, rel)


class TestBlockSparseAttention:
    """vs masked-dense oracle (reference mha_fwd_block semantics,
    src/FluxModel.cpp:130-267)."""

    @pytest.mark.parametrize(
        "s,skv,ratio,bq,bkv",
        [(640, 640, 0.4, 128, 128), (512, 500, 0.5, 128, 128),
         (1024, 1024, 0.5, 256, 256)],
    )
    def test_vs_masked_oracle(self, s, skv, ratio, bq, bkv):
        q = jnp.asarray(rng.normal(size=(1, 2, s, 128)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 2, skv, 128)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 2, skv, 128)), jnp.bfloat16)
        idx = select_blocks(q, k, ratio, bq=bq, bkv=bkv)
        nk = -(-skv // bkv)
        assert idx.shape[-1] == max(1, int(nk * (1 - ratio)))  # topk count rule
        out = block_sparse_attention(
            q, k, v, sparsity_ratio=ratio, block_idx=idx, bq=bq, bkv=bkv
        )
        ref = block_sparse_reference(q, k, v, idx, bq=bq, bkv=bkv)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        assert err < 0.05, err

    def test_fixed_softmax_bshd_prescaled(self):
        """Model fast path: q prescaled by scale*log2e upstream, fixed-shift
        softmax, direct (B, S, H*D) output — must match the oracle."""
        b, h, s, d = 1, 2, 640, 128
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        idx = select_blocks(q, k, 0.5, bq=128, bkv=128)
        qp = (q.astype(jnp.float32) * (LOG2E / math.sqrt(d))).astype(jnp.bfloat16)
        out = block_sparse_attention(
            qp, k, v, sparsity_ratio=0.5, block_idx=idx, bq=128, bkv=128,
            scale=1.0, out_bshd=True, fixed_softmax=True,
        )
        assert out.shape == (b, s, h * d)
        ref = block_sparse_reference(q, k, v, idx, bq=128, bkv=128)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        assert err < 0.05, err

    def test_zero_sparsity_matches_dense(self):
        q = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.bfloat16)
        out = block_sparse_attention(q, k, v, sparsity_ratio=0.0)
        ref = sdpa_reference(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        assert err < 0.05, err


class TestW4A8:
    def test_dequant_pallas_matches_xla(self):
        """dequant_w4a8_pallas (VMEM rescale, no materialized f32 broadcast)
        must emit byte-identical int8 codes to the XLA fusion, plain and
        stacked+layer_idx."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import (
            dequant_w4a8_pallas,
            dequant_w4a8_to_int8,
        )

        rng_ = np.random.default_rng(31)
        k, n, g, L = 1024, 512, 64, 3
        qw = jnp.asarray(np.stack([
            np.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
            for _ in range(L)
        ]))
        rs = jnp.asarray(rng_.random((L, k // g, n)) + 0.5, jnp.bfloat16)
        ref = dequant_w4a8_to_int8(qw[1], rs[1])
        got = dequant_w4a8_pallas(qw[1], rs[1], bkk=512)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        got_stacked = dequant_w4a8_pallas(
            qw, rs[1], jnp.ones((), jnp.int32), bkk=512
        )
        np.testing.assert_array_equal(np.asarray(got_stacked), np.asarray(ref))

    def test_deq_pallas_route_matches_default(self, monkeypatch):
        """NUNCHAKU_TPU_W4A8_DEQ=pallas through the standalone w4a8 XLA-dot
        route must be bit-identical to the default XLA-fusion dequant (the
        flag is part of the jit cache key)."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

        rng_ = np.random.default_rng(33)
        m, k, n, g = 128, 512, 256, 64
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((32, n)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        qw = jnp.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
        rs = jnp.asarray(rng_.random((k // g, n)) + 0.5, jnp.bfloat16)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="w4a8")
        base = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu,
                              rescales=rs, precision="w4a8")
        monkeypatch.setenv("NUNCHAKU_TPU_W4A8_DEQ", "pallas")
        got = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu,
                             rescales=rs, precision="w4a8")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    def test_matches_int4_weights(self):
        """w4a8 stores the *same* int4 weights as int4 mode (int8 MXU only
        changes the activation/compute path): outputs agree to the int8
        activation-quantization noise level."""
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(1, 64, 512)), jnp.bfloat16)
        l4 = SVDQW4A4Linear.from_weights(w, b, rank=16, precision="int4")
        l48 = SVDQW4A4Linear.from_weights(w, b, rank=16, precision="w4a8")
        assert l48.qweight.shape == (256, 256)  # packed 4-bit
        np.testing.assert_array_equal(  # identical stored int4 values
            np.asarray(l4.qweight), np.asarray(l48.qweight)
        )
        o4 = l4(x).astype(jnp.float32)
        o48 = l48(x).astype(jnp.float32)
        # int8-per-token acts are *finer* than int4-per-64: differences stay
        # within the int4 act-quantization noise
        err = float(jnp.linalg.norm(o48 - o4) / (jnp.linalg.norm(o4) + 1e-9))
        assert err < 0.1, err
        # and w4a8 tracks the bf16 reference at least as well as int4
        ref = x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
        e48 = float(jnp.linalg.norm(o48 - ref) / jnp.linalg.norm(ref))
        e4 = float(jnp.linalg.norm(o4 - ref) / jnp.linalg.norm(ref))
        assert e48 <= e4 * 1.05, (e48, e4)

    def test_xla_dequant_equals_pallas(self, monkeypatch):
        """The default XLA path (dequant_w4a8_to_int8 + int8 dot) must be
        bit-identical to the Pallas hybrid kernel (explicit tiles force it):
        both compute w8 = clip(round(nibble * rs)) then exact int32 dots.
        The bf16 lora epilogue (an orthogonal, separately-bounded
        approximation) is pinned off so the property stays bit-exact."""
        monkeypatch.setenv("NUNCHAKU_TPU_XLA_LORA_BF16", "0")
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

        rng_ = np.random.default_rng(17)
        m, k, n, g = 64, 512, 256, 64
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((32, n)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng_.standard_normal(n) * 0.1, jnp.bfloat16)
        qw = jnp.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
        rs = jnp.asarray(rng_.random((k // g, n)) + 0.5, jnp.bfloat16)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="w4a8")

        pallas = svdq_gemm_w4a4(
            qa, asc, qw, ws, la, pu, bias, rescales=rs, precision="w4a8",
            bm=64, bn=128, bk=512,
        )
        xla = svdq_gemm_w4a4(
            qa, asc, qw, ws, la, pu, bias, rescales=rs, precision="w4a8",
        )
        np.testing.assert_array_equal(np.asarray(pallas), np.asarray(xla))

    @pytest.mark.parametrize("precision", ["int4", "nvfp4"])
    def test_int4_xla_route_matches_pallas(self, precision, monkeypatch):
        """Opt-in NUNCHAKU_TPU_INT4_XLA route (bf16 dequant + XLA dot) vs
        the Pallas plane-split kernel: same bf16 per-element dequant math,
        f32-accumulated dots — results agree to f32 summation-order noise."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora
        from nunchaku_tpu.ops.reference import GROUP_FP4, GROUP_INT4

        rng_ = np.random.default_rng(23)
        m, k, n = 64, 512, 256
        g = GROUP_INT4 if precision == "int4" else GROUP_FP4
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((32, n)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng_.standard_normal(n) * 0.1, jnp.bfloat16)
        qw = jnp.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
        ws = jnp.asarray(rng_.random((k // g, n)) * 0.01 + 0.001, jnp.bfloat16)
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision=precision)

        monkeypatch.delenv("NUNCHAKU_TPU_INT4_XLA", raising=False)
        pallas = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu, bias,
                                precision=precision)
        monkeypatch.setenv("NUNCHAKU_TPU_INT4_XLA", "1")
        xla = svdq_gemm_w4a4(qa, asc, qw, ws, la, pu, bias,
                             precision=precision)
        a = np.asarray(pallas, np.float32)
        b = np.asarray(xla, np.float32)
        err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert err < 2e-2, err

    def test_chain_w4a8_equals_int8_twin(self):
        """gelu_mlp on w4a8 linears (in-graph dequant + int8 chain) must be
        bit-identical to the same chain on int8 twins whose qweight is the
        dequantized w8 — the dequant-equivalence contract end-to-end."""
        import jax

        from nunchaku_tpu.models.attention import gelu_mlp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear
        from nunchaku_tpu.ops.gemm import dequant_w4a8_to_int8

        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        fc1 = SVDQW4A4Linear.random_init(k1, 512, 1024, rank=16, precision="w4a8")
        fc2 = SVDQW4A4Linear.random_init(k2, 1024, 512, rank=16, precision="w4a8")

        def twin(lin):
            w8 = dequant_w4a8_to_int8(lin.qweight, lin.rescales)
            return SVDQW4A4Linear(
                w8, lin.wscales, lin.smooth, lin.proj_down, lin.proj_up,
                lin.bias, precision="int8", act_unsigned=lin.act_unsigned,
            )

        x = jax.random.normal(k3, (1, 64, 512), jnp.bfloat16)
        out_w4a8 = gelu_mlp(fc1, fc2, x)
        out_int8 = gelu_mlp(twin(fc1), twin(fc2), x)
        np.testing.assert_array_equal(
            np.asarray(out_w4a8), np.asarray(out_int8)
        )

    def test_w4a8_hoisted_matches_per_mtile_kernel(self, monkeypatch):
        """The hoisted-dequant Pallas route (W4A8_XLA=0, default tiles) must
        be bit-identical to the per-M-tile hybrid kernel (explicit tiles):
        same clip(round(nibble*rs)) stripes, same int32 plane dots, same f32
        epilogue — only the dequant schedule differs."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

        rng_ = np.random.default_rng(29)
        m, k, n, g = 128, 512, 256, 64
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((32, n)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng_.standard_normal(n) * 0.1, jnp.bfloat16)
        qw = jnp.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
        rs = jnp.asarray(rng_.random((k // g, n)) + 0.5, jnp.bfloat16)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="w4a8")

        per_mtile = svdq_gemm_w4a4(
            qa, asc, qw, ws, la, pu, bias, rescales=rs, precision="w4a8",
            bm=64, bn=128, bk=512,
        )
        monkeypatch.setenv("NUNCHAKU_TPU_W4A8_XLA", "0")
        hoisted = svdq_gemm_w4a4(
            qa, asc, qw, ws, la, pu, bias, rescales=rs, precision="w4a8",
        )
        np.testing.assert_array_equal(np.asarray(hoisted), np.asarray(per_mtile))

    def test_w4a8_fused_chain_matches_dequant_route(self, monkeypatch):
        """gelu_mlp's packed chain (W4A8_FUSED=1: int4 planes dequantized
        into the chain kernels' VMEM scratches) must be bit-identical to the
        in-graph-dequant + int8-chain route (W4A8_FUSED=0) — both feed the
        same int8 stripes to the same dots and epilogues."""
        import jax

        from nunchaku_tpu.models.attention import gelu_mlp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        fc1 = SVDQW4A4Linear.random_init(k1, 512, 1024, rank=16, precision="w4a8")
        fc2 = SVDQW4A4Linear.random_init(k2, 1024, 512, rank=16, precision="w4a8")
        x = jax.random.normal(k3, (1, 64, 512), jnp.bfloat16)

        monkeypatch.setenv("NUNCHAKU_TPU_W4A8_FUSED", "1")
        fused = gelu_mlp(fc1, fc2, x)
        monkeypatch.setenv("NUNCHAKU_TPU_W4A8_FUSED", "0")
        dequant = gelu_mlp(fc1, fc2, x)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(dequant))

    def test_lora_bf16_epilogue_drift_bound(self, monkeypatch):
        """Default-on NUNCHAKU_TPU_XLA_LORA_BF16 (main dot materializes
        bf16 before the lora-up add — halves the inter-fusion HBM traffic;
        on-chip −10 ms/step at FLUX 1024px). The added rounding must stay
        inside the bf16-output envelope: < 1% vs the exact f32 epilogue."""
        from nunchaku_tpu.ops.gemm import _gemm_w8a8_xla

        rng_ = np.random.default_rng(11)
        m, k, n, r = 128, 512, 256, 32
        qact = jnp.asarray(rng_.integers(-127, 128, (m, k)), jnp.int8)
        asc = jnp.asarray(rng_.uniform(0.5, 2, (m,)) * 0.01, jnp.float32)
        qw = jnp.asarray(rng_.integers(-127, 128, (k, n)), jnp.int8)
        wsc = jnp.asarray(rng_.uniform(0.5, 2, (n,)) * 0.01, jnp.float32)
        la = jnp.asarray(rng_.standard_normal((m, r)), jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((r, n)), jnp.bfloat16)

        monkeypatch.setenv("NUNCHAKU_TPU_XLA_LORA_BF16", "0")
        exact = np.asarray(
            _gemm_w8a8_xla(qact, asc, qw, wsc, la, pu, None, jnp.bfloat16),
            np.float32)
        monkeypatch.setenv("NUNCHAKU_TPU_XLA_LORA_BF16", "1")
        fast = np.asarray(
            _gemm_w8a8_xla(qact, asc, qw, wsc, la, pu, None, jnp.bfloat16),
            np.float32)
        rel = np.linalg.norm(fast - exact) / np.linalg.norm(exact)
        assert rel < 1e-2, rel


class TestNvfp4A8:
    """nvfp4-a8 serving mode: e2m1-coded w4a8 (wcodes="e2m1"). The packed
    nvfp4 nibbles decode arithmetically to the fp4 grid before the rescale,
    then ride the unmodified int8 kernels — the same dequant-pass ladder
    trick that took int4 w4a8 from 499 to 331 ms/step. Reference: its fp4
    path is the FAST mode (gemm_w4a4.cuh:274); ours must not stay at the
    1025.8 ms in-kernel-decode route."""

    @staticmethod
    def _e2m1_np(c):
        a = np.abs(c.astype(np.int32))
        e, m2 = a >> 1, (a & 1).astype(np.float32)
        mag = np.where(e == 0, 0.5 * m2, (1.0 + 0.5 * m2) * np.exp2(np.maximum(e - 1, 0)))
        return np.where(c < 0, -mag, mag)

    def test_dequant_e2m1_matches_numpy(self):
        """dequant_w4a8_to_int8(codes='e2m1') == clip(round(e2m1(c)*rs))
        at the nvfp4 group size (16)."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import dequant_w4a8_to_int8

        rng_ = np.random.default_rng(5)
        k, n, g = 512, 256, 16
        codes = rng_.integers(-7, 8, (k, n))
        rs = (rng_.random((k // g, n)) * 20 + 0.5).astype(np.float32)
        rs_b = np.asarray(jnp.asarray(rs, jnp.bfloat16), np.float32)
        ref = np.clip(
            np.round(self._e2m1_np(codes) * np.repeat(rs_b, g, axis=0)),
            -127, 127,
        ).astype(np.int8)
        got = dequant_w4a8_to_int8(
            pack_int4(jnp.asarray(codes), axis=0),
            jnp.asarray(rs, jnp.bfloat16), codes="e2m1",
        )
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_dequant_e2m1_pallas_matches_xla(self):
        """The Pallas dequant pass must emit byte-identical int8 codes to
        the XLA fusion for e2m1 nibbles too (plain and stacked)."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import (
            dequant_w4a8_pallas,
            dequant_w4a8_to_int8,
        )

        rng_ = np.random.default_rng(7)
        k, n, g, L = 1024, 512, 16, 2
        qw = jnp.asarray(np.stack([
            np.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
            for _ in range(L)
        ]))
        rs = jnp.asarray(rng_.random((L, k // g, n)) * 20 + 0.5, jnp.bfloat16)
        ref = dequant_w4a8_to_int8(qw[1], rs[1], codes="e2m1")
        got = dequant_w4a8_pallas(qw[1], rs[1], bkk=512, codes="e2m1")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        got_stacked = dequant_w4a8_pallas(
            qw, rs[1], jnp.ones((), jnp.int32), bkk=512, codes="e2m1"
        )
        np.testing.assert_array_equal(np.asarray(got_stacked), np.asarray(ref))

    def test_gemm_e2m1_matches_int8_on_dequanted(self):
        """svdq_gemm_w4a4(wcodes='e2m1') == the int8 GEMM on the dequanted
        weights — bit-identical (it IS that route)."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import dequant_w4a8_to_int8, svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

        rng_ = np.random.default_rng(13)
        m, k, n, g = 128, 512, 256, 16
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((32, n)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng_.standard_normal(n) * 0.1, jnp.bfloat16)
        qw = jnp.asarray(pack_int4(rng_.integers(-7, 8, (k, n)), axis=0))
        rs = jnp.asarray(rng_.random((k // g, n)) * 20 + 0.5, jnp.bfloat16)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="w4a8")

        got = svdq_gemm_w4a4(
            qa, asc, qw, ws, la, pu, bias, rescales=rs, precision="w4a8",
            wcodes="e2m1",
        )
        w8 = dequant_w4a8_to_int8(qw, rs, codes="e2m1")
        ref = svdq_gemm_w4a4(
            qa, asc, w8, ws, la, pu, bias, precision="int8",
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_chain_e2m1_equals_int8_twin(self):
        """gelu_mlp on e2m1-coded w4a8 linears routes through the dequant
        pass (never the packed int4 chain) and matches the int8 twins
        bit-exactly."""
        import jax

        from nunchaku_tpu.models.attention import gelu_mlp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear
        from nunchaku_tpu.ops.gemm import dequant_w4a8_to_int8

        key = jax.random.PRNGKey(17)
        k1, k2, k3 = jax.random.split(key, 3)

        def mk(kk, kin, nout):
            lin = SVDQW4A4Linear.random_init(kk, kin, nout, rank=16,
                                             precision="w4a8")
            # re-shape rescales to the nvfp4 group (16) and mark e2m1 codes
            g16 = jax.random.uniform(kk, (kin // 16, nout), jnp.bfloat16,
                                     1.0, 127.0 / 6.0)
            lin.rescales = g16
            lin.wcodes = "e2m1"
            return lin

        fc1, fc2 = mk(k1, 512, 1024), mk(k2, 1024, 512)
        x = jax.random.normal(k3, (1, 64, 512), jnp.bfloat16)

        def twin(lin):
            w8 = dequant_w4a8_to_int8(lin.qweight, lin.rescales, codes="e2m1")
            return SVDQW4A4Linear(
                w8, lin.wscales, lin.smooth, lin.proj_down, lin.proj_up,
                lin.bias, precision="int8", act_unsigned=lin.act_unsigned,
            )

        out = gelu_mlp(fc1, fc2, x)
        ref = gelu_mlp(twin(fc1), twin(fc2), x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_requantize_nvfp4_to_w4a8(self):
        """requantize_svdq(nvfp4 -> w4a8) keeps the packed e2m1 codes
        (wcodes='e2m1'), and the serving twin stays within the re-rounding
        envelope of the nvfp4 twin (same <2% contract as int4 w4a8)."""
        import jax

        from nunchaku_tpu.models.bf16_ref import _svdq_weight
        from nunchaku_tpu.models.linear import SVDQW4A4Linear
        from nunchaku_tpu.models.requantize import requantize_svdq

        key = jax.random.PRNGKey(23)
        w = jax.random.normal(key, (512, 256), jnp.bfloat16) * 0.02
        lin = SVDQW4A4Linear.from_weights(w, precision="nvfp4", key=key)
        out = requantize_svdq(lin, "w4a8")
        assert out.precision == "w4a8" and out.wcodes == "e2m1"
        assert out.rescales.shape[0] == 512 // 16
        w_ref, _ = _svdq_weight(lin)
        w_got, _ = _svdq_weight(out)
        rel = float(
            jnp.linalg.norm(w_got - w_ref) / (jnp.linalg.norm(w_ref) + 1e-9)
        )
        assert rel < 0.02, rel


class TestGeluQuantChain:
    """Fused GELU_QUANT chain (reference src/Linear.cpp:270-438): producer
    GEMM emits the consumer's int8 activations + grouped scales + lora_act;
    the pair must match the unfused fc1 -> XLA gelu -> quantize -> fc2 path."""

    @pytest.mark.parametrize("act_unsigned", [False, True])
    def test_chain_matches_unfused(self, act_unsigned):
        from nunchaku_tpu.models.attention import _can_chain, gelu_mlp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        fc1 = SVDQW4A4Linear.random_init(jax.random.PRNGKey(0), 512, 1024, precision="int8")
        fc2 = SVDQW4A4Linear.random_init(
            jax.random.PRNGKey(1), 1024, 512, precision="int8", act_unsigned=act_unsigned
        )
        fc2.smooth = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (1024,), jnp.bfloat16)) + 0.5
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 512), jnp.bfloat16)
        assert _can_chain(fc1, fc2, 128)
        fused = np.asarray(gelu_mlp(fc1, fc2, x), np.float32)
        h = fc1(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True)
        ref = np.asarray(fc2(h.astype(jnp.bfloat16)), np.float32)
        err = np.linalg.norm(fused - ref) / np.linalg.norm(ref)
        # grouped (finer) scales differ slightly from per-token scales
        assert err < 0.03, err

    def test_grouped_scale_consumer_matches_per_token(self):
        """The grouped-as int8 GEMM with replicated groups == per-token path."""
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4

        rng = np.random.default_rng(0)
        m, k, n = 256, 512, 256
        qa = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        asc = jnp.asarray(rng.random((1, m)) * 0.01 + 0.001, jnp.float32)
        qw = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.asarray(rng.random((1, n)) * 0.01 + 0.001, jnp.float32)
        ref = np.asarray(svdq_gemm_w4a4(qa, asc, qw, ws, precision="int8"), np.float32)
        grouped = jnp.tile(asc, (2, 1))  # 2 identical k-groups of 256
        out = np.asarray(svdq_gemm_w4a4(qa, grouped, qw, ws, precision="int8"), np.float32)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=1e-4)

    def test_ptoken_producer_matches_oracle(self):
        """Per-token-scale producer (ptoken=True: full-row scratch, one
        scale per token — the reference's own granularity,
        gemm_w4a4.cuh:931) vs a jnp oracle of the exact epilogue math:
        int32 dot, f32 scales, tanh-GELU, bf16 lora-down dot, shift,
        1/smooth, per-row absmax/127 quantize."""
        from nunchaku_tpu.ops.gemm import _tanh_gelu, svdq_gemm_w8a8_gelu_quant

        rng_ = np.random.default_rng(17)
        m, k, n, r, shift = 128, 512, 1024, 32, 0.171875
        qa = jnp.asarray(rng_.integers(-127, 128, (m, k)), jnp.int8)
        asc = jnp.asarray(rng_.random((1, m)) * 0.01 + 0.001, jnp.float32)
        qw = jnp.asarray(rng_.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        la = jnp.asarray(rng_.standard_normal((m, r)) * 0.05, jnp.bfloat16)
        pu = jnp.asarray(rng_.standard_normal((r, n)) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng_.standard_normal(n) * 0.1, jnp.bfloat16)
        rsm = jnp.asarray(np.abs(rng_.standard_normal(n)) + 0.5, jnp.float32)
        pd = jnp.asarray(rng_.standard_normal((n, r)) * 0.05, jnp.bfloat16)

        qout, qs, lp = svdq_gemm_w8a8_gelu_quant(
            qa, asc, qw, ws, la, pu, bias, rsm, pd,
            act_unsigned_next=True, gelu_shift=shift, ptoken=True, bn=512,
        )
        assert qs.shape == (1, m) and lp.shape == (m, r)

        d = jax.lax.dot_general(
            qa, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        out = d * asc.reshape(m, 1) * ws
        out = out + jnp.dot(la, pu, preferred_element_type=jnp.float32)
        out = out + bias.astype(jnp.float32)
        g = _tanh_gelu(out)
        lp_ref = jnp.dot(g.astype(jnp.bfloat16), pd,
                         preferred_element_type=jnp.float32)
        h = (g + shift) * rsm.reshape(1, n)
        scale = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
        q_ref = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)

        np.testing.assert_array_equal(np.asarray(qout), np.asarray(q_ref))
        np.testing.assert_allclose(
            np.asarray(qs).ravel(), np.asarray(scale).ravel(), rtol=1e-6)
        # lp sums per-N-tile partials (f32 scratch) where the oracle does
        # one full-N dot — association order differs by ~1e-4
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lp_ref), rtol=1e-3, atol=1e-3)

    def test_ptoken_chain_pair_matches_grouped_pair(self):
        """gelu_mlp with the per-token producer feeding the plain int8
        consumer must agree with the grouped-scale default pair to within
        quantization granularity (per-token scales are coarser than
        per-(token, N-tile) groups)."""
        from nunchaku_tpu.models.attention import gelu_mlp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        fc1 = SVDQW4A4Linear.random_init(
            jax.random.PRNGKey(0), 512, 1024, precision="int8")
        fc2 = SVDQW4A4Linear.random_init(
            jax.random.PRNGKey(1), 1024, 512, precision="int8",
            act_unsigned=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 512), jnp.bfloat16)
        import os

        os.environ["NUNCHAKU_TPU_CHAIN_PTOKEN"] = "1"
        try:
            ptok = np.asarray(gelu_mlp(fc1, fc2, x), np.float32)
        finally:
            os.environ.pop("NUNCHAKU_TPU_CHAIN_PTOKEN")
        grouped = np.asarray(gelu_mlp(fc1, fc2, x), np.float32)
        err = np.linalg.norm(ptok - grouped) / np.linalg.norm(grouped)
        assert err < 0.02, err


def test_flash_attention_i8_matches_oracle():
    """int8-QK fixed-shift flash vs the f32 SDPA oracle (SageAttention-style
    per-token scales; logit contract: scale*log2e folded into q pre-quant)."""
    import math
    from nunchaku_tpu.ops.attention import (
        LOG2E, flash_attention_i8, quantize_qk, sdpa_reference,
    )

    rng = np.random.default_rng(5)
    B, H, S, D = 1, 2, 384, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    qp = (q.astype(jnp.float32) * (LOG2E / math.sqrt(D))).astype(jnp.bfloat16)
    q8, qs, k8, ks = quantize_qk(qp, k)
    out = flash_attention_i8(q8, qs, k8, ks, v)
    ref = sdpa_reference(q, k, v)
    err = np.linalg.norm(np.asarray(out, np.float32) - np.asarray(ref, np.float32)) / np.linalg.norm(
        np.asarray(ref, np.float32)
    )
    assert err < 3e-2, err

    # bshd output layout matches the transposed default
    o2 = flash_attention_i8(q8, qs, k8, ks, v, out_bshd=True)
    o1 = np.asarray(out, np.float32).transpose(0, 2, 1, 3).reshape(B, S, H * D)
    np.testing.assert_allclose(np.asarray(o2, np.float32), o1, rtol=0, atol=1e-6)


class TestLnModQuantProducer:
    """Fused LN+modulate+int8-quantize Pallas producer vs the XLA
    composition (ops/quantize.ln_mod_quant_int8)."""

    def test_vs_xla_composition(self):
        from nunchaku_tpu.ops.quantize import ln_mod_quant_int8

        B, S, K, R = 2, 64, 256, 32
        x = jnp.asarray(rng.normal(size=(B, S, K)), jnp.bfloat16)
        sc = jnp.asarray(rng.normal(size=(B, K)) * 0.1, jnp.bfloat16)
        sh = jnp.asarray(rng.normal(size=(B, K)) * 0.1, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng.normal(size=(K,))) + 0.5, jnp.bfloat16)
        pd = jnp.asarray(rng.normal(size=(K, R)) * 0.05, jnp.bfloat16)

        q, s, la = ln_mod_quant_int8(x, sc, sh, sm, pd, bm=32)

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)) \
            * (1 + sc.astype(jnp.float32))[:, None] \
            + sh.astype(jnp.float32)[:, None]
        y2 = y.reshape(B * S, K).astype(jnp.bfloat16)
        q2, s2, la2 = quantize_w4a4_act_fuse_lora(y2, pd, sm, precision="int8")

        # the kernel keeps f32 through modulation (the XLA path rounds to
        # bf16 first): codes agree except +-1 LSB ties
        match = float(jnp.mean((q == q2).astype(jnp.float32)))
        assert match > 0.9, match
        err = jnp.max(jnp.abs(q.astype(jnp.int32) - q2.astype(jnp.int32)))
        assert int(err) <= 1, int(err)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s2.reshape(1, -1)), rtol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(la2), atol=2e-2
        )

    def test_plain_quantize_mode(self):
        """apply_ln=False / mods=None reduces to the plain int8 quantize."""
        from nunchaku_tpu.ops.quantize import ln_mod_quant_int8

        B, S, K, R = 1, 64, 256, 32
        x = jnp.asarray(rng.normal(size=(B, S, K)), jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng.normal(size=(K,))) + 0.5, jnp.bfloat16)
        pd = jnp.asarray(rng.normal(size=(K, R)) * 0.05, jnp.bfloat16)
        q, s, la = ln_mod_quant_int8(x, None, None, sm, pd, bm=32, apply_ln=False)
        q2, s2, la2 = quantize_w4a4_act_fuse_lora(
            x.reshape(B * S, K), pd, sm, precision="int8"
        )
        assert float(jnp.mean((q == q2).astype(jnp.float32))) > 0.98
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(s2.reshape(1, -1)), rtol=1e-4
        )


class TestFlashKvUnroll:
    def test_unroll2_matches_unroll1(self):
        b, h, s, d = 1, 2, 640, 128  # ragged vs 2*bkv=256
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        o1 = flash_attention(q, k, v, bq=128, bkv=128, fixed_softmax=True)
        o2 = flash_attention(
            q, k, v, bq=128, bkv=128, fixed_softmax=True, kv_unroll=2
        )
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        assert err < 0.02, err


class TestQkvRopeProducerShared:
    def test_shared_buffer_matches_concat(self):
        """Dual-stream shared-buffer mode (both calls writing one
        (B, H, S_joint, D) buffer set via input_output_aliases) must equal
        running each stream standalone and concatenating on the S axis."""
        from nunchaku_tpu.ops.attention import qkv_rope_producer

        b, heads, d = 1, 2, 64
        s_txt, s_img = 128, 256
        half = d // 2
        rng_ = np.random.default_rng(7)
        qkv_i = jnp.asarray(rng_.normal(size=(b, s_img, 3 * heads * d)), jnp.bfloat16)
        qkv_t = jnp.asarray(rng_.normal(size=(b, s_txt, 3 * heads * d)), jnp.bfloat16)
        ang = rng_.normal(size=(s_txt + s_img, half))
        cos = jnp.asarray(np.concatenate([np.cos(ang)] * 2, -1), jnp.float32)
        sin = jnp.asarray(
            np.concatenate([-np.sin(ang), np.sin(ang)], -1), jnp.float32
        )
        nq = jnp.asarray(rng_.normal(size=(d,)), jnp.bfloat16)
        nk = jnp.asarray(rng_.normal(size=(d,)), jnp.bfloat16)
        kw = dict(heads=heads, head_dim=d, q_scale=0.25, bm=128)

        ref_i = qkv_rope_producer(qkv_i, cos[s_txt:], sin[s_txt:], nq, nk, **kw)
        ref_t = qkv_rope_producer(qkv_t, cos[:s_txt], sin[:s_txt], nq, nk, **kw)
        ref = [jnp.concatenate([t, i], axis=2) for t, i in zip(ref_t, ref_i)]

        q, k, v = qkv_rope_producer(
            qkv_i, cos[s_txt:], sin[s_txt:], nq, nk,
            out_s=s_txt + s_img, s_offset=s_txt, **kw,
        )
        q, k, v = qkv_rope_producer(
            qkv_t, cos[:s_txt], sin[:s_txt], nq, nk,
            alias_outs=(q, k, v), **kw,
        )
        for got, want in zip((q, k, v), ref):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_shared_buffer_alignment_check(self):
        from nunchaku_tpu.ops.attention import qkv_rope_producer

        qkv = jnp.zeros((1, 100, 3 * 2 * 64), jnp.bfloat16)
        cos = jnp.zeros((100, 64), jnp.float32)
        with pytest.raises(ValueError, match="bm-aligned"):
            qkv_rope_producer(
                qkv, cos, cos, jnp.ones((64,)), jnp.ones((64,)),
                heads=2, head_dim=64, bm=128, out_s=384, s_offset=128,
            )


def test_gelu_quant_chain_pipelined_matches_plain():
    """The software-pipelined chain kernel (lagged epilogue, nj+1 grid)
    must produce bit-identical outputs to the plain dot->epilogue kernel."""
    from nunchaku_tpu.ops.gemm import svdq_gemm_w8a8_gelu_quant

    rng_ = np.random.default_rng(11)
    m, k, n, r = 256, 512, 1024, 32
    qa = jnp.asarray(rng_.integers(-127, 128, (m, k)), jnp.int8)
    asc = jnp.asarray(rng_.random((1, m)) * 0.01 + 0.001, jnp.float32)
    qw = jnp.asarray(rng_.integers(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
    la = jnp.asarray(rng_.standard_normal((m, r)) * 0.1, jnp.float32)
    pu = jnp.asarray(rng_.standard_normal((r, n)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng_.standard_normal((n,)) * 0.1, jnp.float32)
    rsm = jnp.asarray(rng_.random((n,)) + 0.5, jnp.float32)
    pd = jnp.asarray(rng_.standard_normal((n, r)) * 0.1, jnp.bfloat16)

    kw = dict(act_unsigned_next=True, bm=128, bn=256)
    plain = svdq_gemm_w8a8_gelu_quant(
        qa, asc, qw, ws, la, pu, b, rsm, pd, pipelined=False, **kw
    )
    pipe = svdq_gemm_w8a8_gelu_quant(
        qa, asc, qw, ws, la, pu, b, rsm, pd, pipelined=True, **kw
    )
    for p, q_ in zip(plain, pipe):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q_))


class TestStackedWeightPrefetch:
    """Scalar-prefetch stacked-weight mode: kernels read layer l's weight
    tile straight from an (L, K, N) stack — must equal slicing first."""

    def test_chain_producer_stacked(self):
        from nunchaku_tpu.ops.gemm import svdq_gemm_w8a8_gelu_quant

        rng_ = np.random.default_rng(3)
        L, m, k, n, r = 3, 128, 256, 512, 32
        qa = jnp.asarray(rng_.integers(-127, 128, (m, k)), jnp.int8)
        asc = jnp.asarray(rng_.random((1, m)) * 0.01 + 0.001, jnp.float32)
        qws = jnp.asarray(rng_.integers(-127, 128, (L, k, n)), jnp.int8)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        rsm = jnp.asarray(rng_.random((n,)) + 0.5, jnp.float32)
        pd = jnp.asarray(rng_.standard_normal((n, r)) * 0.1, jnp.bfloat16)
        kw = dict(bm=128, bn=256)
        for i in range(L):
            ref = svdq_gemm_w8a8_gelu_quant(
                qa, asc, qws[i], ws, None, None, None, rsm, pd, **kw
            )
            got = svdq_gemm_w8a8_gelu_quant(
                qa, asc, qws, ws, None, None, None, rsm, pd,
                layer_idx=jnp.int32(i), **kw
            )
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_consumer_grouped_stacked(self):
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4

        rng_ = np.random.default_rng(4)
        L, m, k, n = 3, 128, 512, 256
        qa = jnp.asarray(rng_.integers(-127, 128, (m, k)), jnp.int8)
        asc = jnp.asarray(rng_.random((2, m)) * 0.01 + 0.001, jnp.float32)  # 2 groups
        qws = jnp.asarray(rng_.integers(-127, 128, (L, k, n)), jnp.int8)
        ws = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        for i in range(L):
            ref = svdq_gemm_w4a4(qa, asc, qws[i], ws, precision="int8")
            got = svdq_gemm_w4a4(
                qa, asc, qws, ws, precision="int8", layer_idx=jnp.int32(i)
            )
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_w4a8_int4_stacked(self):
        """Stacked-weight prefetch on the packed-int4 kernels (w4a8 + int4
        paths) must equal slicing the (L, K/2, N) stack first."""
        from nunchaku_tpu.core.packing import pack_int4
        from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
        from nunchaku_tpu.ops.quantize import quantize_w4a4_act_fuse_lora

        rng_ = np.random.default_rng(9)
        L, m, k, n, g = 2, 64, 512, 256, 64
        x = jnp.asarray(rng_.standard_normal((m, k)), jnp.bfloat16)
        pd = jnp.asarray(rng_.standard_normal((k, 32)) * 0.05, jnp.bfloat16)
        sm = jnp.asarray(np.abs(rng_.standard_normal(k)) + 0.5, jnp.bfloat16)
        w4 = rng_.integers(-7, 8, (L, k, n))
        qws = jnp.stack([jnp.asarray(pack_int4(np.asarray(w4[i]), axis=0)) for i in range(L)])
        ws = jnp.asarray(rng_.random((k // g, n)) * 0.01 + 0.001, jnp.bfloat16)

        # int4 path
        qa, asc, la = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="int4")
        for i in range(L):
            ref = svdq_gemm_w4a4(qa, asc, qws[i], ws, precision="int4")
            got = svdq_gemm_w4a4(
                qa, asc, qws, ws, precision="int4", layer_idx=jnp.int32(i)
            )
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

        # w4a8 path (int8 acts + in-kernel weight rescale)
        qa8, asc8, _ = quantize_w4a4_act_fuse_lora(x, pd, sm, precision="int8")
        rs = jnp.asarray(rng_.random((k // g, n)) + 0.5, jnp.bfloat16)
        ws1 = jnp.asarray(rng_.random((1, n)) * 0.01 + 0.001, jnp.float32)
        for i in range(L):
            ref = svdq_gemm_w4a4(
                qa8, asc8, qws[i], ws1, rescales=rs, precision="w4a8"
            )
            got = svdq_gemm_w4a4(
                qa8, asc8, qws, ws1, rescales=rs, precision="w4a8",
                layer_idx=jnp.int32(i),
            )
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestBatchedOperands:
    """Native (B, S, ·) operands: batched results equal per-row 2D results
    (the 3D path exists so no flatten-reshape sits at the Pallas custom-call
    boundary at B>1 — the layout-copy source, tools/bench_batch.py)."""

    def _mk(self, precision, b=2, s=256, k=512, n=768, r=16, seed=0):
        import jax
        import jax.numpy as jnp
        from nunchaku_tpu.models.linear import SVDQW4A4Linear

        lin = SVDQW4A4Linear.random_init(
            jax.random.PRNGKey(seed), k, n, rank=r, precision=precision
        )
        x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, s, k),
                              jnp.bfloat16)
        return lin, x

    @pytest.mark.parametrize("precision", ["int8", "w4a8", "int4"])
    def test_linear_batched_equals_per_row(self, precision):
        import numpy as np

        lin, x = self._mk(precision)
        out3 = lin(x)
        assert out3.shape[:2] == x.shape[:2]
        rows = [lin(x[i : i + 1])[0] for i in range(x.shape[0])]
        np.testing.assert_allclose(
            np.asarray(out3, np.float32),
            np.stack([np.asarray(r_, np.float32) for r_ in rows]),
            atol=2e-2, rtol=0,
        )

    def test_forward_modulated_batched(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        lin, x = self._mk("int8")
        b, s, k = x.shape
        scale = jax.random.normal(jax.random.PRNGKey(5), (b, k), jnp.bfloat16)
        shift = jax.random.normal(jax.random.PRNGKey(6), (b, k), jnp.bfloat16)
        out3 = lin.forward_modulated(x, scale, shift)
        rows = [
            lin.forward_modulated(x[i : i + 1], scale[i : i + 1],
                                  shift[i : i + 1])[0]
            for i in range(b)
        ]
        np.testing.assert_allclose(
            np.asarray(out3, np.float32),
            np.stack([np.asarray(r_, np.float32) for r_ in rows]),
            atol=2e-2, rtol=0,
        )

    @pytest.mark.parametrize("precision", ["int8", "w4a8"])
    def test_gelu_mlp_batched(self, precision):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from nunchaku_tpu.models.attention import FeedForward, gelu_mlp

        ff = FeedForward.random_init(
            jax.random.PRNGKey(0), 512, mult=2, rank=16, precision=precision
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 512),
                              jnp.bfloat16)
        out3 = gelu_mlp(ff.fc1, ff.fc2, x)
        rows = [gelu_mlp(ff.fc1, ff.fc2, x[i : i + 1])[0] for i in range(2)]
        np.testing.assert_allclose(
            np.asarray(out3, np.float32),
            np.stack([np.asarray(r_, np.float32) for r_ in rows]),
            atol=2e-2, rtol=0,
        )


def test_grouped_xla_consumer_matches_pallas(monkeypatch):
    """NUNCHAKU_TPU_GROUPED_XLA=1 routes the chain consumer's grouped-scale
    int8 GEMM through per-group XLA dots — must match the Pallas grouped-as
    kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4

    m, k, n, ga, r = 256, 1024, 512, 4, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    qact = jax.random.randint(ks[0], (m, k), -127, 128, jnp.int8)
    asc = jax.random.uniform(ks[1], (ga, m), jnp.float32, 0.001, 0.02)
    qw = jax.random.randint(ks[2], (k, n), -127, 128, jnp.int8)
    ws = jax.random.uniform(ks[3], (1, n), jnp.float32, 0.001, 0.02)
    la = jax.random.normal(ks[4], (m, r), jnp.float32)
    pu = jax.random.normal(ks[5], (r, n), jnp.bfloat16) * 0.1
    bias = jnp.ones((n,), jnp.float32) * 0.3

    monkeypatch.delenv("NUNCHAKU_TPU_GROUPED_XLA", raising=False)
    ref = svdq_gemm_w4a4(qact, asc, qw, ws, la, pu, bias, precision="int8")
    monkeypatch.setenv("NUNCHAKU_TPU_GROUPED_XLA", "1")
    got = svdq_gemm_w4a4(qact, asc, qw, ws, la, pu, bias, precision="int8")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=0,
    )
