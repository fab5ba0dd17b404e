"""Isolate VPU cost components of the W4A4 GEMM kernel at fc1 shape."""
import functools, time, numpy as np, jax, jax.numpy as jnp, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")

M, K, N = 4608, 3072, 12288
BM, BN, BK = 512, 1024, 512
rng = np.random.default_rng(0)
qa = jnp.asarray(rng.integers(-127, 128, (M, K//2)), jnp.int8)
qa8 = jnp.asarray(rng.integers(-7, 8, (M, K)), jnp.int8)
asc = jnp.asarray(rng.random((K//64, M)), jnp.bfloat16)
qw = jnp.asarray(rng.integers(-127, 128, (K//2, N)), jnp.int8)
qw8 = jnp.asarray(rng.integers(-7, 8, (K, N)), jnp.int8)
ws = jnp.asarray(rng.random((K//64, N)), jnp.bfloat16)
wbf = jnp.asarray(rng.random((K, N)), jnp.bfloat16)
abf = jnp.asarray(rng.random((M, K)), jnp.bfloat16)

def timed(name, f, *a, flops=2*M*K*N, n=30):
    r = f(*a); _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.3f} ms {flops/dt/1e12:.1f} TF/s")

def grid_call(kernel, inputs, in_specs):
    return pl.pallas_call(
        kernel, grid=(M//BM, N//BN, K//BK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i,j,k:(i,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )(*inputs)

S_A = pl.BlockSpec((BM, BK//2), lambda i,j,k:(i,k), memory_space=pltpu.VMEM)
S_A8 = pl.BlockSpec((BM, BK), lambda i,j,k:(i,k), memory_space=pltpu.VMEM)
S_AS = pl.BlockSpec((BK//64, BM), lambda i,j,k:(k,i), memory_space=pltpu.VMEM)
S_W = pl.BlockSpec((BK//2, BN), lambda i,j,k:(k,j), memory_space=pltpu.VMEM)
S_W8 = pl.BlockSpec((BK, BN), lambda i,j,k:(k,j), memory_space=pltpu.VMEM)
S_WS = pl.BlockSpec((BK//64, BN), lambda i,j,k:(k,j), memory_space=pltpu.VMEM)
S_ABF = pl.BlockSpec((BM, BK), lambda i,j,k:(i,k), memory_space=pltpu.VMEM)
S_WBF = pl.BlockSpec((BK, BN), lambda i,j,k:(k,j), memory_space=pltpu.VMEM)

def mm_tail(acc_ref, out_ref, a, w):
    k = pl.program_id(2); nk = pl.num_programs(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[...] += jnp.dot(a, w, preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): out_ref[...] = acc_ref[...].astype(jnp.bfloat16)

# V_base: pure bf16 matmul in same grid (ceiling)
def k_bf(a_ref, w_ref, out_ref, acc_ref):
    mm_tail(acc_ref, out_ref, a_ref[...], w_ref[...])
timed("V_base bf16 mm", jax.jit(lambda a,w: grid_call(k_bf, (a,w), [S_ABF, S_WBF])), abf, wbf)

# V1: unpack both, no scales
def unpack_l(p, uns=False):
    s, pd = p.shape
    p3 = p.astype(jnp.int32).reshape(s, pd//128, 128)
    lo = (p3 << 28) >> 28; hi = (p3 << 24) >> 28
    return jnp.stack([lo, hi], 2).reshape(s, 2*pd)
def unpack_s(p):
    pd, n = p.shape
    p3 = p.astype(jnp.int32).reshape(pd//128, 128, n)
    lo = (p3 << 28) >> 28; hi = (p3 << 24) >> 28
    return jnp.stack([lo, hi], 1).reshape(2*pd, n)
def k_v1(a_ref, w_ref, out_ref, acc_ref):
    a = unpack_l(a_ref[...]).astype(jnp.bfloat16)
    w = unpack_s(w_ref[...]).astype(jnp.bfloat16)
    mm_tail(acc_ref, out_ref, a, w)
timed("V1 unpack only  ", jax.jit(lambda a,w: grid_call(k_v1, (a,w), [S_A, S_W])), qa, qw)

# V2: int8 inputs (no unpack) + full scales
def expand_mat(ng, width):
    rows = jax.lax.broadcasted_iota(jnp.int32, (ng, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ng, width), 1)
    return (cols // (width//ng) == rows)
def k_v2(a_ref, as_ref, w_ref, ws_ref, out_ref, acc_ref):
    e = expand_mat(BK//64, BK).astype(jnp.bfloat16)
    a_s = jax.lax.dot_general(as_ref[...], e, (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    a = a_ref[...].astype(jnp.bfloat16) * a_s.astype(jnp.bfloat16)
    wsv = ws_ref[...]
    w_s = jnp.broadcast_to(wsv[:, None, :], (BK//64, 64, BN)).reshape(BK, BN)
    w = w_ref[...].astype(jnp.bfloat16) * w_s
    mm_tail(acc_ref, out_ref, a, w)
timed("V2 int8+scales  ", jax.jit(lambda a,s,w,t: grid_call(k_v2, (a,s,w,t), [S_A8, S_AS, S_W8, S_WS])), qa8, asc, qw8, ws)

# V3: current full kernel (unpack + scales)
from nunchaku_tpu.ops.gemm import svdq_gemm_w4a4
timed("V3 current full ", jax.jit(lambda a,s,w,t: svdq_gemm_w4a4(a,s,w,t,bm=BM,bn=BN,bk=BK)), qa, asc, qw, ws)

# V4: int8 weights, packed act (asymmetric: big side no unpack)
def k_v4(a_ref, as_ref, w_ref, ws_ref, out_ref, acc_ref):
    e = expand_mat(BK//64, BK).astype(jnp.bfloat16)
    a_s = jax.lax.dot_general(as_ref[...], e, (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    a = unpack_l(a_ref[...]).astype(jnp.bfloat16) * a_s.astype(jnp.bfloat16)
    wsv = ws_ref[...]
    w_s = jnp.broadcast_to(wsv[:, None, :], (BK//64, 64, BN)).reshape(BK, BN)
    w = w_ref[...].astype(jnp.bfloat16) * w_s
    mm_tail(acc_ref, out_ref, a, w)
timed("V4 packed-a/i8-w", jax.jit(lambda a,s,w,t: grid_call(k_v4, (a,s,w,t), [S_A, S_AS, S_W8, S_WS])), qa, asc, qw8, ws)

# V5: int8 MXU dot test: does int8xint8->int32 hit 2x?
def k_i8dot(a_ref, w_ref, out_ref, acc_ref):
    k = pl.program_id(2); nk = pl.num_programs(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[...] += jax.lax.dot_general(a_ref[...], w_ref[...], (((1,),(0,)),((),())), preferred_element_type=jnp.int32).astype(jnp.float32)
    @pl.when(k == nk - 1)
    def _(): out_ref[...] = acc_ref[...].astype(jnp.bfloat16)
timed("V5 int8 dot     ", jax.jit(lambda a,w: grid_call(k_i8dot, (a,w), [S_A8, S_W8])), qa8, qw8)

# V6: plane-split dequant — no interleave relayout. Treat lo/hi nibble
# planes as two separate K-contractions with matching act/weight order.
def k_v6(a_ref, as_ref, w_ref, ws_ref, out_ref, acc_ref):
    k = pl.program_id(2); nk = pl.num_programs(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    ap = a_ref[...].astype(jnp.int32)      # (BM, BK/2)
    wp = w_ref[...].astype(jnp.int32)      # (BK/2, BN)
    a_lo = ((ap << 28) >> 28).astype(jnp.bfloat16)
    a_hi = ((ap << 24) >> 28).astype(jnp.bfloat16)
    w_lo = ((wp << 28) >> 28).astype(jnp.bfloat16)
    w_hi = ((wp << 24) >> 28).astype(jnp.bfloat16)
    # scales: lo plane covers logical k = b*256+[0,128), hi k = b*256+[128,256)
    # groups of 64: lo plane lanes j within block b -> group 4b + j//64
    ng2 = BK // 128  # packed lanes per... blocks: BK/256 blocks, 128 lanes each
    # expansion matrices for planes (constant)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BK//64, BK//2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BK//64, BK//2), 1)
    blk = cols // 128
    off = cols % 128
    g_lo = blk * 4 + off // 64
    g_hi = blk * 4 + 2 + off // 64
    e_lo = (g_lo == rows).astype(jnp.float32)
    e_hi = (g_hi == rows).astype(jnp.float32)
    asv = as_ref[...]
    s_lo = jax.lax.dot_general(asv, e_lo, (((0,),(0,)),((),())), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    s_hi = jax.lax.dot_general(asv, e_hi, (((0,),(0,)),((),())), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    wsv = ws_ref[...].astype(jnp.float32)  # (BK/64, BN)
    # weight plane scales via expansion matmul (rows of plane -> group rows)
    rr = jax.lax.broadcasted_iota(jnp.int32, (BK//2, BK//64), 0)
    gg = jax.lax.broadcasted_iota(jnp.int32, (BK//2, BK//64), 1)
    gl = (rr // 128) * 4 + (rr % 128) // 64
    el_w = (gg == gl).astype(jnp.float32)
    eh_w = (gg == gl + 2).astype(jnp.float32)
    wlo_s = jnp.dot(el_w, wsv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    whi_s = jnp.dot(eh_w, wsv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(a_lo * s_lo, w_lo * wlo_s, preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(a_hi * s_hi, w_hi * whi_s, preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): out_ref[...] = acc_ref[...].astype(jnp.bfloat16)
timed("V6 plane-split  ", jax.jit(lambda a,s,w,t: grid_call(k_v6, (a,s,w,t), [S_A, S_AS, S_W, S_WS])), qa, asc, qw, ws)

# V7: pure int8 dot + rank-1 scales (turbo w8a8 model)
def k_v7(a_ref, as_ref, w_ref, ws_ref, out_ref, acc_ref):
    k = pl.program_id(2); nk = pl.num_programs(2)
    @pl.when(k == 0)
    def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
    d = jax.lax.dot_general(a_ref[...], w_ref[...], (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
    acc_ref[...] += d.astype(jnp.float32)
    @pl.when(k == nk - 1)
    def _():
        sa = as_ref[...]  # (1, BM) f32 per-token
        sw = ws_ref[...]  # (1, BN) f32 per-channel
        out_ref[...] = (acc_ref[...] * sa.reshape(BM, 1) * sw).astype(jnp.bfloat16)
S_AT = pl.BlockSpec((1, BM), lambda i,j,k:(0,i), memory_space=pltpu.VMEM)
S_WT = pl.BlockSpec((1, BN), lambda i,j,k:(0,j), memory_space=pltpu.VMEM)
at = jnp.asarray(rng.random((1, M)), jnp.float32)
wt = jnp.asarray(rng.random((1, N)), jnp.float32)
timed("V7 w8a8 turbo   ", jax.jit(lambda a,s,w,t: grid_call(k_v7, (a,s,w,t), [S_A8, S_AT, S_W8, S_WT])), qa8, at, qw8, wt)

# tune V7 blocks
import itertools
def v7_with(bm, bn, bk):
    def k(a_ref, as_ref, w_ref, ws_ref, out_ref, acc_ref):
        kk = pl.program_id(2); nk = pl.num_programs(2)
        @pl.when(kk == 0)
        def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
        d = jax.lax.dot_general(a_ref[...], w_ref[...], (((1,),(0,)),((),())), preferred_element_type=jnp.int32)
        acc_ref[...] += d.astype(jnp.float32)
        @pl.when(kk == nk - 1)
        def _():
            out_ref[...] = (acc_ref[...] * as_ref[...].reshape(bm, 1) * ws_ref[...]).astype(jnp.bfloat16)
    return pl.pallas_call(
        k, grid=(M//bm, N//bn, K//bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i,j,kk:(i,kk), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bm), lambda i,j,kk:(0,i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((bk, bn), lambda i,j,kk:(kk,j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i,j,kk:(0,j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i,j,kk:(i,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )

for bm, bn, bk in [(512,1024,512),(512,1024,1024),(512,2048,512),(256,2048,1024),
                   (512,1024,3072),(1024,1024,512),(512,512,1024),(256,1024,1536),(512,2048,1024)]:
    try:
        f = jax.jit(lambda a,s,w,t,bm=bm,bn=bn,bk=bk: v7_with(bm,bn,bk)(a,s,w,t))
        timed(f"V7 {bm}x{bn}x{bk}", f, qa8, at, qw8, wt)
    except Exception as e:
        print(f"V7 {bm}x{bn}x{bk} FAIL", str(e).splitlines()[0][:80])
