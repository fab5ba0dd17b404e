"""Per-shape impl tuner: XLA int8 dot vs Pallas tiles, at FLUX step shapes.

The probe discovery (2026-08-16): XLA's int8 dot_general reaches the 2x
int8 MXU rate (up to 274 TF/s on v5e — ABOVE the 197 bf16 peak) for large
shapes, while the hand-tiled Pallas kernel caps at ~97; but XLA collapses
at (4608,3072,3072) (69) and M=512 txt-stream shapes (23). This sweep
measures each in-model GEMM shape with both impls (several tile options)
and prints a dispatch table for ops/gemm.py.

All timing is dispatch-amortized: CH calls chained inside one jit.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4
rng = np.random.default_rng(0)

# (M, K, N): every int8 GEMM in a FLUX 1024px step (S_img 4096, S_txt 512)
SHAPES = [
    (4608, 3072, 9216),    # dual img qkv
    (4608, 3072, 3072),    # dual img to_out
    (4608, 3072, 12288),   # dual img fc1
    (4608, 12288, 3072),   # dual img fc2
    (512, 3072, 9216),     # dual txt qkv
    (512, 3072, 3072),     # dual txt to_out
    (512, 3072, 12288),    # dual txt fc1
    (512, 12288, 3072),    # dual txt fc2
    (5120, 3072, 9216),    # single qkv
    (5120, 3072, 3072),    # single attn_out
    (5120, 3072, 12288),   # single fc1
    (5120, 12288, 3072),   # single fc2
    (5120, 3072, 21504),   # single qkv+fc1 fused (one input)
]


def t(f, n=5):
    r = f()
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _ = float(jnp.sum(r))
    return (time.perf_counter() - t0) / n


def chained(fn, srcs):
    def body(c, a):
        o = fn(a)
        return c + o[:1, :1].astype(jnp.float32), None
    c, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32), srcs)
    return c


def kern(a_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = jax.lax.dot_general(
        a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += d

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def pallas_mm(a, w, bm, bn, bk):
    m, k = a.shape
    n = w.shape[1]
    return pl.pallas_call(
        kern,
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=a.nbytes + w.nbytes + m * n * 2,
            transcendentals=0,
        ),
    )(a, w)


def fits_vmem(bm, bn, bk):
    # double-buffered in/out + i32 acc, 16 MB scoped budget, rough model
    return (2 * (bm * bk + bk * bn) + 2 * 2 * bm * bn + 4 * bm * bn) < 14.5e6


for (M, K, N) in SHAPES:
    a8s = jnp.asarray(rng.integers(-127, 127, (CH, M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    FL = 2 * M * K * N * CH
    rows = []

    def xla(a, w8=w8):
        return jax.lax.dot_general(
            a, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    try:
        rows.append(("xla", FL / t(jax.jit(lambda: chained(xla, a8s))) / 1e12))
    except Exception as e:
        rows.append(("xla FAIL " + str(e).splitlines()[0][:40], 0))

    cands = [(512, 512, 3072), (256, 1024, 3072), (512, 1024, 1536),
             (768, 1536, 768)]
    if M <= 512:
        cands = [(M, 512, 3072), (M, 1024, 3072), (M, 1536, 1536),
                 (M, 3072, 768), (M, 2304, 1024)]
    for (bm, bn, bk) in cands:
        bm = min(bm, M)
        if M % bm or N % bn or K % bk or not fits_vmem(bm, bn, bk):
            continue
        try:
            dt = t(jax.jit(lambda w8=w8, a8s=a8s, bm=bm, bn=bn, bk=bk: chained(
                lambda x: pallas_mm(x, w8, bm, bn, bk), a8s)))
            rows.append((f"pl {bm}/{bn}/{bk}", FL / dt / 1e12))
        except Exception as e:
            rows.append((f"pl {bm}/{bn}/{bk} FAIL", 0))
    best = max(rows, key=lambda r: r[1])
    print(f"({M},{K},{N}): best={best[0]} {best[1]:.0f} TF/s | " +
          ", ".join(f"{n}={v:.0f}" for n, v in rows), flush=True)
