"""Probe: what limits int8 GEMM throughput on this chip?

Hypotheses tested at FLUX qkv shape (M=4608, K=3072, N=3072):
  A. bf16 pallas matmul rate (is int8 running at bf16 MXU rate?)
  B. current int8 kernel (f32 VMEM acc, bk=768)
  C. int8 with int32 accumulator (skip the int32->f32 VPU convert per step)
  D. int8 with k fully in VMEM (grid k=1, Mosaic-internal accumulation)
  E. XLA-native int8 dot_general (no Pallas at all)
  F. tile sweep on the winner
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

M, K, N = 4608, 3072, 3072
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
wbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
FL = 2 * M * K * N


def t(f, n=30):
    r = f(); _ = float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _ = float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def mk_kernel(acc_dtype, out_dtype):
    def kern(a_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        d = jax.lax.dot_general(
            a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32,
        )
        acc_ref[...] += d.astype(acc_dtype)

        @pl.when(k == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kern


def pallas_mm(a, w, bm, bn, bk, acc_dtype, out_dtype):
    m, k = a.shape
    n = w.shape[1]
    return pl.pallas_call(
        mk_kernel(acc_dtype, out_dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=a.nbytes + w.nbytes + m * n * 2,
            transcendentals=0,
        ),
    )(a, w)


print("A. bf16 pallas 512/1024/512:",
      f"{FL / t(jax.jit(lambda: pallas_mm(abf, wbf, 512, 1024, 512, jnp.float32, jnp.bfloat16))) / 1e12:.0f} TF/s")
print("B. int8 pallas f32 acc 768/1536/768:",
      f"{FL / t(jax.jit(lambda: pallas_mm(a8, w8, 768, 1536, 768, jnp.float32, jnp.bfloat16))) / 1e12:.0f} TF/s")
print("C. int8 pallas i32 acc 768/1536/768:",
      f"{FL / t(jax.jit(lambda: pallas_mm(a8, w8, 768, 1536, 768, jnp.int32, jnp.bfloat16))) / 1e12:.0f} TF/s")
try:
    print("D. int8 pallas full-K (bk=3072):",
          f"{FL / t(jax.jit(lambda: pallas_mm(a8, w8, 256, 1024, 3072, jnp.int32, jnp.bfloat16))) / 1e12:.0f} TF/s")
except Exception as e:
    print("D. FAIL", str(e).splitlines()[0][:80])
print("E. XLA int8 dot_general:",
      f"{FL / t(jax.jit(lambda: jax.lax.dot_general(a8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))) / 1e12:.0f} TF/s")
print("E2. XLA bf16 dot:",
      f"{FL / t(jax.jit(lambda: jnp.dot(abf, wbf))) / 1e12:.0f} TF/s")

for bm, bn, bk in ((512, 1536, 1024), (1536, 1536, 512), (512, 3072, 512),
                   (2304, 768, 768), (1152, 1536, 768), (4608, 768, 384),
                   (768, 1536, 1536), (512, 512, 3072)):
    try:
        dt = t(jax.jit(functools.partial(pallas_mm, a8, w8, bm, bn, bk, jnp.int32, jnp.bfloat16)))
        print(f"F. int8 {bm}/{bn}/{bk}: {FL / dt / 1e12:.0f} TF/s")
    except Exception as e:
        print(f"F. int8 {bm}/{bn}/{bk}: FAIL {str(e).splitlines()[0][:60]}")
