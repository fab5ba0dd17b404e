"""Probe the M=512 txt-stream GEMM pathology.

(512,3072,9216) int8 runs at ~20 TF/s (vs 150-250 at M>=4608) — ~110 ms of
the FLUX step is these shapes. Sweep: Pallas tiles, XLA int8, XLA bf16,
in-kernel int8->bf16 convert, M padded to 768/1024.
"""

import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

rng = np.random.default_rng(0)
M, K, N = 512, 3072, 9216
L = 4
FL = 2 * M * K * N * L

qa = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
wstack = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)


def kern_i8(a_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def kern_cvt(a_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def pallas_mm(a, w, bm, bn, bk, kern, acc_dtype):
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
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=a.nbytes + w.nbytes + m * n * 2,
            transcendentals=0,
        ),
    )(a, w)


def timeit(f, n=8):
    # block_until_ready does NOT synchronize through the axon tunnel;
    # only value materialization does
    r = f()
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        r = f()
    r = f()
    _ = float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def scan_over(fn):
    @jax.jit
    def g(qa, wstack):
        def body(c, w):
            o = fn(qa, w)
            # consume the FULL output (a [0,0] slice lets XLA narrow the
            # dot itself to one column)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32), wstack)
        return c
    return lambda: g(qa, wstack)


CASES = {
    "xla-i8": lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.bfloat16),
    "xla-bf16": lambda a, w: jnp.dot(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16),
    "pl-i8-512.1536.768": lambda a, w: pallas_mm(a, w, 512, 1536, 768, kern_i8, jnp.int32),
    "pl-i8-512.1536.1536": lambda a, w: pallas_mm(a, w, 512, 1536, 1536, kern_i8, jnp.int32),
    "pl-i8-512.1536.3072": lambda a, w: pallas_mm(a, w, 512, 1536, 3072, kern_i8, jnp.int32),
    "pl-i8-512.3072.768": lambda a, w: pallas_mm(a, w, 512, 3072, 768, kern_i8, jnp.int32),
    "pl-i8-512.4608.512": lambda a, w: pallas_mm(a, w, 512, 4608, 512, kern_i8, jnp.int32),
    "pl-i8-256.1536.768": lambda a, w: pallas_mm(a, w, 256, 1536, 768, kern_i8, jnp.int32),
    "pl-i8-512.2304.1024": lambda a, w: pallas_mm(a, w, 512, 2304, 1024, kern_i8, jnp.int32),
    "pl-cvt-512.1536.768": lambda a, w: pallas_mm(a, w, 512, 1536, 768, kern_cvt, jnp.float32),
    "pl-i8-f32acc-512.1536.768": lambda a, w: pallas_mm(a, w, 512, 1536, 768, kern_i8, jnp.int32),
}

names = sys.argv[1:] or list(CASES)
for name in names:
    fn = CASES[name]
    try:
        t = timeit(scan_over(fn))
        print(f"{name:28s} {FL / t / 1e12:7.1f} TF/s  ({t*1e3/L:.3f} ms/gemm)", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
