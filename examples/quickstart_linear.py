"""Quickstart: the SVDQuant W4A4 numerics end-to-end through the public API.

Quantizes a random weight (low-rank branch + 4-bit residual), quantizes
activations on the fly, runs the W4A4 GEMM, and compares against the bf16
matmul. Mirrors what nunchaku's SVDQW4A4Linear does per layer
(reference: nunchaku/models/linear.py:161-268).
"""

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu.core import pack_int4, unpack_int4
from nunchaku_tpu.ops import reference as R


def main(precision: str = "int4"):
    rng = np.random.default_rng(0)
    M, K, N, rank = 64, 512, 256, 32
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    # Real weights have decaying spectra — that is what the rank-32 SVD
    # branch exploits. Synthesize one with a power-law spectrum.
    a = rng.normal(size=(K, N)) * 0.05
    u0, s0, vt0 = np.linalg.svd(a, full_matrices=False)
    s0 = s0 * (np.arange(1, len(s0) + 1) ** -1.0)
    w = jnp.asarray(u0 @ np.diag(s0) @ vt0, jnp.bfloat16)

    # SVD rank-32 branch of the weight; the 4-bit part quantizes the residual.
    u, s, vt = np.linalg.svd(np.asarray(w, np.float32), full_matrices=False)
    pd = jnp.asarray(u[:, :rank] * s[:rank], jnp.bfloat16)  # (K, r)
    pu = jnp.asarray(vt[:rank], jnp.bfloat16)  # (r, N)
    resid = w.astype(jnp.float32) - pd.astype(jnp.float32) @ pu.astype(jnp.float32)
    qw, wscales, alpha = R.quantize_weight(resid, precision=precision)

    # Pack to the TPU block-split-half layout and back (storage roundtrip).
    assert (unpack_int4(pack_int4(qw, axis=0), axis=0) == qw).all()

    qa, ascales, lora_act = R.quantize_act_fuse_lora(x, None, pd, precision=precision)
    out = R.w4a4_gemm(
        qa, ascales, qw, wscales, lora_act=lora_act, proj_up=pu,
        precision=precision, alpha=alpha,
    )
    ref = x.astype(jnp.float32) @ w.astype(jnp.float32)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print(f"[{precision}] SVDQuant W4A4 relative error vs bf16 matmul: {err:.4f}")
    assert err < 0.05, err  # SVD branch absorbs the top spectrum -> small error
    return err


if __name__ == "__main__":
    main("int4")
    main("nvfp4")
    print("OK")
