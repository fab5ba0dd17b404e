"""Debug tap system tests (reference Module.h:187-199 startDebug pattern)."""

import numpy as np
import jax
import jax.numpy as jnp

from nunchaku_tpu.utils.debug_taps import capture_taps, summarize, tap


def test_tap_identity_when_disabled():
    x = jnp.ones((2, 3))
    assert tap("x", x) is x


def test_capture_inside_jit_and_scan():
    def f(x):
        def body(c, _):
            c = tap("step", c * 2.0)
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=3)
        return tap("final", c)

    with capture_taps() as taps:
        out = jax.jit(f)(jnp.ones((2,)))
        jax.effects_barrier()
    assert float(out[0]) == 8.0
    assert len(taps["step"]) == 3  # one entry per scan iteration
    assert np.allclose(taps["step"][0], 2.0)
    assert np.allclose(taps["step"][2], 8.0)
    assert len(taps["final"]) == 1
    s = summarize(taps)
    assert s["final"][0][0] == (2,)


def test_flux_block_taps():
    from nunchaku_tpu.models.transformers.transformer_flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    cfg = FluxConfig(num_layers=2, num_single_layers=1, num_attention_heads=2,
                     joint_attention_dim=512, pooled_projection_dim=256)
    model = FluxTransformer2DModel.random_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 64, 64)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(1, 32, 512)), jnp.bfloat16)
    pool = jnp.asarray(rng.normal(size=(1, 256)), jnp.bfloat16)
    t = jnp.array([0.5], jnp.float32)
    g = jnp.array([3.5], jnp.float32)
    iids = jnp.zeros((64, 3), jnp.int32)
    tids = jnp.zeros((32, 3), jnp.int32)

    with capture_taps() as taps:
        model(lat, txt, pool, t, iids, tids, g)
        jax.effects_barrier()
    assert len(taps["dual.attn_img"]) == 2   # one per dual layer
    assert len(taps["dual.img_out"]) == 2
    assert len(taps["single.out"]) == 1
    assert taps["dual.attn_img"][0].shape == (1, 64, 256)  # (B, S_img, dim)
