"""DC-AE tests: synthesized diffusers-layout checkpoint loads, encode is
32x spatial / latent-channel correct, decode round-trips shapes, and the
blocks are numerically sane (tiny config for CPU speed)."""

import numpy as np
import jax.numpy as jnp

from nunchaku_tpu.models.dc_ae import (
    DCAE,
    DCAEConfig,
    load_dc_ae,
    synthesize_dcae_state_dict,
)

TINY = DCAEConfig(
    latent_channels=4,
    attention_head_dim=8,
    block_out_channels=(8, 16, 32),
    encoder_block_types=("res", "res", "vit"),
    decoder_block_types=("res", "res", "vit"),
    encoder_layers_per_block=(1, 1, 1),
    decoder_layers_per_block=(1, 1, 1),
    qkv_multiscales=((), (), (5,)),
)


def test_encode_decode_shapes():
    sd = synthesize_dcae_state_dict(TINY, seed=3)
    ae = load_dc_ae(sd, TINY)
    # 3 stages -> 2 downsamples -> 4x spatial in the tiny config
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 16, 16)), jnp.bfloat16)
    z = ae.encode(img)
    assert z.shape == (1, 4, 4, 4)
    assert bool(jnp.isfinite(z.astype(jnp.float32)).all())
    out = ae.decode(z)
    assert out.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_full_config_factor():
    cfg = DCAEConfig()
    # 6 stages -> 5 downsamples -> 32x (the f32c32 contract)
    assert 2 ** (len(cfg.block_out_channels) - 1) == 32
    assert cfg.latent_channels == 32


def test_decode_depends_on_latents():
    sd = synthesize_dcae_state_dict(TINY, seed=4)
    ae = load_dc_ae(sd, TINY)
    rng = np.random.default_rng(1)
    z1 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.bfloat16)
    z2 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.bfloat16)
    o1 = np.asarray(ae.decode(z1))
    o2 = np.asarray(ae.decode(z2))
    assert not np.allclose(o1, o2, atol=1e-3)
