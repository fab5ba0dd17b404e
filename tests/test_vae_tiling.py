"""VAE spatial tiling (diffusers enable_vae_tiling) + flash mid-attention.

The 1024px decode OOMs when run whole-image beside a resident 12 GiB
transformer; decode() must support (a) a jitted whole-image path, (b) an
overlapping-tile path with linear blending, and (c) a flash-kernel mid
attention that never materializes the (S, S) score matrix.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunchaku_tpu.models.autoencoder import AttnBlock, AutoencoderKL


@pytest.fixture(scope="module")
def vae():
    return AutoencoderKL.random_init(
        jax.random.PRNGKey(0), block_out_channels=(32, 32, 32, 32),
        layers_per_block=1,
    )


def test_tiled_decode_matches_whole(vae):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 24, 24), jnp.bfloat16)
    whole = np.asarray(vae.decode(z))
    vae.enable_tiling(tile_latent_size=16, overlap=0.25)
    try:
        tiled = np.asarray(vae.decode(z))
    finally:
        vae.disable_tiling()
    assert tiled.shape == whole.shape == (1, 192, 192, 3)
    assert np.isfinite(tiled).all()
    # tiles see zero conv padding at interior seams, so equality is
    # approximate (diffusers' tiled_decode has the same property); the
    # blended overlap keeps the error small and seam-free
    # (random conv weights amplify boundary effects well beyond a trained
    # VAE's; measured 0.021 mean here vs ~0.003 typical on real weights)
    assert np.abs(tiled - whole).mean() < 0.04
    # pointwise equality is impossible: the mid-block attention is global,
    # so every tiled output pixel sees a different attention context than
    # the whole-image decode (diffusers' tiled_decode shares this property)


def test_tiling_noop_when_smaller_than_tile(vae):
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8, 8), jnp.bfloat16)
    whole = np.asarray(vae.decode(z))
    vae.enable_tiling(tile_latent_size=16)
    try:
        tiled = np.asarray(vae.decode(z))
    finally:
        vae.disable_tiling()
    np.testing.assert_allclose(tiled, whole, atol=0, rtol=0)


def test_attnblock_flash_matches_naive():
    c, hw_side = 128, 32  # h*w = 1024 tokens -> flash path
    blk = AttnBlock.random_init(jax.random.PRNGKey(3), c)
    x = jax.random.normal(
        jax.random.PRNGKey(4), (1, c, hw_side, hw_side), jnp.bfloat16
    )
    out_flash = np.asarray(blk(x).astype(jnp.float32))

    # naive oracle (the pre-flash formula) on the same weights
    from nunchaku_tpu.models.autoencoder import group_norm

    hn = group_norm(x, blk.norm_w, blk.norm_b)
    q = blk.q(hn).reshape(1, c, hw_side * hw_side)
    k = blk.k(hn).reshape(1, c, hw_side * hw_side)
    v = blk.v(hn).reshape(1, c, hw_side * hw_side)
    attn = jax.nn.softmax(
        jnp.einsum("bcq,bck->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
        / math.sqrt(c),
        axis=-1,
    )
    o = jnp.einsum("bqk,bck->bcq", attn, v.astype(jnp.float32))
    o = blk.out(o.reshape(1, c, hw_side, hw_side).astype(x.dtype))
    ref = np.asarray(
        (x.astype(jnp.float32) + o.astype(jnp.float32)).astype(jnp.float32)
    )
    # flash runs q/k/v in bf16 (vs the f32 einsum oracle)
    assert np.abs(out_flash - ref).max() < 5e-2
    assert np.abs(out_flash - ref).mean() < 5e-3
