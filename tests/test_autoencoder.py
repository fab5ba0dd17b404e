"""VAE tests: shapes, finiteness, encode/decode consistency (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunchaku_tpu.models.autoencoder import AutoencoderKL

TINY = dict(block_out_channels=(32, 64), layers_per_block=1)


@pytest.fixture(scope="module")
def vae():
    return AutoencoderKL.random_init(jax.random.PRNGKey(0), **TINY)


def test_decode_shape(vae):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8, 8), jnp.bfloat16)
    img = jax.jit(lambda v, z: v.decode(z))(vae, z)
    assert img.shape == (1, 16, 16, 3)  # one upsample stage in tiny config
    assert bool(jnp.isfinite(img).all())
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_encode_shape(vae):
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    z = jax.jit(lambda v, x: v.encode(x))(vae, img)
    assert z.shape == (1, 16, 8, 8)
    assert bool(jnp.isfinite(z.astype(jnp.float32)).all())


def test_against_torch_diffusers_decoder():
    """Cross-check the decoder against diffusers' torch AutoencoderKL."""
    torch = pytest.importorskip("torch")
    diffusers = pytest.importorskip("diffusers")

    tv = diffusers.AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=16,
        block_out_channels=(32, 64), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2,
        norm_num_groups=32, sample_size=32,
    )
    tv.eval()
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    from nunchaku_tpu.models.autoencoder import load_autoencoder

    mine = load_autoencoder(sd, scaling_factor=1.0, shift_factor=0.0,
                            block_out_channels=(32, 64), layers_per_block=1)

    z = np.random.default_rng(0).standard_normal((1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tv.decode(torch.from_numpy(z)).sample.numpy()
    ref = np.clip(ref / 2 + 0.5, 0, 1).transpose(0, 2, 3, 1)
    out = np.asarray(mine.decode(jnp.asarray(z, jnp.bfloat16)))
    err = np.abs(out - ref).max()
    assert err < 0.05, err  # bf16 convs vs f32 torch
