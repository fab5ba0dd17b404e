"""Flow-matching Euler scheduler (FLUX family).

JAX counterpart of diffusers' FlowMatchEulerDiscreteScheduler as used by
FluxPipeline: sigma == t in [0, 1], dynamic shifting by image sequence
length (the mu/shift rule), and the Euler update
``x <- x + (sigma_next - sigma) * v``. Pure functions over a static sigma
schedule so the whole denoise loop jits as one lax.fori_loop.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def compute_shift_mu(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """FLUX dynamic-shift mu (diffusers calculate_shift)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def flux_sigmas(
    num_steps: int,
    image_seq_len: int | None = None,
    *,
    shift: float = 1.0,
    use_dynamic_shifting: bool = True,
) -> np.ndarray:
    """Sigma schedule (num_steps + 1,), sigmas[-1] = 0."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if use_dynamic_shifting and image_seq_len is not None:
        mu = compute_shift_mu(image_seq_len)
        sigmas = math.e**mu / (math.e**mu + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def euler_step(latents: jnp.ndarray, velocity: jnp.ndarray, sigma, sigma_next):
    return latents + (sigma_next - sigma) * velocity.astype(latents.dtype)
