"""Golden-test machinery mirroring the reference's quality contract.

Reference pattern (/root/reference/tests/v1/flux/test_flux1_dev.py:20-135 +
tests/utils.py): fixed prompts, per-prompt seeds derived from
``hash_str_to_int``, generate with the 16-bit model (cached) and the
quantized engine, assert LPIPS < expected * 1.10.

Here the 16-bit reference is the dequantized twin (models/bf16_ref.py) and
real-checkpoint runs activate only when ``NUNCHAKU_TPU_CKPT_ROOT`` is
mounted (zero-egress sandbox). The harness itself — prompts, seeding,
generation, metric, threshold assert — runs unconditionally against tiny
random-weight models so the machinery stays green in CI.
"""

from __future__ import annotations

import os

import numpy as np

# Reference prompt set (tests/v1/utils.py uses short fixed prompts)
GOLDEN_PROMPTS = [
    "A cat holding a sign that says hello world",
    "a dog wearing sunglasses on a beach",
    "an astronaut riding a horse on the moon",
]

# LPIPS budgets from the reference CI tables (BASELINE.md; pass if
# measured < value * 1.10). Keyed (model, precision).
LPIPS_BUDGETS = {
    ("flux.1-dev", "int4"): 0.17,
    ("flux.1-dev", "nvfp4"): 0.19,
    ("flux.1-schnell", "int4"): 0.14,
    ("flux.1-schnell", "nvfp4"): 0.15,
    ("flux.1-kontext-dev", "int4"): 0.17,
    ("flux.1-krea-dev", "int4"): 0.20,
    ("flux.1-canny-dev", "int4"): 0.13,
    ("flux.1-depth-dev", "int4"): 0.13,
    ("flux.1-fill-dev", "int4"): 0.10,
    ("qwen-image-r32", "int4"): 0.24,
    ("qwen-image-r128", "int4"): 0.31,
    ("z-image-turbo-r32", "int4"): 0.40,
    ("z-image-turbo-r128", "int4"): 0.38,
}

CKPT_ROOT = os.environ.get("NUNCHAKU_TPU_CKPT_ROOT")


def hash_str_to_int(s: str) -> int:
    """Deterministic per-prompt seed (reference tests/utils.py:14-20)."""
    modulus = 10**9 + 7
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % modulus
    return h


def latents_to_images(latents: np.ndarray) -> np.ndarray:
    """Map packed latents (B, S, C) -> (B, H, W, 3) in [0, 1] for metric
    plumbing when no VAE is mounted: a fixed 3-channel projection. The real
    path decodes through the VAE; golden *thresholds* only apply there."""
    b, s, c = latents.shape
    side = int(np.sqrt(s))
    x = np.asarray(latents, np.float32)[:, : side * side].reshape(b, side, side, c)
    rng = np.random.default_rng(0)
    proj = rng.standard_normal((c, 3)).astype(np.float32) / np.sqrt(c)
    img = 1.0 / (1.0 + np.exp(-(x @ proj)))
    # AlexNet needs >= ~64 px; tiny smoke latents are 8x8 -> nearest-upsample
    while img.shape[1] < 64:
        img = img.repeat(2, axis=1).repeat(2, axis=2)
    return img


def require_checkpoints():
    import pytest

    if not CKPT_ROOT:
        pytest.skip(
            "NUNCHAKU_TPU_CKPT_ROOT not set: real-checkpoint golden tests "
            "activate when quantized checkpoints are mounted"
        )
