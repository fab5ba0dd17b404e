"""LPIPS (Learned Perceptual Image Patch Similarity), dependency-free.

The reference's golden-image test contract asserts ``LPIPS(ref, gen) <
expected * 1.10`` per model/precision (/root/reference/tests/utils.py:85-105
via torchmetrics; thresholds tests/v1/flux/test_flux1_dev.py:66-70). This
sandbox has no torchmetrics/lpips/torchvision and no network egress, so the
metric is implemented here directly on torch (CPU):

  * the standard AlexNet feature trunk (5 conv stages, taps after each ReLU),
  * per-tap channel-unit-normalization, squared diff, 1x1 non-negative
    linear head, spatial mean, summed over taps — the LPIPS formula of
    Zhang et al. 2018 (same computation torchmetrics performs).

Weights: if ``NUNCHAKU_TPU_LPIPS_WEIGHTS`` points at a ``.pt``/``.pth``
state dict (torchmetrics' ``LPIPS(net_type="alex")`` layout or this module's
own ``state_dict()``), scores match the published metric. Without weights
the trunk is **deterministically randomly initialized** (seed 0) — random
AlexNet features still induce a valid perceptual-ish distance (widely
reported to correlate with the trained metric, though not numerically
comparable), which keeps the *harness* runnable end-to-end in CI: thresholds
for the random-feature fallback are calibrated by the tests themselves, and
real golden thresholds activate only with real weights + real checkpoints.
"""

from __future__ import annotations

import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# AlexNet feature config: (out_channels, kernel, stride, padding), pool-before
_ALEX_CFG = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
_TAP_CHANNELS = [64, 192, 384, 256, 256]

# ImageNet scaling used by LPIPS (applied to [-1, 1] inputs)
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


class _AlexFeatures(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        in_c = 3
        for out_c, k, s, p, pool in _ALEX_CFG:
            if pool:
                layers.append(nn.MaxPool2d(kernel_size=3, stride=2))
            layers.append(nn.Conv2d(in_c, out_c, k, stride=s, padding=p))
            layers.append(nn.ReLU(inplace=True))
            in_c = out_c
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        taps = []
        for layer in self.features:
            x = layer(x)
            if isinstance(layer, nn.ReLU):
                taps.append(x)
        return taps


def _unit_normalize(t: torch.Tensor, eps: float = 1e-10) -> torch.Tensor:
    return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + eps)


class LPIPS(nn.Module):
    """LPIPS distance. ``normalize=True`` expects inputs in [0, 1]."""

    def __init__(self, weights_path: str | None = None, normalize: bool = True):
        super().__init__()
        self.normalize = normalize
        self.net = _AlexFeatures()
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in _TAP_CHANNELS]
        )
        self.trained = False
        if weights_path is None:
            weights_path = os.environ.get("NUNCHAKU_TPU_LPIPS_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self._load(weights_path)
            self.trained = True
        else:
            # deterministic random features (see module docstring)
            g = torch.Generator().manual_seed(0)
            for m in self.net.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, generator=g)
                    if m.bias is not None:
                        nn.init.zeros_(m.bias)
            for lin in self.lins:
                nn.init.uniform_(lin.weight, 0.5, 1.5, generator=g)
        self.eval()
        for p_ in self.parameters():
            p_.requires_grad_(False)

    def _load(self, path: str) -> None:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if any(k.startswith(("net.", "lins.")) for k in sd):
            # torchmetrics/official-lpips style: net.slice keys or our own
            own = {}
            convs = [m for m in self.net.features if isinstance(m, nn.Conv2d)]
            conv_keys = sorted(
                (k for k in sd if ".weight" in k and k.startswith("net.")),
            )
            src_w = [sd[k] for k in conv_keys if sd[k].dim() == 4]
            src_b = [sd[k.replace("weight", "bias")] for k in conv_keys if sd[k].dim() == 4]
            for conv, w, b in zip(convs, src_w, src_b):
                own_w, own_b = conv.weight, conv.bias
                own_w.copy_(w)
                own_b.copy_(b)
            lin_keys = sorted(k for k in sd if k.startswith("lins.") and "weight" in k)
            for lin, k in zip(self.lins, lin_keys):
                lin.weight.copy_(sd[k].view_as(lin.weight))
        else:
            self.load_state_dict(sd)

    @torch.no_grad()
    def forward(self, img0: torch.Tensor, img1: torch.Tensor) -> torch.Tensor:
        """(B, 3, H, W) pairs -> (B,) distances."""
        if self.normalize:  # [0,1] -> [-1,1]
            img0 = 2 * img0 - 1
            img1 = 2 * img1 - 1
        img0 = (img0 - _SHIFT) / _SCALE
        img1 = (img1 - _SHIFT) / _SCALE
        taps0 = self.net(img0)
        taps1 = self.net(img1)
        total = 0.0
        for t0, t1, lin in zip(taps0, taps1, self.lins):
            d = (_unit_normalize(t0) - _unit_normalize(t1)) ** 2
            w = lin.weight.clamp(min=0)  # heads are non-negative by contract
            total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
        return total


def compute_lpips(
    ref_images: np.ndarray,
    gen_images: np.ndarray,
    weights_path: str | None = None,
    batch_size: int = 4,
) -> float:
    """Mean LPIPS over image pairs. Arrays (B, H, W, 3) float in [0, 1]
    (the reference aggregates with torchmetrics' mean-update over a
    directory pair, tests/utils.py:85-105 — same reduction)."""
    metric = LPIPS(weights_path=weights_path)
    ref = torch.from_numpy(np.asarray(ref_images, np.float32)).permute(0, 3, 1, 2)
    gen = torch.from_numpy(np.asarray(gen_images, np.float32)).permute(0, 3, 1, 2)
    vals = []
    for i in range(0, ref.shape[0], batch_size):
        vals.append(metric(ref[i : i + batch_size], gen[i : i + batch_size]))
    return float(torch.cat(vals).mean())
