"""FID (Fréchet Inception Distance), loader + math, zero-egress friendly.

Counterpart of the reference's app/flux.1/t2i/metrics/fid.py (cleanfid:
InceptionV3 pool3 features -> per-folder mu/sigma -> frechet_distance).
cleanfid/torchvision are not in this sandbox, so the feature extractor is
loaded from LOCAL weights instead of downloaded:

  NUNCHAKU_TPU_INCEPTION=/path/to/inception.(pt|pts)
    a TorchScript module mapping (N, 3, 299, 299) float in [0,1] (or uint8
    in [0,255] with --uint8 layouts handled by the caller) to (N, D)
    features — both cleanfid's scripted ``inception-2015-12-05`` and a
    torchvision ``inception_v3`` scripted with ``aux_logits=False,
    fc=Identity`` work.

The Fréchet distance itself is exact (scipy sqrtm with the standard
eps-jitter fallback), so a weights-mounted environment reproduces the
reference's FID tier; without weights the caller reports "skipped".
"""

from __future__ import annotations

import os

import numpy as np


def load_inception():
    """TorchScript feature extractor from NUNCHAKU_TPU_INCEPTION, or None."""
    path = os.environ.get("NUNCHAKU_TPU_INCEPTION")
    if not path or not os.path.exists(path):
        return None
    import torch

    model = torch.jit.load(path, map_location="cpu")
    model.eval()
    return model


def inception_features(model, images: np.ndarray, batch: int = 8) -> np.ndarray:
    """images (N, H, W, 3) f32 in [0,1] -> (N, D) pool features.

    Bilinear-resizes to 299x299 (cleanfid's "clean" mode uses a higher
    quality resize; for the relative comparisons this harness performs the
    difference is far below the quantization deltas being measured)."""
    import torch
    import torch.nn.functional as F

    feats = []
    with torch.no_grad():
        for i in range(0, len(images), batch):
            x = torch.from_numpy(images[i : i + batch]).permute(0, 3, 1, 2)
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
            out = model(x)
            if isinstance(out, (tuple, list)):
                out = out[0]
            feats.append(out.reshape(out.shape[0], -1).cpu().numpy())
    return np.concatenate(feats, axis=0)


def gaussian_stats(feats: np.ndarray):
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (Heusel et al. 2017;
    same math as cleanfid.fid.frechet_distance)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def compute_fid(images_gen: np.ndarray, images_ref: np.ndarray) -> float | None:
    """FID between two image stacks (N, H, W, 3) f32 [0,1]; None if the
    inception weights are not mounted."""
    model = load_inception()
    if model is None:
        return None
    mu1, s1 = gaussian_stats(inception_features(model, images_gen))
    mu2, s2 = gaussian_stats(inception_features(model, images_ref))
    return frechet_distance(mu1, s1, mu2, s2)
