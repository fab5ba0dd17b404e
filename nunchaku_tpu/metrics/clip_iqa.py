"""CLIP-IQA and CLIPScore from a LOCAL CLIP checkout.

Counterpart of the reference's app/flux.1/t2i/metrics/multimodal.py, which
uses torchmetrics' CLIPImageQualityAssessment / CLIPScore with
``openai/clip-vit-large-patch14`` (downloaded). Here the CLIP tower loads
from a local directory via transformers:

  NUNCHAKU_TPU_CLIP_DIR=/path/to/clip-vit-large-patch14
    (a standard huggingface checkout: config.json + weights + tokenizer)

Same math as torchmetrics:
  * CLIP-IQA: per prompt-pair (default "Good photo."/"Bad photo."),
    score = softmax over the two logit-scaled image<->anchor cosine
    similarities, taking the positive-anchor probability.
  * CLIPScore: max(100 * cos(image_embed, text_embed), 0), averaged.
"""

from __future__ import annotations

import os

import numpy as np

_PROMPT_PAIRS = {"quality": ("Good photo.", "Bad photo.")}


def load_clip():
    """(model, processor) from NUNCHAKU_TPU_CLIP_DIR, or None."""
    path = os.environ.get("NUNCHAKU_TPU_CLIP_DIR")
    if not path or not os.path.isdir(path):
        return None
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(path)
    model.eval()
    return model, CLIPProcessor.from_pretrained(path)


def _embed_images(model, processor, images: np.ndarray, batch: int = 8):
    import torch

    embs = []
    with torch.no_grad():
        for i in range(0, len(images), batch):
            px = processor(
                images=[(np.clip(im, 0, 1) * 255).astype(np.uint8)
                        for im in images[i : i + batch]],
                return_tensors="pt",
            )
            e = model.get_image_features(**px)
            embs.append((e / e.norm(dim=-1, keepdim=True)).cpu().numpy())
    return np.concatenate(embs, axis=0)


def _embed_texts(model, processor, texts: list[str]):
    import torch

    with torch.no_grad():
        tk = processor(text=texts, return_tensors="pt", padding=True,
                       truncation=True)
        e = model.get_text_features(**tk)
        return (e / e.norm(dim=-1, keepdim=True)).cpu().numpy()


def compute_clip_iqa(images: np.ndarray,
                     prompts: dict[str, tuple[str, str]] | None = None
                     ) -> dict[str, float] | None:
    """images (N, H, W, 3) f32 [0,1] -> {pair_name: mean positive prob},
    None if the CLIP weights are not mounted."""
    loaded = load_clip()
    if loaded is None:
        return None
    model, processor = loaded
    prompts = prompts or _PROMPT_PAIRS
    img = _embed_images(model, processor, images)
    scale = float(model.logit_scale.detach().exp())
    out = {}
    for name, (pos, neg) in prompts.items():
        txt = _embed_texts(model, processor, [pos, neg])
        logits = img @ txt.T * scale  # (N, 2)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        out[name] = float((e[:, 0] / e.sum(axis=1)).mean())
    return out


def compute_clip_score(images: np.ndarray, texts: list[str]) -> float | None:
    """Mean max(100*cos(img, text), 0) over aligned (image, prompt) pairs."""
    loaded = load_clip()
    if loaded is None:
        return None
    model, processor = loaded
    img = _embed_images(model, processor, images)
    txt = _embed_texts(model, processor, list(texts))
    sims = (img * txt).sum(axis=1)
    return float(np.maximum(100.0 * sims, 0.0).mean())
