"""Tokenizer adapters: local-files-only wrappers over HF tokenizers.

The engine is offline-first (the reference downloads from the hub;
fetch_or_download nunchaku/utils.py:72) — here tokenizers load strictly
from local checkpoint directories and emit padded jnp id arrays in the
shape the pipeline's text encoders expect.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class HFTokenizer:
    """Callable: (prompts, max_length) -> (B, max_length) int32 ids."""

    def __init__(self, path, pad_to_max: bool = True):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.pad_to_max = pad_to_max

    def __call__(self, prompts: list[str], max_length: int) -> jnp.ndarray:
        enc = self.tok(
            prompts,
            padding="max_length" if self.pad_to_max else True,
            max_length=max_length,
            truncation=True,
            return_tensors="np",
        )
        return jnp.asarray(enc["input_ids"].astype(np.int32))


def t5_tokenizer(path) -> HFTokenizer:
    return HFTokenizer(path)


def clip_tokenizer(path) -> HFTokenizer:
    return HFTokenizer(path)


def gemma_tokenizer(path) -> HFTokenizer:
    """Gemma-2 tokenizer for SANA (google/gemma-2-2b-it)."""
    return HFTokenizer(path)
