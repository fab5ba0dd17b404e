"""Scorer-loader tiers of the paper-metric harness (FID / CLIP-IQA /
CLIPScore / ImageReward) activate from LOCAL weights — exercised here with
tiny synthetic checkpoints so a weights-mounted environment is proven to
produce the full table (reference app/flux.1/t2i/get_metrics.py:26-60)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_frechet_distance_math():
    from nunchaku_tpu.metrics.fid import frechet_distance, gaussian_stats

    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    mu1, s1 = gaussian_stats(a)
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-6

    # closed form for isotropic gaussians: ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2
    mu2 = mu1 + 2.0
    d = frechet_distance(mu1, s1, mu2, s1)
    assert abs(d - 4.0 * 8) < 1e-6


def test_fid_from_scripted_inception(tmp_path, monkeypatch):
    from nunchaku_tpu.metrics.fid import compute_fid

    class TinyFeat(torch.nn.Module):
        def forward(self, x):
            # (N, 3, 299, 299) -> (N, 12) pooled patch means
            p = torch.nn.functional.adaptive_avg_pool2d(x, (2, 2))
            return p.reshape(x.shape[0], -1)

    path = tmp_path / "inception.pt"
    torch.jit.script(TinyFeat()).save(str(path))
    monkeypatch.setenv("NUNCHAKU_TPU_INCEPTION", str(path))

    rng = np.random.default_rng(1)
    a = rng.random((6, 32, 32, 3), np.float32)
    b = rng.random((6, 32, 32, 3), np.float32)
    same = compute_fid(a, a)
    diff = compute_fid(a, b)
    assert same is not None and abs(same) < 1e-4
    assert diff is not None and diff > same

    monkeypatch.delenv("NUNCHAKU_TPU_INCEPTION")
    assert compute_fid(a, b) is None  # unmounted -> skip tier


def _tiny_clip_checkout(tmp_path):
    import json

    from transformers import (
        CLIPConfig,
        CLIPImageProcessor,
        CLIPModel,
        CLIPTokenizer,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=16, vocab_size=49408,
                       projection_dim=16),
        CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=32, patch_size=16, projection_dim=16),
        projection_dim=16,
    )
    model = CLIPModel(cfg)
    d = tmp_path / "clip"
    model.save_pretrained(d)
    CLIPImageProcessor(size={"shortest_edge": 32},
                       crop_size={"height": 32, "width": 32}).save_pretrained(d)
    # minimal byte-level-ish vocab covering the anchor prompts
    words = ["good", "bad", "photo", ".", "a"]
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for w in words:
        vocab[w + "</w>"] = len(vocab)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt")).save_pretrained(d)
    return d


def test_clip_iqa_and_score_from_local_checkout(tmp_path, monkeypatch):
    from nunchaku_tpu.metrics.clip_iqa import compute_clip_iqa, compute_clip_score

    d = _tiny_clip_checkout(tmp_path)
    monkeypatch.setenv("NUNCHAKU_TPU_CLIP_DIR", str(d))

    rng = np.random.default_rng(2)
    imgs = rng.random((3, 32, 32, 3), np.float32)
    iqa = compute_clip_iqa(imgs)
    assert iqa is not None and 0.0 <= iqa["quality"] <= 1.0

    cs = compute_clip_score(imgs, ["a good photo", "a bad photo", "a photo"])
    assert cs is not None and 0.0 <= cs <= 100.0

    monkeypatch.delenv("NUNCHAKU_TPU_CLIP_DIR")
    assert compute_clip_iqa(imgs) is None


def test_image_reward_torchscript_fallback(tmp_path, monkeypatch):
    from nunchaku_tpu.metrics.image_reward import compute_image_reward

    class TinyScorer(torch.nn.Module):
        def forward(self, x, prompts: list[str]):
            return x.mean(dim=(1, 2, 3)) * float(len(prompts))

    path = tmp_path / "reward.pt"
    torch.jit.script(TinyScorer()).save(str(path))
    monkeypatch.setenv("NUNCHAKU_TPU_IMAGE_REWARD", str(path))
    monkeypatch.delenv("NUNCHAKU_TPU_IMAGE_REWARD_REPO", raising=False)

    rng = np.random.default_rng(3)
    imgs = rng.random((2, 16, 16, 3), np.float32)
    r = compute_image_reward(imgs, ["p1", "p2"])
    assert r is not None and np.isfinite(r)

    monkeypatch.delenv("NUNCHAKU_TPU_IMAGE_REWARD")
    assert compute_image_reward(imgs, ["p1", "p2"]) is None
