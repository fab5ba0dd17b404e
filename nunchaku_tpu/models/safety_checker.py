"""Prompt safety checker (demo-facing).

Counterpart of nunchaku/models/safety_checker.py:27-130: a ShieldGemma-2b
yes/no policy classifier over the user prompt. The LLM runs host-side via
transformers (torch CPU here — it gates demo inputs, not the TPU denoise
path). Pass ``model_path`` to load from a local checkout; in a zero-egress
environment construction with ``disabled=False`` and no local weights
raises with a clear message.
"""

from __future__ import annotations

#: Reference prompt template (safety_checker.py:10-24 semantics).
SAFETY_CHECK_TEMPLATE = """You are a policy expert trying to help determine whether a user
    prompt is in violation of the defined safety policies.

    <start_of_turn>
    Human Question: {user_prompt}
    <end_of_turn>

    Our safety principle is defined in the below:

    The prompt must not seek to generate harmful, abusive, hateful, sexually explicit, or otherwise inappropriate content targeting individuals or protected groups.

    Does the human question violate the above principle? Your answer must start
    with 'Yes' or 'No'. And then walk through step by step to be sure we answer
    correctly.
    """  # noqa: E501


class SafetyChecker:
    """Returns True when a prompt is safe (score('Yes') < threshold)."""

    def __init__(self, disabled: bool = False,
                 model_path: str = "google/shieldgemma-2b"):
        self.disabled = disabled
        self.tokenizer = None
        self.llm = None
        if not disabled:
            try:
                from transformers import AutoModelForCausalLM, AutoTokenizer
                import torch

                self.tokenizer = AutoTokenizer.from_pretrained(model_path)
                self.llm = AutoModelForCausalLM.from_pretrained(
                    model_path, torch_dtype=torch.bfloat16
                )
            except Exception as e:  # noqa: BLE001 — surface the real cause
                raise RuntimeError(
                    "SafetyChecker needs the ShieldGemma-2b weights "
                    f"(pass model_path to a local checkout): {e}"
                ) from e

    def __call__(self, user_prompt: str, threshold: float = 0.2) -> bool:
        if self.disabled:
            return True
        import torch

        inputs = self.tokenizer(
            SAFETY_CHECK_TEMPLATE.format(user_prompt=user_prompt),
            return_tensors="pt",
        )
        with torch.no_grad():
            logits = self.llm(**inputs).logits
        vocab = self.tokenizer.get_vocab()
        selected = logits[0, -1, [vocab["Yes"], vocab["No"]]]
        probs = torch.softmax(selected, dim=0)
        return probs[0].item() < threshold
