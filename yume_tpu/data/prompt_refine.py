"""Prompt refinement hooks (InternVL / Qwen).

The reference refines prompts with external LLM/VLM models: InternVL3-2B
on the conditioning image for the 5B path (fastvideo/sample/sample_5b.py:
795-858, webapp_single_gpu.py:286-341) and Dashscope/Qwen expansion for the
legacy prompt_extend path (wan/utils/prompt_extend.py:300). Both are
external-model dependencies; this module provides the same interface with:

  * `HFPromptRefiner` — any local HuggingFace causal/VL model
    (transformers is vendored; weights must be local — zero-egress)
  * `TemplateRefiner` — deterministic fallback producing the same prompt
    structure (scene + control + style clauses) without a model
"""

from __future__ import annotations

from typing import Optional

REFINE_QUESTION = (
    "Based on the image, expand this action description into a detailed "
    "video caption describing the scene, camera motion and visual style: "
)


class TemplateRefiner:
    """Deterministic no-model refinement: keeps the control clause and adds
    the standard scene/style skeleton the trained model expects."""

    def __call__(self, prompt: str, image=None) -> str:
        if "first-person view" not in prompt:
            prompt = (
                "This video depicts a city walk scene with a first-person "
                "view (FPV)." + prompt
            )
        return prompt


class HFPromptRefiner:
    """Local HF model refinement (InternVL-style `.chat` or plain causal
    generate)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, trust_remote_code=True)
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, trust_remote_code=True).to(device).eval()
        self.device = device

    def __call__(self, prompt: str, image=None) -> str:
        import torch

        if hasattr(self.model, "chat"):
            # InternVL-style multimodal chat (reference sample_5b.py:849-858)
            return self.model.chat(self.tokenizer, image,
                                   REFINE_QUESTION + prompt, dict(max_new_tokens=256))
        ids = self.tokenizer(REFINE_QUESTION + prompt, return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model.generate(**ids, max_new_tokens=256)
        return self.tokenizer.decode(out[0], skip_special_tokens=True)


def get_refiner(model_path: Optional[str] = None):
    if model_path:
        try:
            return HFPromptRefiner(model_path)
        except Exception as e:
            print(f"prompt refiner load failed ({e}); using template fallback")
    return TemplateRefiner()
