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

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def find_closest_aspect_ratio(aspect_ratio, target_ratios, width, height,
                              image_size):
    """(reference fastvideo/sample/sample_5b.py:83-96)"""
    best_ratio_diff = float("inf")
    best_ratio = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target_ar = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target_ar)
        if diff < best_ratio_diff:
            best_ratio_diff = diff
            best_ratio = ratio
        elif diff == best_ratio_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best_ratio = ratio
    return best_ratio


def dynamic_tile_image(image, min_num=1, max_num=12, image_size=448,
                       use_thumbnail=True):
    """InternVL dynamic tiling (reference sample_5b.py:98-135 /
    webapp_single_gpu.py:290-318): choose the grid (i, j) with i·j ≤ max_num
    closest to the image's aspect ratio, resize to i·448 × j·448, crop the
    448² tiles row-major, and append a thumbnail when >1 tile.

    ``image``: PIL Image or [H, W, 3] uint8/float array. Returns
    [N, 3, 448, 448] float32, ImageNet-normalised (the layout
    ``model.chat(tokenizer, pixel_values, ...)`` expects).
    """
    import numpy as np
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip((arr + 1.0) * 127.5 if arr.min() < 0 else arr * 255.0,
                          0, 255).astype(np.uint8)
        image = Image.fromarray(arr)
    image = image.convert("RGB")
    ow, oh = image.size
    aspect_ratio = ow / oh
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    grid = find_closest_aspect_ratio(aspect_ratio, target_ratios, ow, oh,
                                     image_size)
    tw, th = image_size * grid[0], image_size * grid[1]
    blocks = grid[0] * grid[1]
    resized = image.resize((tw, th))
    tiles = []
    for i in range(blocks):
        box = ((i % (tw // image_size)) * image_size,
               (i // (tw // image_size)) * image_size,
               ((i % (tw // image_size)) + 1) * image_size,
               ((i // (tw // image_size)) + 1) * image_size)
        tiles.append(resized.crop(box))
    if use_thumbnail and len(tiles) != 1:
        tiles.append(image.resize((image_size, image_size)))
    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    px = [
        (np.asarray(t.resize((image_size, image_size), Image.BICUBIC),
                    np.float32).transpose(2, 0, 1) / 255.0 - mean) / std
        for t in tiles
    ]
    return np.stack(px)


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
            # InternVL-style multimodal chat on dynamically tiled pixel
            # values (reference sample_5b.py:795-858,
            # webapp_single_gpu.py:321-331)
            px = None
            question = REFINE_QUESTION + prompt
            if image is not None:
                px = torch.from_numpy(dynamic_tile_image(image)).to(self.device)
                question = (
                    f'<image>\nWe want to generate a video using this prompt:'
                    f' "{prompt}". Please refine it for this image (<image>).'
                    f' Keep it one paragraph.')
            out = self.model.chat(self.tokenizer, px, question,
                                  dict(max_new_tokens=512, do_sample=True))
            return out or prompt
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
