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

import dataclasses
from typing import Optional

import numpy as np

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
    """'remote' (or a set YUME_REFINE_URL with no local model) → the remote
    expander; a path → local HF model; otherwise the template fallback."""
    import os

    if model_path == "remote" or (not model_path
                                  and os.environ.get("YUME_REFINE_URL")):
        try:
            return RemoteRefiner()
        except Exception as e:
            print(f"remote refiner unavailable ({e}); using template fallback")
    elif model_path:
        try:
            return HFPromptRefiner(model_path)
        except Exception as e:
            print(f"prompt refiner load failed ({e}); using template fallback")
    return TemplateRefiner()


# ---------------------------------------------------------------------------
# remote prompt expansion (≙ the reference's DashScopePromptExpander,
# wan/utils/prompt_extend.py:157-290: qwen-plus text / qwen-vl-max image
# expansion over the DashScope HTTP API with retries + graceful fallback)
# ---------------------------------------------------------------------------

SYSTEM_PROMPT_EN = (
    "You expand short video-generation prompts into one vivid, concrete "
    "paragraph: describe the scene, subjects, motion, camera movement, and "
    "lighting, keep every control token from the input unchanged, and do "
    "not add meta commentary.")
SYSTEM_PROMPT_ZH = (
    "你负责把简短的视频生成提示词扩写成一段具体生动的描述：包括场景、主体、"
    "运动、镜头与光线；保留输入中的所有控制符号，不要添加任何解释。")


@dataclasses.dataclass
class RefineResult:
    """≙ the reference's PromptOutput (prompt_extend.py:33-47)."""

    status: bool
    prompt: str
    seed: int
    system_prompt: str
    message: str = ""


class RemoteRefiner:
    """Prompt expansion over a remote OpenAI/DashScope-style chat endpoint
    using stdlib urllib (no SDK dependency). Configure with
    ``YUME_REFINE_URL`` (+ optional ``YUME_REFINE_KEY``,
    ``YUME_REFINE_MODEL``) or pass explicitly. Retries ``retry_times`` and
    falls back to the original prompt with ``status=False`` — the same
    contract as the reference expander."""

    def __init__(self, base_url: Optional[str] = None,
                 api_key: Optional[str] = None,
                 model_name: Optional[str] = None,
                 retry_times: int = 4, tar_lang: str = "en",
                 max_image_size: int = 512 * 512):
        import os

        self.base_url = base_url or os.environ.get("YUME_REFINE_URL")
        if not self.base_url:
            raise ValueError("no refine endpoint: set YUME_REFINE_URL")
        self.api_key = api_key or os.environ.get("YUME_REFINE_KEY")
        self.model = model_name or os.environ.get("YUME_REFINE_MODEL",
                                                  "qwen-plus")
        self.retry_times = retry_times
        self.system_prompt = (SYSTEM_PROMPT_ZH if tar_lang == "zh"
                              else SYSTEM_PROMPT_EN)
        self.max_image_size = max_image_size

    def _content(self, prompt: str, image) -> list:
        if image is None:
            return [{"type": "text", "text": prompt}]
        # bounded-area resize then inline data URL (≙ extend_with_img's
        # max_image_size resize + file upload, prompt_extend.py:233-249)
        import base64
        import io
        import math

        from PIL import Image

        img = Image.fromarray(
            np.clip((np.asarray(image) + 1.0) * 127.5, 0, 255).astype(np.uint8)
            if np.asarray(image).dtype != np.uint8 else np.asarray(image))
        area = min(img.width * img.height, self.max_image_size)
        ar = img.height / img.width
        img = img.resize((round(math.sqrt(area / ar)),
                          round(math.sqrt(area * ar))))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        url = ("data:image/png;base64," +
               base64.b64encode(buf.getvalue()).decode())
        return [{"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": prompt}]

    def extend(self, prompt: str, image=None, seed: int = -1) -> RefineResult:
        import json as _json
        import random
        import urllib.request

        if seed < 0:
            seed = random.randint(0, 2**31 - 1)
        body = _json.dumps({
            "model": self.model,
            "seed": seed,
            "messages": [
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": self._content(prompt, image)},
            ],
        }).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        err = None
        for _ in range(self.retry_times):
            try:
                req = urllib.request.Request(self.base_url, data=body,
                                             headers=headers, method="POST")
                with urllib.request.urlopen(req, timeout=60) as r:
                    out = _json.loads(r.read())
                text = out["choices"][0]["message"]["content"]
                return RefineResult(True, text, seed, self.system_prompt)
            except Exception as e:  # noqa: keep retrying on any transport error
                err = e
        return RefineResult(False, prompt, seed, self.system_prompt, str(err))

    def __call__(self, prompt: str, image=None) -> str:
        return self.extend(prompt, image).prompt
