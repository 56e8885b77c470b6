"""Qwen-Image-Edit-2509 ("Plus") adapter: native multi-image composition.

Extends the base Qwen-Image-Edit adapter (reference
trainer/qwen_image_edit_plus_trainer.py:16-496):

  * every control image additionally yields a CONDITION image resized to
    ≤384² for the VL encoder (reference :104-111, 142-177) — full-resolution
    pixels still go to the VAE, the small copies only condition the prompt;
  * the chat template enumerates "Picture i: <|vision_start|><|image_pad|>
    <|vision_end|>" per image (reference :332-345);
  * control latents concatenate along the sequence with per-image img_shapes
    (reference :254-255 — already the base adapter's behavior).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from qflux_tpu.trainer.qwen_edit import QwenImageEditAdapter

# diffusers QwenImageEditPlusPipeline template
PLUS_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how the "
    "user's text instruction should alter or modify the image. Generate a new "
    "image that meets the user's requirements while maintaining consistency "
    "with the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
)
PLUS_DROP_IDX = 64
CONDITION_IMAGE_PIXELS = 384 * 384


def resize_condition_image(image: np.ndarray, max_pixels: int = CONDITION_IMAGE_PIXELS,
                           factor: int = 32) -> np.ndarray:
    """Aspect-preserving downscale to ≤max_pixels, factor-divisible
    (reference qwen_image_edit_plus_trainer.py:142-177)."""
    import cv2

    h, w = image.shape[:2]
    if h * w > max_pixels:
        scale = math.sqrt(max_pixels / (h * w))
        h, w = int(h * scale), int(w * scale)
    h = max(factor, h // factor * factor)
    w = max(factor, w // factor * factor)
    return cv2.resize(image, (w, h), interpolation=cv2.INTER_AREA)


@dataclasses.dataclass(frozen=True)
class QwenImageEditPlusAdapter(QwenImageEditAdapter):
    template: str = PLUS_TEMPLATE
    drop_idx: int = PLUS_DROP_IDX

    def format_prompt(self, prompt: str, n_images: int) -> str:
        pics = "".join(
            f"Picture {i + 1}: <|vision_start|><|image_pad|><|vision_end|>"
            for i in range(n_images))
        return self.template.format(pics + prompt)

    def encode_prompt(self, bundle, prompts, vl_images, max_sequence_length: int = 1024):
        small = [[resize_condition_image(np.asarray(im)) for im in images]
                 for images in vl_images]
        return super().encode_prompt(bundle, prompts, small, max_sequence_length)
