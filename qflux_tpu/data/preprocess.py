"""Resolution-policy engine (host-side, numpy/cv2).

Re-implements the reference's ImageProcessor (reference data/preprocess.py):
modes resize / center_crop / center_padding / right_padding / fixed_pixels,
16-divisibility, fixed-pixel-budget factorization (best_area_near /
best_hw_given_area), and multi-resolution candidate selection (simple list or
per-image-type dict) with a max-aspect-ratio guard.

TPU addition: every resolution this module can emit is a **bucket** — a static
(H, W) the jitted train step compiles once per.  `bucket_key()` exposes the
compile-cache key; for candidate lists the bucket set is finite and
enumerable up front (the reference's candidate lists map 1:1 onto XLA
compile-cache entries — SURVEY.md §7).

Outputs are NHWC uint8 numpy arrays; range conversion happens in the model
adapters (FLUX VAE wants [-1,1]; Qwen-VL wants [0,255]).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

try:
    import cv2

    _INTERP = {"bilinear": cv2.INTER_LINEAR, "bicubic": cv2.INTER_CUBIC,
               "nearest": cv2.INTER_NEAREST, "area": cv2.INTER_AREA}
except Exception:  # pragma: no cover - cv2 is present in this environment
    cv2 = None
    _INTERP = {}

from qflux_tpu.config import ProcessorSection


def _resize(img: np.ndarray, w: int, h: int, interp: str = "bilinear") -> np.ndarray:
    return cv2.resize(img, (w, h), interpolation=_INTERP[interp])


# ---------------------------------------------------------------------------
# fixed-pixel-budget factorization (reference preprocess.py:38-149)

def count_hw_pairs(area: int, min_side=256, max_side=2048, step=16, max_examples=12):
    """Ordered (H, W) pairs with H*W == area, step-divisible, side-bounded."""
    base = step * step
    if area % base:
        return 0, []
    n = area // base
    count, examples = 0, []
    for a in range(1, n + 1):
        if n % a:
            continue
        b = n // a
        H, W = step * a, step * b
        if min_side <= H <= max_side and min_side <= W <= max_side:
            count += 1
            if len(examples) < max_examples:
                examples.append((H, W))
    return count, examples


def best_area_near(area: int, tol=0.20, min_side=256, max_side=2048, step=16,
                   max_examples=12) -> Optional[dict]:
    """Area within ±tol of `area` with the most step-divisible (H, W)
    factorizations; ties → smaller relative error → smaller area."""
    if area <= 0:
        raise ValueError("area must be positive")
    base = step * step
    lo, hi = math.ceil(area * (1 - tol)), math.floor(area * (1 + tol))
    start = ((lo + base - 1) // base) * base
    best = None
    a = start
    while a <= hi:
        cnt, exs = count_hw_pairs(a, min_side, max_side, step, max_examples)
        if cnt > 0:
            item = (-cnt, abs(a - area) / area, a, exs)
            if best is None or item[:3] < best[:3]:
                best = item
        a += base
    if best is None:
        return None
    return {"best_area": best[2], "count": -best[0], "relative_error": best[1],
            "examples": best[3]}


def best_hw_given_area(area: int, w: int, h: int, step: int = 16,
                       min_side: Optional[int] = None,
                       max_side: Optional[int] = None) -> Optional[tuple[int, int]]:
    """(new_w, new_h) with new_w*new_h == area, step-divisible, aspect ratio
    closest to w/h (log distance; ties → L1 to original → smaller max side)."""
    base = step * step
    if area % base:
        return None
    n = area // base
    target = w / h
    best = None
    for a in range(1, n + 1):
        if n % a:
            continue
        b = n // a
        nh, nw = step * a, step * b
        if min_side is not None and (nw < min_side or nh < min_side):
            continue
        if max_side is not None and (nw > max_side or nh > max_side):
            continue
        score = (abs(math.log((nw / nh) / target)), abs(nw - w) + abs(nh - h),
                 max(nw, nh), nw, nh)
        if best is None or score < best:
            best = score
    return None if best is None else (best[3], best[4])


def calculate_best_resolution(width: int, height: int, pixels: int,
                              divisor: int = 32) -> tuple[int, int]:
    """Aspect-preserving (w, h) near `pixels` total, divisor-rounded
    (reference utils/images.py:49-59)."""
    ratio = width / height
    w = math.sqrt(pixels * ratio)
    return round(w / divisor) * divisor, round(w / ratio / divisor) * divisor


# ---------------------------------------------------------------------------
# processor

class ImageProcessor:
    def __init__(self, config: ProcessorSection | None = None, **overrides):
        if config is None:
            config = ProcessorSection(**overrides)
        elif overrides:
            config = config.model_copy(update=overrides)
        self.config = config
        self._parse_multi_res()

    # -- multi-res candidates (reference preprocess.py:236-314) ------------

    def _parse_multi_res(self):
        mr = self.config.multi_resolutions
        if mr is None:
            self.multi_res_target = None
            self.multi_res_controls = None
        elif isinstance(mr, list):
            pix = [self._as_pixels(c) for c in mr]
            self.multi_res_target = pix
            self.multi_res_controls = [pix]
        elif isinstance(mr, dict):
            tgt = mr.get("target", (mr.get("controls") or [[]])[0])
            self.multi_res_target = [self._as_pixels(c) for c in tgt]
            ctls = mr.get("controls", [tgt])
            self.multi_res_controls = [[self._as_pixels(c) for c in cl] for cl in ctls]
        else:
            raise ValueError(f"multi_resolutions must be list or dict, got {type(mr)}")

    @staticmethod
    def _as_pixels(cand) -> int:
        """Candidate is either [H, W] or a raw pixel count."""
        if isinstance(cand, (list, tuple)):
            return int(cand[0]) * int(cand[1])
        return int(cand)

    def candidates_for(self, kind: str) -> Optional[list[int]]:
        if kind == "target":
            return self.multi_res_target
        if kind.startswith("control"):
            if not self.multi_res_controls:
                return None
            idx = int(kind.split("_")[1]) if "_" in kind else 0
            return self.multi_res_controls[idx % len(self.multi_res_controls)]
        return None

    def select_pixels(self, orig_w: int, orig_h: int, candidates: Sequence[int]) -> int:
        ratio = orig_w / orig_h
        mar = self.config.max_aspect_ratio
        if mar is not None and (ratio > mar or ratio < 1.0 / mar):
            raise ValueError(
                f"image aspect ratio {ratio:.2f} exceeds max_aspect_ratio {mar:.2f}")
        area = orig_w * orig_h
        errs = [abs(c - area) / area for c in candidates]
        return candidates[int(np.argmin(errs))]

    # -- single-image processing -------------------------------------------

    def process_image(self, image: np.ndarray, kind: str = "target",
                      size: Optional[Sequence[int]] = None,
                      pixels: Optional[int] = None) -> np.ndarray:
        cfg = self.config
        cands = self.candidates_for(kind)
        if cands:
            h, w = image.shape[:2]
            best = self.select_pixels(w, h, cands)
            nw, nh = calculate_best_resolution(w, h, best)
            return _resize(image, nw, nh, cfg.resize_mode)

        if size is None:
            size = self._size_for(kind)
        if pixels is None:
            pixels = self._pixels_for(kind)

        if cfg.process_type == "resize":
            th, tw = self.make_divisible(size)
            return _resize(image, tw, th, cfg.resize_mode)
        if cfg.process_type == "center_crop":
            return self._center_crop(image, self.make_divisible(size))
        if cfg.process_type.endswith("_padding"):
            return self._padding(image, self.make_divisible(size))
        if cfg.process_type == "fixed_pixels":
            return self._fixed_pixels(image, pixels)
        return self._center_crop(image, self.make_divisible(size))

    def _size_for(self, kind):
        cfg = self.config
        if kind == "target":
            return cfg.target_size
        idx = int(kind.split("_")[1]) if "_" in kind else 0
        if cfg.controls_size and idx < len(cfg.controls_size) and cfg.controls_size[idx]:
            return cfg.controls_size[idx]
        return cfg.target_size

    def _pixels_for(self, kind):
        cfg = self.config
        if kind == "target":
            return cfg.target_pixels
        idx = int(kind.split("_")[1]) if "_" in kind else 0
        if cfg.controls_pixels and idx < len(cfg.controls_pixels) and cfg.controls_pixels[idx]:
            return cfg.controls_pixels[idx]
        return cfg.target_pixels

    def make_divisible(self, size) -> tuple[int, int]:
        h, w = size
        d = self.config.divisible_by
        return (h // d) * d, (w // d) * d

    def _center_crop(self, image, size):
        h, w = image.shape[:2]
        th, tw = size
        scale = min(w / tw, h / th)
        nw, nh = int(tw * scale), int(th * scale)
        x0, y0 = (w - nw) // 2, (h - nh) // 2
        return _resize(image[y0:y0 + nh, x0:x0 + nw], tw, th, self.config.resize_mode)

    def _padding(self, image, size):
        h, w = image.shape[:2]
        th, tw = size
        scale = min(tw / w, th / h)
        nw, nh = int(w * scale), int(h * scale)
        resized = _resize(image, nw, nh, self.config.resize_mode)
        shape = (th, tw) if image.ndim == 2 else (th, tw, image.shape[2])
        out = np.zeros(shape, dtype=image.dtype)
        if self.config.process_type == "right_padding":
            x0, y0 = 0, (th - nh) // 2
        else:
            x0, y0 = (tw - nw) // 2, (th - nh) // 2
        out[y0:y0 + nh, x0:x0 + nw] = resized
        return out

    def _fixed_pixels(self, image, pixels):
        h, w = image.shape[:2]
        pixels = int(pixels / (32 * 32)) * (32 * 32)
        hw = best_hw_given_area(pixels, w, h)
        if hw is None:
            raise ValueError(f"no 16-divisible factorization of {pixels}")
        nw, nh = hw
        return _resize(image, nw, nh, self.config.resize_mode)

    def output_shape(self, orig_h: int, orig_w: int, kind: str = "target"
                     ) -> tuple[int, int]:
        """Processed (H, W) from the SOURCE dimensions alone — pure geometry,
        no pixel decode. Mirrors process_image() branch for branch; used by
        the loader to bucket samples from image file headers (reference
        amortizes this in lazy torch workers, data/dataset.py:743-751)."""
        cfg = self.config
        cands = self.candidates_for(kind)
        if cands:
            best = self.select_pixels(orig_w, orig_h, cands)
            nw, nh = calculate_best_resolution(orig_w, orig_h, best)
            return nh, nw
        if cfg.process_type == "fixed_pixels":
            pixels = self._pixels_for(kind)
            pixels = int(pixels / (32 * 32)) * (32 * 32)
            hw = best_hw_given_area(pixels, orig_w, orig_h)
            if hw is None:
                raise ValueError(f"no 16-divisible factorization of {pixels}")
            return hw[1], hw[0]
        # resize / center_crop / *_padding all emit the divisor-rounded
        # configured size regardless of input dims
        return self.make_divisible(self._size_for(kind))

    # -- sample-level API ---------------------------------------------------

    def preprocess(self, sample: dict) -> dict:
        """Process {image, mask?, control?, controls?}: each by its own
        policy; mask follows the target (reference preprocess.py:358-457)."""
        out = dict(sample)
        if "image" in out:
            out["image"] = self.process_image(np.asarray(out["image"]), "target")
        if "mask" in out:
            m = self.process_image(np.asarray(out["mask"]), "target")
            out["mask"] = (m.astype(np.float32) / 255.0)
        if "control" in out:
            out["control"] = self.process_image(np.asarray(out["control"]), "control_0")
        if "controls" in out:
            out["controls"] = [
                self.process_image(np.asarray(c), f"control_{i + 1}")
                for i, c in enumerate(out["controls"])
            ]
        return out

    # -- bucket registry (TPU compile-cache keys) ---------------------------

    def bucket_key(self, sample: dict) -> tuple:
        """Static-shape key for the jit compile cache: shapes of target +
        all controls after preprocessing."""
        shapes = [tuple(np.asarray(sample["image"]).shape[:2])]
        if "control" in sample:
            shapes.append(tuple(np.asarray(sample["control"]).shape[:2]))
        for c in sample.get("controls", []):
            shapes.append(tuple(np.asarray(c).shape[:2]))
        return tuple(shapes)
