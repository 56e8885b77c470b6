"""Edit-triplet dataset (target image, ≥1 control images, prompt, optional
mask) over local folders / CSV / HF Hub, with embedding-cache integration.

Re-implements the reference's ImageDataset (reference data/dataset.py:76-638):
  * local-dir layout with alias directory names and `stem_control_N` /
    `stem_mask` / `stem.txt` conventions (reference dataset.py:290-415);
  * CSV sources with path_target / path_control_N / prompt / path_mask
    columns (reference dataset.py:250-287);
  * HF Hub editing datasets ({control_images[], target_image, prompt}
    schema, reference utils/huggingface.py:16-24) — gated on network;
  * per-sample content hashes feeding the cache (reference
    dataset.py:425-452): image/control/prompt/empty_prompt/control_prompt/
    controls_sum;
  * cached-embedding fast path with caption-dropout substitution
    (reference dataset.py:549-556).

No torch DataLoader: batching/prefetch is handled by data/loader.py (host
threads + simple bucketed batching; arrays are numpy until device_put).
"""

from __future__ import annotations

import glob
import logging
import os
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np

from qflux_tpu.data.cache import EmbeddingCacheManager
from qflux_tpu.data.preprocess import ImageProcessor
from qflux_tpu.utils.hashing import md5_string

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
IMAGE_DIR_ALIASES = ["training_images", "images", "target_images", "target", "targets"]
CONTROL_DIR_ALIASES = ["control_images", "control", "condition_images", "controls"]


def _read_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[:, :, :3][:, :, ::-1]  # BGRA/BGR → RGB
    return np.ascontiguousarray(img)


def _first_existing(d: str, stem: str) -> Optional[str]:
    for ext in IMG_EXTS:
        p = os.path.join(d, stem + ext)
        if os.path.exists(p):
            return p
    return None


def _find_mask(images_dir, control_dir, stem) -> Optional[str]:
    for d in (control_dir, images_dir):
        if d is None:
            continue
        for ext in (".png",) + IMG_EXTS:
            p = os.path.join(d, f"{stem}_mask{ext}")
            if os.path.exists(p):
                return p
    return None


def _collect_extra_controls(control_dir: str, stem: str) -> list[str]:
    out = []
    i = 1
    while True:
        p = _first_existing(control_dir, f"{stem}_control_{i}")
        if p is None:
            break
        out.append(p)
        i += 1
    return out


def is_huggingface_repo(path: str) -> bool:
    """Heuristic from the reference (utils/huggingface.py:400): 'org/name'
    that is not an existing local path."""
    return ("/" in path and not os.path.exists(path)
            and len(path.split("/")) == 2 and not path.startswith((".", "/")))


class ImageDataset:
    def __init__(
        self,
        dataset_path: str | Sequence[str] | None = None,
        csv_path: Optional[str] = None,
        processor: Optional[ImageProcessor] = None,
        cache_dir: Optional[str] = None,
        use_cache: bool = False,
        caption_dropout_rate: float = 0.0,
        prompt_image_dropout_rate: float = 0.0,
        use_edit_mask: bool = False,
        selected_control_indexes: Optional[Sequence[int]] = None,
        seed: int = 0,
        **_,
    ):
        self.processor = processor or ImageProcessor()
        self.cache_manager = EmbeddingCacheManager(cache_dir) if cache_dir else None
        self.use_cache = use_cache and cache_dir is not None
        self.caption_dropout_rate = caption_dropout_rate
        # drop ALL conditioning (prompt AND control context) for cfg-style
        # regularization (reference init_args prompt_image_dropout_rate)
        self.prompt_image_dropout_rate = prompt_image_dropout_rate
        self.use_edit_mask = use_edit_mask
        # 1-based control selection (reference selected_control_indexes)
        self.selected_control_indexes = (list(selected_control_indexes)
                                         if selected_control_indexes else None)
        self._seed = seed
        self._visit_counts: dict[int, int] = {}
        self._rng_lock = __import__("threading").Lock()
        self.samples: list[dict] = []

        paths = [dataset_path] if isinstance(dataset_path, (str, Path)) else list(dataset_path or [])
        for p in paths:
            p = str(p)
            if is_huggingface_repo(p):
                self._load_hf_repo(p)
            else:
                self._scan_local(p)
        if csv_path:
            self._load_csv(csv_path)
        if not self.samples:
            raise ValueError(f"no samples found in {paths or csv_path}")

    # -- sources -------------------------------------------------------------

    def _find_dirs(self, root: str):
        images_dir = next((os.path.join(root, n) for n in IMAGE_DIR_ALIASES
                           if os.path.isdir(os.path.join(root, n))), None)
        control_dir = next((os.path.join(root, n) for n in CONTROL_DIR_ALIASES
                            if os.path.isdir(os.path.join(root, n))), None)
        return images_dir, control_dir

    def _scan_local(self, root: str):
        images_dir, control_dir = self._find_dirs(root)
        if images_dir is None:
            raise ValueError(f"no image directory found under {root} "
                             f"(looked for {IMAGE_DIR_ALIASES})")
        targets = sorted(
            p for p in glob.glob(os.path.join(images_dir, "*.*"))
            if p.lower().endswith(IMG_EXTS)
            and "_mask" not in os.path.basename(p)
            and "_control_" not in os.path.basename(p)
        )
        for img_path in targets:
            stem = os.path.splitext(os.path.basename(img_path))[0]
            prompt_file = None
            for d in (images_dir, control_dir):
                if d and os.path.exists(os.path.join(d, f"{stem}.txt")):
                    prompt_file = os.path.join(d, f"{stem}.txt")
                    break
            if prompt_file is None:
                continue
            controls: list[str] = []
            if control_dir:
                main = _first_existing(control_dir, stem)
                if main:
                    controls = [main] + _collect_extra_controls(control_dir, stem)
                if self.selected_control_indexes and controls:
                    controls = [controls[i - 1] for i in self.selected_control_indexes
                                if 0 < i <= len(controls)]
            self.samples.append({
                "image": img_path,
                "controls": controls,
                "prompt_file": prompt_file,
                "mask_file": _find_mask(images_dir, control_dir, stem),
                "source": "local",
            })
        logging.info("scanned %s: %d samples", root, len(self.samples))

    def _load_csv(self, csv_path: str):
        import pandas as pd

        df = pd.read_csv(csv_path)
        base = os.path.dirname(os.path.abspath(csv_path))
        resolve = lambda p: p if os.path.isabs(p) else os.path.join(base, p)
        ctl_cols = sorted([c for c in df.columns if c.startswith("path_control")])
        for _, row in df.iterrows():
            controls = [resolve(row[c]) for c in ctl_cols
                        if isinstance(row[c], str) and row[c]]
            self.samples.append({
                "image": resolve(row["path_target"]),
                "controls": controls,
                "prompt": str(row["prompt"]),
                "mask_file": resolve(row["path_mask"])
                if "path_mask" in df.columns and isinstance(row.get("path_mask"), str) else None,
                "source": "csv",
            })

    def _load_hf_repo(self, repo: str):
        """HF editing-dataset schema {id, control_images[], target_image,
        prompt} (reference utils/huggingface.py:16-24, 386-398)."""
        from datasets import load_dataset  # requires network

        ds = load_dataset(repo, split="train")
        for i, rec in enumerate(ds):
            self.samples.append({
                "hf_record": rec,
                "image": None,
                "controls": None,
                "prompt": rec.get("prompt", ""),
                "mask_file": None,
                "source": "hf",
                "hf_index": i,
            })

    # -- hashing (reference dataset.py:425-452) -------------------------------

    def file_hashes(self, sample: dict) -> dict[str, str]:
        cm = EmbeddingCacheManager  # static hashing helpers
        hashes: dict[str, str] = {}
        main = ""
        hashes["image_hash"] = cm.get_hash(sample["image"])
        main += hashes["image_hash"]
        prompt = self._prompt_of(sample)
        controls = sample.get("controls") or []
        if controls:
            hashes["control_hash"] = cm.get_hash(controls[0])
            main += hashes["control_hash"]
        hashes["prompt_hash"] = md5_string(prompt)
        main += hashes["prompt_hash"]
        hashes["empty_prompt_hash"] = md5_string("empty")
        if controls:
            hashes["control_prompt_hash"] = cm.get_hash(controls[0], prompt)
            hashes["control_empty_prompt_hash"] = cm.get_hash(controls[0], "empty")
            controls_sum = hashes["control_hash"]
            for i, c in enumerate(controls[1:], start=1):
                hashes[f"control_{i}_hash"] = cm.get_hash(c)
                controls_sum += hashes[f"control_{i}_hash"]
            hashes["controls_sum_hash"] = md5_string(controls_sum)
        hashes["main_hash"] = md5_string(main)
        return hashes

    def _prompt_of(self, sample: dict) -> str:
        if "prompt" in sample and sample["prompt"] is not None:
            return sample["prompt"]
        return Path(sample["prompt_file"]).read_text().strip()

    # -- item access ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        sample = self.samples[idx]
        if sample["source"] == "hf":
            sample = self._materialize_hf(sample)
        prompt = self._prompt_of(sample)
        hashes = self.file_hashes(sample)

        out: dict[str, Any] = {
            "prompt": prompt,
            "file_hashes": hashes,
            "cached": False,
        }

        # cfg-style conditioning dropout: prompt_image_dropout drops BOTH the
        # prompt and the control context; caption_dropout drops the prompt only
        # (reference data/config.py:383 declares the knob; applied here at item
        # level — control latents/pixels are zeroed so shapes stay static)
        # dropout draws are keyed by (seed, sample index, visit count) so they
        # are deterministic regardless of loader-worker-thread completion
        # order AND resample on every epoch
        with self._rng_lock:
            visit = self._visit_counts.get(idx, 0)
            self._visit_counts[idx] = visit + 1
        u1, u2 = np.random.default_rng((self._seed, idx, visit)).random(2)
        drop_all = (self.prompt_image_dropout_rate > 0
                    and u1 < self.prompt_image_dropout_rate)
        drop_caption = drop_all or (
            self.caption_dropout_rate > 0 and u2 < self.caption_dropout_rate)

        if self.use_cache and self.cache_manager and self.cache_manager.exists(hashes["main_hash"]):
            cached = self.cache_manager.load(hashes["main_hash"],
                                             use_empty_prompt=drop_caption)
            if cached is not None:
                out.update(cached)
                if drop_all:
                    for k, v in out.items():
                        if k.startswith("control") and hasattr(v, "dtype"):
                            out[k] = np.zeros_like(v)
                out["cached"] = True
                return out

        # non-cached path: load + preprocess pixels
        raw: dict[str, Any] = {"image": _read_image(sample["image"])}
        controls = sample.get("controls") or []
        if controls:
            raw["control"] = _read_image(controls[0])
            if len(controls) > 1:
                raw["controls"] = [_read_image(c) for c in controls[1:]]
        if self.use_edit_mask and sample.get("mask_file"):
            import cv2

            m = cv2.imread(sample["mask_file"], cv2.IMREAD_GRAYSCALE)
            raw["mask"] = m
        proc = self.processor.preprocess(raw)
        if drop_caption:
            out["prompt"] = ""
        # drop_all on the pixel path: flag the item; the Trainer zeroes the
        # control LATENTS after encoding so the null-conditioning
        # representation is identical to the cached path's zeroed latents
        out["drop_context"] = bool(drop_all)
        out["image"] = proc["image"]
        out["img_shapes"] = [tuple(proc["image"].shape[:2])]
        if "control" in proc:
            out["control"] = proc["control"]
            out["img_shapes"].append(tuple(proc["control"].shape[:2]))
        for i, c in enumerate(proc.get("controls", []), start=1):
            out[f"control_{i}"] = c
            out["img_shapes"].append(tuple(c.shape[:2]))
        if "mask" in proc:
            out["mask"] = proc["mask"]
        return out

    def _materialize_hf(self, sample: dict) -> dict:
        import tempfile

        rec = sample["hf_record"]
        tmp = Path(tempfile.gettempdir()) / "qflux_tpu_hf" / str(sample["hf_index"])
        tmp.mkdir(parents=True, exist_ok=True)
        tgt = tmp / "target.png"
        if not tgt.exists():
            rec["target_image"].save(tgt)
        controls = []
        for i, im in enumerate(rec.get("control_images") or []):
            p = tmp / f"control_{i}.png"
            if not p.exists():
                im.save(p)
            controls.append(str(p))
        return {**sample, "image": str(tgt), "controls": controls,
                "prompt": rec.get("prompt", ""), "source": "local"}
