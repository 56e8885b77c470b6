"""HF Hub I/O: editing-dataset schema, LoRA upload/download.

Mirrors the reference's hub layer (reference utils/huggingface.py):
  * editing-dataset schema {id, control_images[], control_mask, target_image,
    prompt} (reference :16-24);
  * dataset upload from a local folder / CSV (reference :297-384);
  * load_editing_dataset (reference :386-398);
  * LoRA download + sha-indexed upload (reference :443-467, 469+).

All network operations are gated: this environment has zero egress, so every
function raises a clear error (or returns the local path) unless the hub is
reachable.  The schema/packing logic is pure and tested offline.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

EDITING_DATASET_FEATURES = {
    "id": "string",
    "control_images": "sequence<image>",
    "control_mask": "image",
    "target_image": "image",
    "prompt": "string",
}


def is_huggingface_repo(path: str) -> bool:
    """'org/name' that is not a local path (reference utils/huggingface.py:400)."""
    return ("/" in path and not os.path.exists(path)
            and len(path.split("/")) == 2 and not path.startswith((".", "/")))


def build_editing_records(dataset_root: str | Path) -> list[dict[str, Any]]:
    """Local folder dataset → editing-schema records (pure, no network)."""
    from qflux_tpu.data.dataset import ImageDataset
    from qflux_tpu.data.preprocess import ImageProcessor

    ds = ImageDataset(dataset_path=str(dataset_root), processor=ImageProcessor())
    records = []
    for i, s in enumerate(ds.samples):
        records.append({
            "id": f"{i:06d}",
            "control_images": list(s.get("controls") or []),
            "control_mask": s.get("mask_file"),
            "target_image": s["image"],
            "prompt": ds._prompt_of(s),
        })
    return records


def upload_editing_dataset(dataset_root: str | Path, repo_id: str,
                           private: bool = True) -> str:
    """Push a folder dataset to the Hub in the editing schema."""
    records = build_editing_records(dataset_root)
    try:
        from datasets import Dataset, Features, Image, Sequence, Value

        feats = Features({
            "id": Value("string"),
            "control_images": Sequence(Image()),
            "control_mask": Image(),
            "target_image": Image(),
            "prompt": Value("string"),
        })
        ds = Dataset.from_list(records, features=feats)
        ds.push_to_hub(repo_id, private=private)
        return repo_id
    except Exception as e:
        raise RuntimeError(
            f"hub upload unavailable in this environment ({e}); "
            f"{len(records)} records were built and validated locally") from e


def load_editing_dataset(repo_id: str, split: str = "train"):
    from datasets import load_dataset

    return load_dataset(repo_id, split=split)


def download_lora(repo_id: str, filename: str = "pytorch_lora_weights.safetensors",
                  cache_dir: Optional[str] = None) -> Path:
    """Fetch a LoRA file from the Hub (or return it directly if repo_id is a
    local path)."""
    local = Path(repo_id)
    if local.exists():
        return local if local.is_file() else local / filename
    from huggingface_hub import hf_hub_download

    return Path(hf_hub_download(repo_id, filename, cache_dir=cache_dir))


def upload_lora_safetensors(path: str | Path, repo_id: str,
                            private: bool = True) -> str:
    """Upload a LoRA checkpoint under a content-hash-indexed name
    (reference utils/huggingface.py:469+)."""
    from qflux_tpu.utils.hashing import sha256_file

    path = Path(path)
    digest = sha256_file(path)[:12]
    dest = f"loras/{digest}/{path.name}"
    try:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_file(path_or_fileobj=str(path), path_in_repo=dest, repo_id=repo_id)
        return dest
    except Exception as e:
        raise RuntimeError(f"hub upload unavailable ({e}); would upload to {dest}") from e
