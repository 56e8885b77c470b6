"""Content-addressed embedding cache.

Re-design of the reference's EmbeddingCacheManager (reference
data/cache_manager.py:11-131): same content-addressing scheme —

  cache_root/<embedding_key>/<hash>.npz          one array per file, fp16
  cache_root/metadata/<main_hash>.json           {embedding_key: hash}

— but stored as numpy .npz (host arrays feed jax.device_put directly; no
torch dependency).  Caption dropout support: `empty_*`-keyed embeddings are
cached alongside and substituted at load time (reference
cache_manager.py:94-125, dataset.py:549-556).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping, Optional

import numpy as np

from qflux_tpu.utils.hashing import combine_hashes, md5_file, md5_string

CACHE_VERSION = "2.0-tpu"


class EmbeddingCacheManager:
    def __init__(self, cache_root: str | Path):
        self.root = Path(cache_root)
        self.meta_dir = self.root / "metadata"

    # -- hashing ------------------------------------------------------------

    # files at/above this size hash with the native XXH64 (csrc/qflux_host.cpp,
    # ~10× md5 throughput); smaller files keep md5 so existing caches stay valid
    BIG_FILE_THRESHOLD = 64 << 20

    @staticmethod
    def _file_hash(path) -> str:
        try:
            if Path(str(path)).stat().st_size >= EmbeddingCacheManager.BIG_FILE_THRESHOLD:
                from qflux_tpu.runtime.native import xxh64_file

                return f"x{xxh64_file(path)}"
        except OSError:
            pass
        return md5_file(path)

    @staticmethod
    def get_hash(*items) -> str:
        """Hash files (by content) and strings (by value), combined."""
        parts = []
        for item in items:
            if isinstance(item, (list, tuple)):
                parts.extend(EmbeddingCacheManager.get_hash(x) for x in item)
            elif isinstance(item, (str, Path)) and Path(str(item)).is_file():
                parts.append(EmbeddingCacheManager._file_hash(item))
            else:
                parts.append(md5_string(str(item)))
        return combine_hashes(*parts) if len(parts) > 1 else parts[0]

    # -- save / load ---------------------------------------------------------

    def save(self, main_hash: str, embeddings: Mapping[str, np.ndarray],
             hashes: Mapping[str, str]) -> None:
        """Save each embedding under its content hash; write the metadata map.

        `hashes` maps embedding_key → content hash (e.g. prompt_embeds →
        prompt_hash value).  Missing keys fall back to main_hash.
        """
        meta = {}
        for key, arr in embeddings.items():
            if arr is None:
                continue
            h = hashes.get(key, main_hash)
            d = self.root / key
            d.mkdir(parents=True, exist_ok=True)
            path = d / f"{h}.npz"
            if not path.exists():
                arr = np.asarray(arr)
                store = arr.astype(np.float16) if arr.dtype in (np.float32, np.float64) else arr
                np.savez_compressed(path, data=store)
            meta[key] = h
        self.meta_dir.mkdir(parents=True, exist_ok=True)
        (self.meta_dir / f"{main_hash}.json").write_text(
            json.dumps({"version": CACHE_VERSION, "keys": meta}))

    def exists(self, main_hash: str) -> bool:
        return (self.meta_dir / f"{main_hash}.json").is_file()

    def array_shape(self, main_hash: str, key: str) -> Optional[tuple]:
        """Shape of one cached embedding from the npz member HEADER — no
        array data is read or decompressed (the loader buckets cached
        samples by latent shape in O(header), not O(decode))."""
        import zipfile

        meta_path = self.meta_dir / f"{main_hash}.json"
        if not meta_path.is_file():
            return None
        meta = json.loads(meta_path.read_text())["keys"]
        if key not in meta:
            return None
        path = self.root / key / f"{meta[key]}.npz"
        if not path.is_file():
            return None
        try:
            with zipfile.ZipFile(path) as z, z.open("data.npy") as f:
                version = np.lib.format.read_magic(f)
                reader = (np.lib.format.read_array_header_1_0 if version == (1, 0)
                          else np.lib.format.read_array_header_2_0)
                shape, _, _ = reader(f)
                return tuple(shape)
        except Exception:
            return None

    def load(self, main_hash: str, use_empty_prompt: bool = False,
             dtype=np.float32) -> Optional[dict[str, np.ndarray]]:
        """Rehydrate all non-`empty_*` embeddings.  With use_empty_prompt,
        each `empty_<key>` replaces `<key>` (caption dropout)."""
        meta_path = self.meta_dir / f"{main_hash}.json"
        if not meta_path.is_file():
            return None
        meta = json.loads(meta_path.read_text())["keys"]
        out = {}
        for key, h in meta.items():
            if key.startswith("empty_"):
                continue
            use_key = key
            if use_empty_prompt and f"empty_{key}" in meta:
                use_key, h = f"empty_{key}", meta[f"empty_{key}"]
            path = self.root / use_key / f"{h}.npz"
            if not path.is_file():
                return None  # cache invalidated
            arr = np.load(path)["data"]
            out[key] = arr.astype(dtype) if arr.dtype == np.float16 else arr
        return out
