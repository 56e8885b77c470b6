"""Content hashing for the embedding cache and dataset identity.

Mirrors the reference's hash vocabulary (reference utils/tools.py:59-97,
261-268): md5 for files/strings, sha256, perceptual hash for PIL images.
blake3 is not in this environment; sha256 serves as the fast strong hash.
The perceptual hash is a self-contained DCT implementation (the reference
uses the imagehash package).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np


def md5_file(path: str | Path, chunk_size: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()


def md5_string(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def sha256_file(path: str | Path, chunk_size: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()


def phash_image(image, hash_size: int = 8, highfreq_factor: int = 4) -> str:
    """Perceptual hash of a PIL image / HxW(xC) array: resize → DCT-II →
    median-threshold the top-left low-frequency block."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        arr = np.asarray(image)
        image = Image.fromarray(arr.astype(np.uint8))
    size = hash_size * highfreq_factor
    img = np.asarray(image.convert("L").resize((size, size), Image.LANCZOS), dtype=np.float64)

    def dct_1d(x):
        n = x.shape[-1]
        k = np.arange(n)
        basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        return x @ basis.T

    d = dct_1d(dct_1d(img).T).T
    low = d[:hash_size, :hash_size]
    bits = (low > np.median(low)).flatten()
    return "".join("%x" % int("".join("1" if b else "0" for b in bits[i:i + 4]), 2)
                   for i in range(0, len(bits), 4))


def combine_hashes(*hashes: str) -> str:
    return md5_string("|".join(hashes))
