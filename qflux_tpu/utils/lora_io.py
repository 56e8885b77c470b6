"""LoRA safetensors import/export — diffusers & PEFT format compatible.

The north-star interop requirement (BASELINE.md): LoRA checkpoints trained
here must load in the reference stack and vice versa.  Mirrors the
reference's format tooling (reference utils/lora_utils.py:12-22
classify_lora_weight; :205-257 OOM-safe export; trainer/base_trainer.py:
858-875 diffusers-format save via pipeline.save_lora_weights).

Formats:
  diffusers: transformer.<module>.lora_A.weight [r, in], .lora_B.weight [out, r]
  PEFT:      base_model.model.<module>.lora_A.weight …
Our tree:    <path>/{a [(L,)in,r], b [(L,)r,out], scaling [(L,)]}

`.alpha` keys are written alongside so loaders recover the alpha/rank scaling.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Mapping

import numpy as np

from qflux_tpu.ops.rope import half_to_interleaved_perm, interleaved_to_half_perm

# q/k projection outputs live in the rotate-half rope layout inside our param
# trees (ops/rope.py); diffusers/PEFT checkpoints use the interleaved layout,
# so LoRA B matrices for these modules are permuted on import/export.
QK_PROJ_NAMES = {"to_q", "to_k", "add_q", "add_k"}


def _expand_perm(out_dim: int, perm: np.ndarray) -> np.ndarray:
    head_dim = len(perm)
    return (np.arange(out_dim).reshape(-1, head_dim)[:, perm]).reshape(-1)

LORA_FILE_BASE_NAME = "pytorch_lora_weights.safetensors"  # reference trainer/constants.py:1


# ---------------------------------------------------------------------------
# FLUX module-path mapping (our tree path ↔ diffusers module name)

_FLUX_DUAL = {
    ("attn", "to_q"): "attn.to_q",
    ("attn", "to_k"): "attn.to_k",
    ("attn", "to_v"): "attn.to_v",
    ("attn", "to_out"): "attn.to_out.0",
    ("attn", "add_q"): "attn.add_q_proj",
    ("attn", "add_k"): "attn.add_k_proj",
    ("attn", "add_v"): "attn.add_v_proj",
    ("attn", "add_out"): "attn.to_add_out",
    ("img_mlp", "in"): "ff.net.0.proj",
    ("img_mlp", "out"): "ff.net.2",
    ("txt_mlp", "in"): "ff_context.net.0.proj",
    ("txt_mlp", "out"): "ff_context.net.2",
    ("img_mod", "proj"): "norm1.linear",
    ("txt_mod", "proj"): "norm1_context.linear",
}
_FLUX_SINGLE = {
    ("attn", "to_q"): "attn.to_q",
    ("attn", "to_k"): "attn.to_k",
    ("attn", "to_v"): "attn.to_v",
    ("proj_mlp",): "proj_mlp",
    ("proj_out",): "proj_out",
    ("mod", "proj"): "norm.linear",
}


def flux_module_name(path: tuple[str, ...], layer: int | None) -> str | None:
    if path[0] == "dual":
        sub = _FLUX_DUAL.get(tuple(path[1:]))
        return None if sub is None else f"transformer_blocks.{layer}.{sub}"
    if path[0] == "single":
        sub = _FLUX_SINGLE.get(tuple(path[1:]))
        return None if sub is None else f"single_transformer_blocks.{layer}.{sub}"
    return ".".join(path)  # top-level modules keep their names


def flux_tree_path(module: str) -> tuple[tuple[str, ...], int | None] | None:
    parts = module.split(".")
    if parts[0] == "transformer_blocks":
        layer = int(parts[1])
        rest = ".".join(parts[2:])
        for k, v in _FLUX_DUAL.items():
            if v == rest:
                return ("dual",) + k, layer
        return None
    if parts[0] == "single_transformer_blocks":
        layer = int(parts[1])
        rest = ".".join(parts[2:])
        for k, v in _FLUX_SINGLE.items():
            if v == rest:
                return ("single",) + k, layer
        return None
    return tuple(parts), None


# ---------------------------------------------------------------------------
# classification & helpers

def classify_lora_weight(sd: Mapping[str, np.ndarray]) -> str:
    """'peft' vs 'diffusers' key format (reference utils/lora_utils.py:12-22)."""
    for k in sd:
        if k.startswith("base_model.model."):
            return "peft"
        if k.startswith("transformer.") or k.startswith("unet."):
            return "diffusers"
    raise ValueError("unrecognized LoRA state-dict format")


def _iter_lora_nodes(tree: dict, prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        if "a" in tree and "b" in tree:
            yield prefix, tree
            return
        for k, v in tree.items():
            yield from _iter_lora_nodes(v, prefix + (k,))


# ---------------------------------------------------------------------------
# export

def export_lora(lora_tree: dict, module_name_fn: Callable = flux_module_name,
                prefix: str = "transformer", head_dim: int = 128) -> dict[str, np.ndarray]:
    """Our lora tree → diffusers-format flat dict (numpy, float32).

    q/k-projection B matrices are un-permuted back to the torch interleaved
    rope layout so exported checkpoints load in the reference stack."""
    flat: dict[str, np.ndarray] = {}
    for path, node in _iter_lora_nodes(lora_tree):
        a = np.asarray(node["a"], np.float32)
        b = np.asarray(node["b"], np.float32)
        scaling = np.asarray(node.get("scaling", 1.0), np.float32)
        is_qk = path[-1] in QK_PROJ_NAMES
        stacked = a.ndim == 3
        layers = range(a.shape[0]) if stacked else [None]
        for li in layers:
            mod = module_name_fn(path, li)
            if mod is None:
                raise ValueError(f"no module mapping for lora path {path}")
            ai = a[li] if stacked else a          # [in, r]
            bi = b[li] if stacked else b          # [r, out]
            if is_qk and bi.shape[1] % head_dim == 0:
                inv = _expand_perm(bi.shape[1], half_to_interleaved_perm(head_dim))
                bi = bi[:, inv]
            rank = ai.shape[1]
            sc = float(scaling[li] if scaling.ndim else scaling)
            flat[f"{prefix}.{mod}.lora_A.weight"] = np.ascontiguousarray(ai.T)  # [r, in]
            flat[f"{prefix}.{mod}.lora_B.weight"] = np.ascontiguousarray(bi.T)  # [out, r]
            flat[f"{prefix}.{mod}.alpha"] = np.asarray(sc * rank, np.float32)
    return flat


def save_lora_safetensors(lora_tree: dict, path: str | Path,
                          module_name_fn: Callable = flux_module_name,
                          prefix: str = "transformer", head_dim: int = 128) -> Path:
    from safetensors.numpy import save_file

    path = Path(path)
    if path.is_dir():
        path = path / LORA_FILE_BASE_NAME
    path.parent.mkdir(parents=True, exist_ok=True)
    save_file(export_lora(lora_tree, module_name_fn, prefix, head_dim), str(path),
              metadata={"format": "qflux_tpu.diffusers"})
    return path


# ---------------------------------------------------------------------------
# import

def import_lora(sd: Mapping[str, np.ndarray],
                tree_path_fn: Callable = flux_tree_path,
                dtype=np.float32, head_dim: int = 128) -> dict:
    """diffusers/PEFT flat dict → our lora tree (stacking per-layer entries)."""
    fmt = classify_lora_weight(sd)
    strip = "base_model.model." if fmt == "peft" else None

    # group by module
    modules: dict[str, dict] = {}
    for key, arr in sd.items():
        k = key
        if strip and k.startswith(strip):
            k = k[len(strip):]
        for pref in ("transformer.", "unet."):
            if k.startswith(pref):
                k = k[len(pref):]
                break
        if k.endswith(".lora_A.weight") or k.endswith(".lora_A.default.weight"):
            modules.setdefault(k.split(".lora_A")[0], {})["a"] = np.asarray(arr, dtype).T
        elif k.endswith(".lora_B.weight") or k.endswith(".lora_B.default.weight"):
            modules.setdefault(k.split(".lora_B")[0], {})["b"] = np.asarray(arr, dtype).T
        elif k.endswith(".alpha"):
            modules.setdefault(k[: -len(".alpha")], {})["alpha"] = float(np.asarray(arr))

    # organize: path → {layer: node}
    grouped: dict[tuple, dict] = {}
    for mod, node in modules.items():
        loc = tree_path_fn(mod)
        if loc is None:
            raise ValueError(f"cannot map LoRA module {mod!r} into the param tree")
        path, layer = loc
        rank = node["a"].shape[1]
        alpha = node.get("alpha", float(rank))
        node["scaling"] = np.asarray(alpha / rank, dtype)
        grouped.setdefault(path, {})[layer] = node

    tree: dict = {}
    for path, by_layer in grouped.items():
        if path[-1] in QK_PROJ_NAMES:
            for node in by_layer.values():
                if node["b"].shape[1] % head_dim == 0:
                    idx = _expand_perm(node["b"].shape[1],
                                       interleaved_to_half_perm(head_dim))
                    node["b"] = np.ascontiguousarray(node["b"][:, idx])
        if None in by_layer:
            node = by_layer[None]
            leaf = {"a": node["a"], "b": node["b"], "scaling": node["scaling"]}
        else:
            layers = sorted(by_layer)
            if layers != list(range(len(layers))):
                raise ValueError(f"non-contiguous LoRA layers for {path}: {layers}")
            leaf = {
                "a": np.stack([by_layer[i]["a"] for i in layers]),
                "b": np.stack([by_layer[i]["b"] for i in layers]),
                "scaling": np.stack([by_layer[i]["scaling"] for i in layers]),
            }
        sub = tree
        for part in path[:-1]:
            sub = sub.setdefault(part, {})
        sub[path[-1]] = leaf
    return tree


def load_lora_safetensors(path: str | Path,
                          tree_path_fn: Callable = flux_tree_path,
                          head_dim: int = 128) -> dict:
    from qflux_tpu.models.porting import load_safetensors

    path = Path(path)
    if path.is_dir():
        path = path / LORA_FILE_BASE_NAME
    return import_lora(load_safetensors(str(path)), tree_path_fn, head_dim=head_dim)
