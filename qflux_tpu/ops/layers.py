"""Functional parameter-pytree primitives: dense / MLP with in-place LoRA.

Models in qflux_tpu are pure functions over nested-dict parameter pytrees
(t5x-style) rather than module objects — the idiomatic shape for GSPMD
sharding, jit, and LoRA-as-a-separate-tree.

LoRA design: adapters live in their OWN pytree whose paths mirror the base
tree's dense nodes; `merge_lora` grafts each {"a","b"} pair under the matching
dense dict, and `dense()` applies `y += (x @ a) @ b * (alpha/r)`.  Gradients
are taken w.r.t. the lora tree only, so the frozen base stays sharded and
untouched (the reference achieves this with PEFT adapters + FSDP
ignored_modules, reference trainer/base_trainer.py:333-364, 929-1002).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# init

def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32) -> Params:
    """Torch-nn.Linear-compatible init: U(-1/sqrt(in), 1/sqrt(in))."""
    kk, bk = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    p = {"kernel": jax.random.uniform(kk, (in_dim, out_dim), dtype, -bound, bound)}
    if use_bias:
        p["bias"] = jax.random.uniform(bk, (out_dim,), dtype, -bound, bound)
    return p


def mlp_init(key, dim: int, hidden: int, out_dim: Optional[int] = None,
             dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in": dense_init(k1, dim, hidden, dtype=dtype),
        "out": dense_init(k2, hidden, out_dim or dim, dtype=dtype),
    }


def lora_init(key, in_dim: int, out_dim: int, rank: int, dtype=jnp.float32,
              init: str = "gaussian") -> Params:
    """a: [in, r] (gaussian or kaiming), b: [r, out] (zeros) — standard LoRA."""
    if init == "gaussian":
        a = jax.random.normal(key, (in_dim, rank), dtype) * (1.0 / rank)
    else:  # kaiming-uniform, PEFT default
        bound = (3.0 / in_dim) ** 0.5
        a = jax.random.uniform(key, (in_dim, rank), dtype, -bound, bound)
    return {"a": a, "b": jnp.zeros((rank, out_dim), dtype)}


# ---------------------------------------------------------------------------
# apply

def dense(p: Params, x: jax.Array, lora_scale: float | jax.Array = 1.0) -> jax.Array:
    """y = x@W + b [+ lora_scale * alpha/r * (x@a)@b]. Accumulate in f32 via
    preferred_element_type so the MXU keeps full precision on bf16 inputs.

    Quantized form: {kernel_q int8/fp8, kernel_scale} (ops/quant.py) is
    dequantized inline — XLA fuses the scale multiply into the matmul."""
    y = _base_matmul(p, x)
    # epilogue adds run in y's dtype: the unquantized path carries f32 out of
    # the MXU (preferred_element_type) so bias/LoRA still add in f32 there,
    # but the quantized paths already rescaled+cast to x.dtype — upcasting
    # them back to f32 made XLA materialize a full-width f32 copy of every
    # GEMM output to HBM (measured 2× write+read traffic per projection;
    # docs/PERF.md round-3 trace)
    if "lora" in p:
        la, lb = p["lora"]["a"], p["lora"]["b"]
        scaling = p["lora"].get("scaling", 1.0)
        # both LoRA dots emit x.dtype: the MXU accumulates f32 internally
        # regardless of preferred_element_type, and an f32 OUTPUT here makes
        # every LoRA cotangent f32 — measured as [S,D]-sized f32 layout
        # copies + mixed f32 grad GEMMs in the backward (docs/PERF.md r3)
        delta = jnp.dot(
            jnp.dot(x, la.astype(x.dtype), preferred_element_type=x.dtype),
            lb.astype(x.dtype),
            preferred_element_type=x.dtype,
        ) * jnp.asarray(scaling * lora_scale, x.dtype)
        y = y + delta.astype(y.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def _base_matmul(p: Params, x: jax.Array) -> jax.Array:
    """x @ W for whatever form the frozen kernel is stored in.

    Dynamic-activation int paths (W8A8/W4A8) only pay when the GEMM has
    real row count; for GEMV-shaped calls (the AdaLN modulation
    projections: [B,3072]·[3072,18432] at B≤2) XLA lowers an M=1 int8 dot
    as a VPU s32 multiply+reduce over the WHOLE weight (measured ~10 ms/
    step of pure overhead — docs/PERF.md round 3), so tiny-M calls route
    to the weight-only dequant GEMM instead (same frozen weights, bf16
    activations — a numerics upgrade, not a downgrade)."""
    tiny_m = int(np.prod(x.shape[:-1])) <= 32
    if "kernel_q4_rq" in p or "kernel_q4_dyn" in p:
        if tiny_m:
            from qflux_tpu.ops.quant import dequantize_kernel_int4

            q4 = p.get("kernel_q4_rq", p.get("kernel_q4_dyn"))
            kernel = dequantize_kernel_int4(q4, p["kernel_scale"], x.dtype)
            return jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "kernel_q4_rq" in p:
        # W4A8-requant: int4 → per-channel int8 grid on the fly, one int8×int8
        # MXU GEMM (fastest int4 form measured; docs/PERF.md)
        import os as _os

        from qflux_tpu.ops.quant import requant_int4_matmul

        if _os.environ.get("QFLUX_FUSED_RQ") == "1":
            # opt-in Pallas variant: the regrid happens in VMEM so q8 never
            # round-trips HBM (the measured requant tax — docs/PERF.md r5)
            from qflux_tpu.ops.int4_matmul import rq_supports
            from qflux_tpu.ops.quant import rq_fused_matmul

            q4 = p["kernel_q4_rq"]
            if q4.ndim == 2 and rq_supports(2 * q4.shape[0], q4.shape[1],
                                            p["kernel_scale"].shape[-2]):
                return rq_fused_matmul(x, q4, p["kernel_scale"])
        return requant_int4_matmul(x, p["kernel_q4_rq"], p["kernel_scale"])
    if "kernel_q4_dyn" in p:
        # W4A8-dynamic: per-group int8×int8 on the MXU (opt-in; docs/PERF.md)
        from qflux_tpu.ops.quant import dyn_int4_matmul

        return dyn_int4_matmul(x, p["kernel_q4_dyn"], p["kernel_scale"])
    if "kernel_q_dyn" in p:
        # W8A8-dynamic: int8×int8 on the MXU, per-row activation scales
        from qflux_tpu.ops.quant import dyn_int8_matmul, wo_matmul

        if tiny_m:
            return wo_matmul(x, p["kernel_q_dyn"],
                             p["kernel_scale"][..., 0, :])
        return dyn_int8_matmul(x, p["kernel_q_dyn"], p["kernel_scale"][..., 0, :])
    if "kernel_q4" in p:
        import os as _os

        from qflux_tpu.ops.int4_matmul import int4_matmul, supports
        from qflux_tpu.ops.quant import dequantize_kernel_int4

        q4 = p["kernel_q4"]
        if (_os.environ.get("QFLUX_FUSED_INT4") == "1" and q4.ndim == 2
                and supports(q4.shape[0] * 2, q4.shape[1],
                             n_groups=p["kernel_scale"].shape[-2])):
            # opt-in fused Pallas dequant-matmul (see ops/int4_matmul.py —
            # XLA's own fusion currently measures faster)
            return int4_matmul(x, q4, p["kernel_scale"])
        kernel = dequantize_kernel_int4(q4, p["kernel_scale"], x.dtype)
    elif "kernel_q" in p:
        q = p["kernel_q"]
        if q.ndim == 2:
            # custom-VJP weight-only GEMM: folds the per-output-channel scale
            # into the cotangent instead of letting AD build a transposed
            # dequant (the weight-only compile hog — see ops/quant.wo_matmul)
            from qflux_tpu.ops.quant import wo_matmul

            return wo_matmul(x, q, p["kernel_scale"][..., 0, :])
        kernel = (q.astype(jnp.float32) * p["kernel_scale"]).astype(x.dtype)
    else:
        kernel = p["kernel"].astype(x.dtype)
    return jnp.dot(x, kernel, preferred_element_type=jnp.float32)


def mlp_gelu(p: Params, x: jax.Array) -> jax.Array:
    """Linear → GELU(tanh) → Linear (diffusers FeedForward 'gelu-approximate')."""
    return dense(p["out"], jax.nn.gelu(dense(p["in"], x), approximate=True))


def named_checkpoint(h: jax.Array, name: str) -> jax.Array:
    """Named remat save point: tag `h` with `checkpoint_name` so a
    save_only_these_names(..., name) remat policy keeps this tensor and the
    backward recompute restarts HERE — the GEMM that produced `h` is never
    re-run (verified by HLO cost analysis: one GEMM per block disappears
    from the bwd scan body). Numerically exact; the cost is storing `h`
    (bf16 in the standard training path).

    Why not store at f8/int8: JAX types the cotangent of a low-precision
    primal at that same dtype, so a cast-based save rounds the GRADIENT to
    e4m3 (≈25% error + NaN from range mismatch — measured), and any
    straight-through formulation (stop_gradient / custom_vjp) keeps `h`
    live in the recompute graph and defeats the policy. Exact bf16 saving
    is the only formulation that both elides the GEMM and preserves
    gradients."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(h, name)


# ---------------------------------------------------------------------------
# LoRA tree plumbing

def merge_lora(base: Params, lora: Optional[Params]) -> Params:
    """Graft a lora tree into (a shallow copy of) the base tree.

    `lora` mirrors base's nesting; wherever it holds an {"a","b"} dict at a
    path whose base node is a dense param dict, that node gains a "lora" key.
    """
    if lora is None:
        return base

    def _in_dim(node):
        for key, kdim in (("kernel", -2), ("kernel_q", -2), ("kernel_q_dyn", -2)):
            if key in node and not isinstance(node[key], dict):
                return node[key].shape[kdim]
        return None

    def rec(b, l):
        if isinstance(l, dict) and "a" in l and "b" in l and not isinstance(b.get("a"), dict):
            out = dict(b)
            out["lora"] = l
            return out
        if isinstance(l, dict):
            out = dict(b)
            for k, v in l.items():
                if (k == "proj_out" and "proj_out_mlp" in b
                        and isinstance(v, dict) and "a" in v
                        and _in_dim(b[k]) is not None
                        and v["a"].shape[-2] != _in_dim(b[k])):
                    # legacy fused single-block proj_out adapter onto the
                    # split layout: x@A over the concat (o ‖ mlp) equals
                    # o@A[:d] + mlp@A[d:] — split A's rows, share B
                    d = _in_dim(b[k])
                    out[k] = rec(b[k], {**v, "a": v["a"][..., :d, :]})
                    out["proj_out_mlp"] = rec(
                        b["proj_out_mlp"], {**v, "a": v["a"][..., d:, :]})
                else:
                    out[k] = rec(b[k], v)
            return out
        return b

    return rec(base, lora)


def iter_dense_paths(params: Params, prefix: tuple[str, ...] = ()):
    """Yield (path_tuple, param_dict) for every dense node in a pytree
    (full-precision `kernel` or quantized `kernel_q` form)."""
    if isinstance(params, dict):
        if "kernel" in params and not isinstance(params["kernel"], dict):
            yield prefix, params
            return
        if any(k in params for k in ("kernel_q", "kernel_q4", "kernel_q_dyn",
                                     "kernel_q4_dyn", "kernel_q4_rq")):
            yield prefix, params
            return
        for k, v in params.items():
            yield from iter_dense_paths(v, prefix + (str(k),))


def build_lora_tree(key, params: Params, target_patterns: list[str], rank: int,
                    alpha: float, dtype=jnp.float32, init: str = "gaussian") -> Params:
    """Create a lora tree for every dense node whose '/'-path matches any
    regex in target_patterns (reference LoraConfig.target_modules semantics).

    Stacked (scan-over-layers) dense nodes have kernels [L, in, out]; their
    lora leaves get matching leading dims ([L, in, r] / [L, r, out]) so
    lax.scan slices base and lora together.  `scaling` likewise gets shape [L]
    (scan xs leaves must share the leading dim).
    """
    import re

    pats = [re.compile(p) for p in target_patterns]
    tree: Params = {}
    paths = [(p, node) for p, node in iter_dense_paths(params)
             if any(pat.search("/".join(p)) for pat in pats)]
    keys = jax.random.split(key, max(len(paths), 1))
    for (path, node), k in zip(paths, keys):
        q4_keys = ("kernel_q4", "kernel_q4_dyn", "kernel_q4_rq")
        if "kernel" in node:
            kernel = node["kernel"]
        elif any(k in node for k in q4_keys):
            kernel = next(node[k] for k in q4_keys if k in node)
        else:
            kernel = node.get("kernel_q", node.get("kernel_q_dyn"))
        *lead, in_dim, out_dim = kernel.shape
        if "kernel" not in node and any(k in node for k in q4_keys):
            in_dim *= 2  # two int4 rows packed per int8 byte
        lead = tuple(lead)
        if init == "gaussian":
            a = jax.random.normal(k, lead + (in_dim, rank), dtype) * (1.0 / rank)
        else:
            bound = (3.0 / in_dim) ** 0.5
            a = jax.random.uniform(k, lead + (in_dim, rank), dtype, -bound, bound)
        leaf = {
            "a": a,
            "b": jnp.zeros(lead + (rank, out_dim), dtype),
            "scaling": jnp.full(lead, alpha / rank, dtype),
        }
        sub = tree
        for part in path[:-1]:
            sub = sub.setdefault(part, {})
        sub[path[-1]] = leaf
    return tree


def _fuse_into_node(b: Params, delta: jax.Array) -> Params:
    """W += delta for whatever form the frozen kernel is stored in.

    Quantized nodes are dequantized to f32, the delta folded in, then
    re-quantized onto the SAME grid family (per-channel int8/fp8 or grouped
    int4 with the group size inferred from the stored scale shape), so a
    LoRA trained on a quantized base can still be served fused."""
    from qflux_tpu.ops import quant

    out = dict(b)
    if "kernel" in b:
        out["kernel"] = (b["kernel"].astype(jnp.float32) + delta).astype(b["kernel"].dtype)
        return out
    q4_key = next((k for k in ("kernel_q4", "kernel_q4_dyn", "kernel_q4_rq") if k in b), None)
    if q4_key is not None:
        w = quant.dequantize_kernel_int4(b[q4_key], b["kernel_scale"], jnp.float32)
        group = w.shape[-2] // b["kernel_scale"].shape[-2]
        q, scale = quant.quantize_kernel_int4(w + delta, group)
        out[q4_key], out["kernel_scale"] = q, scale
        return out
    q_key = next((k for k in ("kernel_q", "kernel_q_dyn") if k in b), None)
    if q_key is not None:
        w = b[q_key].astype(jnp.float32) * b["kernel_scale"]
        qdt = {jnp.int8.dtype: "int8",
               jnp.float8_e4m3fn.dtype: "fp8_e4m3",
               jnp.float8_e5m2.dtype: "fp8_e5m2"}[b[q_key].dtype]
        q, scale = quant.quantize_kernel(w + delta, qdt)
        out[q_key], out["kernel_scale"] = q, scale
        return out
    raise KeyError(f"no kernel variant found in node with keys {sorted(b)}")


def fuse_lora(base: Params, lora: Params, scale: float = 1.0) -> Params:
    """Permanently fold lora into the base kernels (W += scale·scaling·a@b).
    Used for DreamOmni2's fused edit-LoRA load (reference
    models/flux_kontext_loader.py:184-198). Works on full-precision AND
    quantized bases (the delta is folded through a dequant→requant cycle)."""

    def rec(b, l):
        if isinstance(l, dict) and "a" in l and "b" in l:
            scaling = jnp.asarray(l.get("scaling", 1.0), jnp.float32)
            delta = jnp.matmul(l["a"].astype(jnp.float32), l["b"].astype(jnp.float32))
            scaling = scaling.reshape(scaling.shape + (1,) * (delta.ndim - scaling.ndim))
            return _fuse_into_node(b, delta * (scale * scaling))
        if isinstance(l, dict):
            out = dict(b)
            for k, v in l.items():
                out[k] = rec(b[k], v)
            return out
        return b

    return rec(base, lora)
