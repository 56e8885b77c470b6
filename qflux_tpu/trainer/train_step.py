"""The single jit-compiled flow-matching train step, shared by every model
family.

TPU-native re-design of the reference's trainer hot loop (reference
trainer/base_trainer.py:508-561 `train_epoch`/`training_step` +
per-model `_compute_loss`, e.g. flux_kontext_trainer.py:513-577): instead of
five trainer subclasses each owning a torch loop, every model family supplies
a `predict_velocity` function and this module provides ONE jitted step:

    noise ~ N(0,1);  σ ~ sampler;  x_σ = (1-σ)x₀ + σ·ε
    v̂ = DiT(x_σ, cond)          target = ε − x₀
    loss = criterion(v̂, target, masks…);  grads w.r.t. LoRA tree only

Sharding: batch arrays shard over (dp, fsdp); frozen base params shard per
mmdit_rules; LoRA + optimizer state replicate.  XLA inserts the gradient
psum over the data axes automatically.  Gradient accumulation runs as a
lax.scan over a leading microbatch axis (the reference's
accelerator.accumulate, base_trainer.py:518).  LoRA params and optimizer
state are donated — zero-copy update in place.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from qflux_tpu.ops.layers import merge_lora
from qflux_tpu.scheduler.flow_match import FlowMatchScheduler, sample_training_sigmas
from qflux_tpu.scheduler.weighting import weights_for_sigmas

logger = logging.getLogger(__name__)


@struct.dataclass
class TrainState:
    lora: Any
    opt_state: Any
    step: jax.Array  # scalar int32

    @classmethod
    def create(cls, lora, optimizer):
        return cls(lora=lora, opt_state=optimizer.init(lora), step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    timestep_sampling: str = "uniform"   # uniform | logit_normal | shift
    logit_mean: float = 0.0
    logit_std: float = 1.0
    sigma_shift: float = 3.0
    weighting_scheme: str = "none"       # none | bell | half_bell | table
    # per-timestep loss weights for scheme="table" (e.g. the reference's
    # 1000-entry empirical table); excluded from eq/hash (ndarray)
    weighting_table: Any = dataclasses.field(default=None, compare=False)
    max_grad_norm: float = 1.0
    grad_accum_steps: int = 1


# Batch keys that are shared across samples (RoPE id tables, shape manifests)
# rather than carrying a leading batch axis — excluded from microbatch
# splitting and from (dp, fsdp) batch sharding. Kept in sync with
# Trainer._device_batch.
SHARED_BATCH_KEY_PREFIXES = ("img_ids", "txt_ids", "rope_", "img_shapes")

# predict_velocity(merged_params, batch, noisy_latents, sigma) -> [B, S_img, C]
PredictFn = Callable[[Any, dict, jax.Array, jax.Array], jax.Array]
# criterion(pred, target, weighting=…, edit_mask=…, attention_mask=…) -> scalar
LossFn = Callable[..., jax.Array]


def _loss_for_microbatch(base_params, lora, batch, rng, predict_velocity,
                         criterion, cfg: TrainStepConfig):
    latents = batch["image_latents"]
    b = latents.shape[0]
    k_noise, k_sigma = jax.random.split(rng)
    noise = jax.random.normal(k_noise, latents.shape, dtype=jnp.float32).astype(latents.dtype)
    sigma = sample_training_sigmas(
        k_sigma, b, scheme=cfg.timestep_sampling,
        logit_mean=cfg.logit_mean, logit_std=cfg.logit_std, shift=cfg.sigma_shift,
    ).astype(latents.dtype)

    noisy = FlowMatchScheduler.add_noise(latents, noise, sigma)
    target = FlowMatchScheduler.training_target(latents, noise)

    merged = merge_lora(base_params, lora)
    pred = predict_velocity(merged, batch, noisy, sigma)

    weighting = None
    if cfg.weighting_scheme != "none":
        weighting = weights_for_sigmas(
            sigma, cfg.weighting_scheme, table=cfg.weighting_table)[:, None, None]
    return criterion(
        pred, target,
        weighting=weighting,
        edit_mask=batch.get("edit_mask"),
        attention_mask=batch.get("attention_mask"),
    )


def make_train_step(
    predict_velocity: PredictFn,
    criterion: LossFn,
    optimizer: optax.GradientTransformation,
    cfg: TrainStepConfig = TrainStepConfig(),
    mesh=None,
):
    """Returns jitted `step(state, base_params, batch, rng) -> (state, metrics)`.

    With cfg.grad_accum_steps > 1 the step takes the SAME flat [B, …] batches
    as accum=1 and reshapes them to [accum, B//accum, …] under jit, scanning
    microbatches and averaging gradients (the reference's
    accelerator.accumulate, base_trainer.py:518). Shared leaves (RoPE id
    tables etc., see SHARED_BATCH_KEY_PREFIXES) are closed over, not scanned.

    When `mesh` is given, the updated LoRA/optimizer state is constrained to
    stay fully replicated — the design point of LoRA-FSDP (adapters are tiny;
    replicating them avoids per-step all-gathers, mirroring the reference's
    FSDP ignored_modules, reference base_trainer.py:343-348). Without it GSPMD
    may decide to shard the adapter state.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    def _replicate(tree):
        if mesh is None:
            return tree
        return jax.lax.with_sharding_constraint(
            tree, NamedSharding(mesh, PartitionSpec()))

    def grads_fn(state: TrainState, base_params, batch, rng):
        def loss_fn(lora, b, r):
            return _loss_for_microbatch(base_params, lora, b, r, predict_velocity,
                                        criterion, cfg)

        if cfg.grad_accum_steps == 1:
            return jax.value_and_grad(loss_fn)(state.lora, batch, rng)

        n = cfg.grad_accum_steps
        b_total = batch["image_latents"].shape[0]
        if b_total % n:
            raise ValueError(
                f"batch size {b_total} not divisible by grad_accum_steps={n}")
        micro_b = b_total // n
        scanned = {
            k: v for k, v in batch.items()
            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b_total
            and not k.startswith(SHARED_BATCH_KEY_PREFIXES)
        }
        shared = {k: v for k, v in batch.items() if k not in scanned}
        scanned = {k: v.reshape((n, micro_b) + v.shape[1:])
                   for k, v in scanned.items()}

        def micro(carry, inp):
            loss_acc, grad_acc = carry
            mb, r = inp
            l, g = jax.value_and_grad(loss_fn)(state.lora, {**shared, **mb}, r)
            return (loss_acc + l, jax.tree.map(jnp.add, grad_acc, g)), None

        zeros = jax.tree.map(jnp.zeros_like, state.lora)
        rngs = jax.random.split(rng, n)
        (loss_sum, grad_sum), _ = jax.lax.scan(micro, (0.0, zeros), (scanned, rngs))
        return loss_sum / n, jax.tree.map(lambda g: g / n, grad_sum)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, base_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = grads_fn(state, base_params, batch, rng)
        gnorm = optax.global_norm(grads)
        if cfg.max_grad_norm > 0:
            # clip-by-global-norm (reference base_trainer.py:449-455)
            scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        # "scaling" leaves (alpha/r) are constants, not trainable params —
        # zero their updates so AdamW weight decay can't drift them
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: jnp.zeros_like(u)
            if any(getattr(k, "key", None) == "scaling" for k in path) else u,
            updates)
        lora = optax.apply_updates(state.lora, updates)
        new_state = TrainState(lora=_replicate(lora), opt_state=_replicate(opt_state),
                               step=state.step + 1)
        return new_state, {"loss": loss.astype(jnp.float32), "grad_norm": gnorm}

    return step


def _chunk_by_bytes(moves, chunk_bytes):
    """Greedy split of `(i, array, fmt)` triples into groups whose summed
    bytes stay ≤ chunk_bytes (a single oversize leaf gets its own group)."""
    groups, cur, cur_bytes = [], [], 0
    for i, x, f in moves:
        nb = x.size * x.dtype.itemsize
        if cur and cur_bytes + nb > chunk_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append((i, x, f))
        cur_bytes += nb
    if cur:
        groups.append(cur)
    return groups


def relayout_base_params(step, state, base_params, batch, rng, donate=False):
    """Compile `step` with XLA-chosen (AUTO) entry layouts for the frozen
    base params and move the tree into those layouts once.

    jit entry parameters default to row-major; the profiler trace shows XLA
    re-transposing the step-invariant int8 qkv weight stacks to its preferred
    GEMM layouts EVERY step (~4 ms at the 512² headline, docs/PERF.md round
    3). AUTO layouts push the choice out to the entry signature; a one-time
    device_put then makes every subsequent step relayout-free.

    donate=True frees each source leaf as soon as its relaid copy is issued —
    required when the tree fills most of HBM (the 12 GB int8 full-model tree
    cannot coexist with its relaid copy on a 16 GB chip). The caller's tree is
    consumed.

    Returns (compiled_step, relaid_params): `compiled_step` has the same call
    signature as `step` but is a shape-specialized executable (donating the
    state like the original), and `relaid_params` is the params tree committed
    in the executable's preferred layouts.
    """
    from jax.experimental.layout import Format, Layout

    # Size-gate AUTO: only leaves big enough for a layout to matter get an
    # XLA-chosen entry layout; small leaves pin to the format they already
    # have. The per-step relayout copies AUTO eliminates are the multi-MB
    # int8 weight stacks — tiny tensors gain nothing, and they are exactly
    # the ones the tunnel backend's device_put mis-lays: a [24, 64] f32
    # kernel_scale (6 KB) came back in the wrong tiled layout on every
    # attempt (round-4 AND round-5 driver logs, leaf 53), nulling the 20B
    # Qwen headline twice. Pinning small leaves removes the straggler class
    # at the root instead of recovering after the fact.
    auto_min = int(os.environ.get("QFLUX_AUTO_LAYOUT_MIN_BYTES", 1 << 20))

    def _pick(x):
        big = x.size * x.dtype.itemsize >= auto_min
        return Format(Layout.AUTO) if big else getattr(
            x, "format", Format(Layout.AUTO))

    fmt = jax.tree.map(_pick, base_params)
    jitted = jax.jit(step, donate_argnums=(0,),
                     in_shardings=(None, fmt, None, None))
    # AUTO-layout lowering rejects committed concrete arrays ("arg layout is
    # concrete") — lower from abstract ShapeDtypeStructs instead
    sds = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                       (state, base_params, batch, rng))
    compiled = jitted.lower(*sds).compile()
    param_formats = compiled.input_formats[0][1]
    leaves, treedef = jax.tree.flatten(base_params)
    fmt_leaves = jax.tree.leaves(param_formats)

    # Move ONLY the leaves whose concrete layout differs, in byte-bounded
    # batched jax.device_put calls. A per-leaf device_put(x, format) pays a
    # full tunnel round trip PER LEAF — measured 160 s for the 98-leaf
    # weight-only tree (~1.6 s/leaf; the whole AUTO step compile is 10.5 s);
    # a jitted identity program per group was WORSE (each group compiles a
    # fresh transpose program remotely, ~317 s total). Chunking bounds the
    # relayout's transient memory (a donated input can't alias a
    # changed-layout output, so each chunk briefly exists twice) — required
    # when the tree fills most of HBM.
    out = [None] * len(leaves)
    moves = []
    for i, (x, f) in enumerate(zip(leaves, fmt_leaves)):
        if getattr(x, "format", None) == f:
            out[i] = x  # already in the executable's layout — no copy
        else:
            moves.append((i, x, f))

    chunk_bytes = int(1.5 * 2**30) if donate else 1 << 62
    for group in _chunk_by_bytes(moves, chunk_bytes):
        ys = jax.device_put([x for _, x, _ in group],
                            [f for _, _, f in group], donate=donate)
        for (i, _, _), y in zip(group, ys):
            out[i] = y
    out, bad = _fix_straggler_layouts(out, fmt_leaves)
    relaid = jax.tree.unflatten(treedef, out)
    if bad:
        # One or more leaves will not take their AUTO layout on this backend
        # even after a host rebuild of the buffer. The AOT executable would
        # reject the tree at dispatch (or worse, die in the backend with an
        # opaque InvalidArgument — round-5 driver log), so abandon it: re-jit
        # pinned to the formats the arrays actually have. Costs one extra
        # compile; every leaf that DID relayout keeps its XLA-preferred
        # layout, so the per-step copy saving is mostly retained.
        logger.warning(
            "relayout: %d leaves would not take their AUTO entry layouts; "
            "re-jitting with formats pinned to the arrays themselves", len(bad))
        return jit_with_pinned_formats(step, relaid), relaid
    return compiled, relaid


def _fix_straggler_layouts(out, fmt_leaves, device_put=None):
    """Post-verify (metadata only, no transfers): a layout disagreement after
    the batched relayout would crash the first step call with an opaque XLA
    error. Observed on the tunnel backend — re-put the stragglers
    individually (never donated: the source may be the caller's only copy);
    a leaf that STILL disagrees after the re-put is rebuilt through the host
    (`device_put(x, None)` contract: host round trip into the default
    layout — guaranteed realizable) and its index reported back so the
    caller re-jits with pinned formats instead of using the AOT executable.

    Mutates `out` in place; returns (out, persistent_straggler_indices).

    Regression guards: the re-put branch FIRED on the round-4 driver bench
    and a then-undefined `logger` turned recovery into a NameError that
    nulled the 20B Qwen headline (BENCH_r04.json); on round 5 a 6 KB
    kernel_scale leaf NEVER took its layout and the re-put loop alone could
    not save the run. Covered by tests/trainer/test_auto_layout.py::
    test_straggler_relayout_recovers / test_persistent_straggler_degrades.
    """
    put = device_put if device_put is not None else _put_or_host_rebuild
    bad = []
    for i, f in enumerate(fmt_leaves):
        if getattr(out[i], "format", None) != f:
            logger.warning("relayout: leaf %d came back in the wrong layout; "
                           "re-issuing device_put", i)
            out[i] = put(out[i], f)
            if getattr(out[i], "format", None) != f:
                logger.warning(
                    "relayout: leaf %d will not take its AUTO layout on this "
                    "backend; rebuilding through the host in the default "
                    "layout", i)
                out[i] = put(out[i], None)
                bad.append(i)
    return out, bad


def _put_or_host_rebuild(x, f):
    """device_put with the straggler contract: f=None means 'pull the buffer
    to the host and re-upload fresh' — the only path guaranteed to land in a
    layout the backend can actually execute with (the device-to-device put
    of a small tiled layout is what keeps failing on the tunnel)."""
    if f is None:
        import numpy as np

        return jax.device_put(np.asarray(x))
    return jax.device_put(x, f)


def jit_with_pinned_formats(step, relaid_params):
    """Re-jit `step` with the frozen-params entry layouts pinned to EXACTLY
    the formats the relaid arrays self-report.

    Dispatch-consistent by construction: jit's argument-layout check compares
    each array's recorded format against the executable's expected one, and
    here the expectation IS read from the arrays. This is the trainer's
    default mode (`BaseTrainer._maybe_relayout_params`) and the recovery mode
    for the tunnel-backend failure where the AOT AUTO-layout executable
    rejects the relaid tree at dispatch ("Computation was compiled for input
    layouts that disagree…") even after the straggler post-verify — observed
    on the 20B Qwen bench under a concurrent tunnel client (round-5 log;
    the post-verify compares the same metadata dispatch does, so a leaf it
    cannot see wrong it cannot fix). Costs one extra compile; steps then run
    relayout-free exactly like the AOT path.
    """
    fmts = jax.tree.map(lambda x: x.format, relaid_params)
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(None, fmts, None, None))


def make_lr_schedule(base_lr: float, scheduler_type: str = "constant",
                     warmup_steps: int = 0, total_steps: int = 10000):
    """diffusers get_scheduler equivalents (reference base_trainer.py:884-916)."""
    if scheduler_type == "constant" and warmup_steps == 0:
        return base_lr
    if scheduler_type in ("constant", "constant_with_warmup"):
        return optax.schedules.warmup_constant_schedule(0.0, base_lr, warmup_steps)
    if scheduler_type == "cosine":
        return optax.schedules.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_steps, max(total_steps, warmup_steps + 1))
    if scheduler_type == "linear":
        return optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.schedules.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1))],
            [warmup_steps])
    raise ValueError(f"unknown lr scheduler {scheduler_type!r}")
