"""Trainer orchestration: fit / cache / predict around the jitted step.

TPU re-design of the reference BaseTrainer (reference
trainer/base_trainer.py:60-1095).  What changed structurally:

  * the torch loop + Accelerate plumbing collapses into ONE jitted train step
    (trainer/train_step.py) driven by a plain Python loop;
  * device juggling (`.to(cpu)`, `del`, `empty_cache`) becomes sharding:
    frozen base params live sharded over the mesh from load time;
  * checkpoints: diffusers-format LoRA safetensors (interop with the
    reference's checkpoints, reference base_trainer.py:858-875) + optimizer
    state + state.json{step, epoch, git};
  * versioned run dirs output/<project>/vN with invalid-run GC (reference
    base_trainer.py:117-181);
  * SIGINT/SIGTERM → finish step, save `checkpoint-last-…`, exit (reference
    base_trainer.py:102-110, 512-516).
"""

from __future__ import annotations

import json
import logging
import re
import shutil
import signal
import subprocess
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from qflux_tpu.config import Config
from qflux_tpu.losses import AttentionMaskMseLoss
from qflux_tpu.ops.layers import build_lora_tree, merge_lora
from qflux_tpu.parallel import MeshConfig, build_mesh, shard_pytree
from qflux_tpu.parallel.partitioning import mmdit_rules
from qflux_tpu.runtime.tpu_env import configure_scoped_vmem
from qflux_tpu.scheduler.flow_match import FlowMatchScheduler
from qflux_tpu.trainer.sampling import SamplingConfig, make_sampler
from qflux_tpu.trainer.train_step import (
    SHARED_BATCH_KEY_PREFIXES,
    TrainState,
    TrainStepConfig,
    make_lr_schedule,
    make_train_step,
    relayout_base_params,
)
from qflux_tpu.utils.fps import FpsLogger
from qflux_tpu.utils.instantiate import resolve_symbol
from qflux_tpu.utils.logger import LoggerManager
from qflux_tpu.utils.lora_io import load_lora_safetensors, save_lora_safetensors
from qflux_tpu.utils.seed import seed_everything

ADAPTERS = {
    "FluxKontextLoraTrainer": "qflux_tpu.trainer.flux_kontext.FluxKontextAdapter",
    "QwenImageEditTrainer": "qflux_tpu.trainer.qwen_edit.QwenImageEditAdapter",
    "QwenImageEditPlusTrainer": "qflux_tpu.trainer.qwen_edit_plus.QwenImageEditPlusAdapter",
    "DreamOmni2Trainer": "qflux_tpu.trainer.dreamomni2.DreamOmni2Adapter",
    "Flux2KleinLoraTrainer": "qflux_tpu.trainer.flux2_klein.Flux2KleinAdapter",
}


def get_git_info() -> dict:
    """Commit/branch provenance saved into state.json (reference
    utils/tools.py:100-131)."""
    info = {}
    for key, cmd in [("commit", ["git", "rev-parse", "HEAD"]),
                     ("branch", ["git", "rev-parse", "--abbrev-ref", "HEAD"])]:
        try:
            info[key] = subprocess.run(cmd, capture_output=True, text=True,
                                       timeout=5).stdout.strip()
        except Exception:
            info[key] = None
    return info


class Trainer:
    def __init__(self, config: Config):
        # must precede the first backend touch (build_mesh): raises XLA's
        # scoped-VMEM limit for the folded attention layout (tpu_env.py);
        # no-op (and folded stays off) if the backend already initialized
        configure_scoped_vmem()
        self.config = config
        self.adapter_cls = resolve_symbol(ADAPTERS[config.trainer.value])
        self.mesh = build_mesh(MeshConfig(
            dp=config.mesh.dp, fsdp=config.mesh.fsdp, tp=config.mesh.tp,
            sp=config.mesh.sp, dcn_axes=tuple(config.mesh.dcn_axes)))
        self.scheduler = FlowMatchScheduler()
        self.fps = FpsLogger()
        self.global_step = 0
        self.epoch = 0
        self._interrupted = False
        self._params_relaid = False
        self.output_dir: Optional[Path] = None
        self.adapter = None
        self.bundle = None
        self.state: Optional[TrainState] = None
        self.logger: Optional[LoggerManager] = None

    # ------------------------------------------------------------------
    # setup

    def setup_versioned_dir(self) -> Path:
        """output/<project>/vN, garbage-collecting invalid old runs
        (reference base_trainer.py:117-181).

        Multi-host: only process 0 scans/GCs/allocates the version (avoiding
        the create/GC race the reference sidesteps with rank-0 gating,
        utils/logger.py:422-431); the chosen version number is broadcast so
        every process agrees on the SAME run dir path."""
        from qflux_tpu.parallel.collectives import broadcast_from_main, is_main_process

        root = Path(self.config.logging.output_dir) / self.config.logging.project
        v = 0
        if is_main_process():
            root.mkdir(parents=True, exist_ok=True)
            versions = []
            for d in root.iterdir():
                m = re.fullmatch(r"v(\d+)", d.name)
                if not (m and d.is_dir()):
                    continue
                state_file = d / "state.json"
                has_ckpt = any(d.rglob("*.safetensors"))
                step = 0
                if state_file.exists():
                    try:
                        step = json.loads(state_file.read_text()).get("global_step", 0)
                    except Exception:
                        step = 0
                if step < 5 and not has_ckpt:
                    shutil.rmtree(d, ignore_errors=True)  # GC invalid run
                else:
                    versions.append(int(m.group(1)))
            v = max(versions, default=-1) + 1
        v = int(broadcast_from_main(np.int32(v)))
        out = root / f"v{v}"
        if is_main_process():
            out.mkdir(parents=True, exist_ok=True)
        return out

    def _advise_sequence_parallel(self):
        """Warn when the configured resolution implies a joint sequence long
        enough for ring attention but mesh.sp is 1 (SURVEY §2.8; VERDICT
        round-2 #8: nothing connected long sequences to the sp axis)."""
        from qflux_tpu.parallel.planner import SP_ADVICE_SEQ

        ts = self.config.data.processor.target_size
        if not ts or self.adapter is None or self.mesh.shape.get("sp", 1) > 1:
            return
        h = int(ts[0])
        w = int(ts[1]) if len(ts) > 1 else h
        try:
            gh, gw = self.adapter.latent_grid(h, w)
        except Exception:
            return
        joint = (self.config.predict.max_sequence_length or 512) + 2 * gh * gw
        if joint >= SP_ADVICE_SEQ:
            logging.warning(
                "joint sequence ~%d tokens at %dx%d (target + control + "
                "text); set mesh.sp >= 2 to split it with ring attention — "
                "per-device attention residency scales 1/sp", joint, h, w)

    def _install_signal_handlers(self):
        def handler(signum, frame):
            logging.warning("signal %s received; saving last checkpoint after this step",
                            signum)
            self._interrupted = True

        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not on main thread (tests)

    def load_model(self):
        dtype = jnp.bfloat16 if self.config.train.weight_dtype == "bfloat16" else jnp.float32
        self.adapter, self.bundle = self.adapter_cls.load(self.config, dtype=dtype)
        if self.config.model.quantize and self.config.model.quantize.enabled:
            from qflux_tpu.ops.quant import quantize_tree

            self.bundle.dit_params = quantize_tree(
                self.bundle.dit_params, self.config.model.quantize)
        # shard frozen base over the mesh (the FSDP analogue)
        self.bundle.dit_params = shard_pytree(self.bundle.dit_params, mmdit_rules(),
                                              self.mesh)

    def build_lora(self):
        lcfg = self.config.model.lora
        if lcfg.pretrained_weight:
            tree = load_lora_safetensors(lcfg.pretrained_weight,
                                         self.adapter.lora_tree_path_fn,
                                         head_dim=self.bundle.dit_cfg.attention_head_dim)
            lora = jax.tree.map(jnp.asarray, tree)
        else:
            targets = lcfg.target_modules or list(self.adapter.default_lora_targets)
            targets = [t if "/" in t else rf"attn/{t}" for t in targets]
            init = "gaussian" if lcfg.init_lora_weights in (True, "gaussian") else "kaiming"
            lora = build_lora_tree(jax.random.PRNGKey(self.config.train.seed + 1),
                                   self.bundle.dit_params, targets,
                                   rank=lcfg.r, alpha=lcfg.lora_alpha, init=init)
        return jax.device_put(lora, NamedSharding(self.mesh, P()))

    def build_optimizer(self) -> optax.GradientTransformation:
        ocfg = self.config.optimizer
        lr = make_lr_schedule(ocfg.learning_rate, self.config.lr_scheduler.scheduler_type,
                              self.config.lr_scheduler.warmup_steps,
                              self.config.train.max_train_steps)
        opt_fn = resolve_symbol(ocfg.class_path)
        return opt_fn(learning_rate=lr, **ocfg.init_args)

    def build_criterion(self):
        cls = resolve_symbol(self.config.loss.class_path)
        return cls(**self.config.loss.init_args)

    def _build_step_config(self) -> TrainStepConfig:
        """YAML → TrainStepConfig, resolving the weighting scheme/table
        (reference custom_flowmatch_scheduler.py:39-82: "weighted" = uniform
        timesteps + the empirical loss-weight table)."""
        t = self.config.train
        sampling = t.timestep_sampling
        scheme, table = t.weighting_scheme, None
        if sampling == "weighted":
            sampling = "uniform"
            if scheme == "none":
                scheme = "weighted"
        if scheme == "weighted":
            from qflux_tpu.scheduler.weighting import (
                default_weighting_table, load_weighting_table)

            table = (load_weighting_table(t.weighting_table)
                     if t.weighting_table else default_weighting_table())
            scheme = "table"
        return TrainStepConfig(
            timestep_sampling=sampling,
            logit_mean=t.logit_mean, logit_std=t.logit_std,
            weighting_scheme=scheme, weighting_table=table,
            max_grad_norm=t.max_grad_norm,
            grad_accum_steps=t.gradient_accumulation_steps,
        )

    def _maybe_relayout_params(self, step_fn, emb, rng):
        """One-shot at fit start: move the frozen base into XLA's preferred
        entry layouts (train.auto_entry_layouts) and return the step re-jitted
        with those formats pinned, so neither the step nor later shape buckets
        pay the per-step weight-stack relayout copies (−2% step time measured;
        docs/PERF.md round 3). No-op unless single-process single-device TPU
        (set QFLUX_AUTO_LAYOUT=force to exercise the path on CPU in tests)."""
        import os

        if not self.config.train.auto_entry_layouts or self._params_relaid:
            return step_fn
        forced = os.environ.get("QFLUX_AUTO_LAYOUT") == "force"
        if not forced and (jax.default_backend() != "tpu"
                           or jax.process_count() > 1 or self.mesh.size > 1):
            return step_fn
        _, relaid = relayout_base_params(step_fn, self.state,
                                         self.bundle.dit_params, emb, rng,
                                         donate=True)
        self.bundle.dit_params = relaid
        self._params_relaid = True
        fmts = jax.tree.map(lambda x: x.format, relaid)
        logging.info("frozen base params relaid to XLA-preferred entry layouts")
        return jax.jit(step_fn, donate_argnums=(0,),
                       in_shardings=(None, fmts, None, None))

    def _degrade_remat_or_raise(self, err, criterion, optimizer, step_cfg):
        """Recover from a compile-stage failure by falling back to full
        recompute.  The default 'flash' remat policy saves per-block
        attention residuals that scale with sequence length; at long-sequence
        buckets (e.g. 832×576 on a 16 GB chip next to a 12 GB int8 base) the
        program can exceed HBM at memory-assignment time, which surfaces as an
        opaque compile error (docs/PERF.md round 4).  'full' (save-nothing)
        halves the saved-residual footprint and is always the most memory-lean
        policy, so degrade once, warn, and let the caller retry.  Anything
        that doesn't look like a compile/HBM failure — or a policy already at
        'full' — re-raises unchanged."""
        import dataclasses

        msg = str(err)
        compile_class = any(s in msg for s in (
            "RESOURCE_EXHAUSTED", "Ran out of memory", "ran out of memory",
            "remote_compile", "tpu_compile_helper", "Attempting to allocate"))
        policy = getattr(self.adapter, "remat_policy", "full")
        if (not compile_class or policy in ("full", "none")
                or not getattr(self.adapter, "remat", False)):
            raise err
        # The step jits with donate_argnums=(0,): a RUNTIME allocation failure
        # raised after dispatch began has already consumed the donated state
        # buffers, and retrying on deleted arrays would crash with "Array has
        # been deleted", masking the real error. Only compile-stage failures
        # (raised before execution, state untouched) are retryable — verify
        # liveness rather than trusting the error-string match.
        if any(getattr(leaf, "is_deleted", lambda: False)()
               for leaf in jax.tree.leaves(self.state)):
            logging.error(
                "train step failed with a memory error AFTER its donated "
                "state was consumed — cannot retry with a degraded remat "
                "policy; set mesh.remat: full in the config and rerun")
            raise err
        logging.warning(
            "train step failed to compile under remat policy %r: %s — "
            "retrying with mesh.remat: full (save-nothing recompute; slower "
            "but minimal-memory). Set mesh.remat: full in the config to skip "
            "this probe.", policy, msg[:300])
        self.adapter = dataclasses.replace(self.adapter, remat_policy="full")
        step_fn = make_train_step(self.adapter.predict_velocity, criterion,
                                  optimizer, step_cfg, mesh=self.mesh)
        if self._params_relaid:
            # keep the pinned entry layouts — plain jit would re-transpose
            # the relaid tree every call (3× step time; see
            # _maybe_relayout_params)
            fmts = jax.tree.map(lambda x: x.format, self.bundle.dit_params)
            step_fn = jax.jit(step_fn, donate_argnums=(0,),
                              in_shardings=(None, fmts, None, None))
        return step_fn

    def _sampler_formats(self, params):
        """Format pytree for make_sampler when the base tree was relaid —
        without the pin, the sampler's jit re-transposes the whole tree on
        every call (see make_sampler)."""
        if not self._params_relaid:
            return None
        return jax.tree.map(lambda x: x.format, params)

    # ------------------------------------------------------------------
    # fit

    def fit(self, dataloader):
        cfg = self.config
        seed_everything(cfg.train.seed)
        self._install_signal_handlers()
        from qflux_tpu.parallel.collectives import is_main_process

        main = is_main_process()
        self.output_dir = self.setup_versioned_dir()
        # rank-gated logging: non-main processes get a NullLogger backend
        # (reference utils/logger.py:422-431)
        self.logger = LoggerManager(
            report_to=cfg.logging.report_to, log_dir=self.output_dir / "logs",
            project=cfg.logging.tracker_project_name or cfg.logging.project,
            config=json.loads(cfg.model_dump_json()), is_main_process=main)
        if main:
            (self.output_dir / "train_config.yaml").write_text(
                __import__("yaml").safe_dump(json.loads(cfg.model_dump_json())))

        if self.adapter is None:
            self.load_model()
        self._advise_sequence_parallel()
        if cfg.resume:
            cfg.model.lora.pretrained_weight = str(cfg.resume)
        lora = self.build_lora()
        optimizer = self.build_optimizer()
        criterion = self._criterion = self.build_criterion()
        step_cfg = self._build_step_config()
        step_fn = make_train_step(self.adapter.predict_velocity, criterion, optimizer,
                                  step_cfg, mesh=self.mesh)
        self.state = TrainState.create(lora, optimizer)
        if cfg.resume:
            self._load_train_state(Path(cfg.resume), optimizer)

        from qflux_tpu.utils.model_summary import model_summary_rows

        rows = model_summary_rows(self.bundle.dit_params, self.state.lora)
        self.logger.log_table("model_summary", rows, 0)

        if cfg.train.async_checkpointing:
            from qflux_tpu.utils.checkpoint import AsyncCheckpointer

            self._async_ckpt = AsyncCheckpointer(self.output_dir / "orbax")

        rng = jax.random.PRNGKey(cfg.train.seed)
        ema_loss = None
        max_steps = cfg.train.max_train_steps
        self.fps.start()
        t_start = time.monotonic()
        done = False
        batch_sharding = NamedSharding(self.mesh, P(("dp", "fsdp")))
        profiling = False

        for epoch in range(self.epoch, cfg.train.num_epochs):
            self.epoch = epoch
            batch_iter = iter(dataloader)
            batch = next(batch_iter, None)
            emb = (self._device_batch(self._embeddings_for_batch(batch),
                                      batch_sharding)
                   if batch is not None else None)
            if emb is not None:
                step_fn = self._maybe_relayout_params(step_fn, emb, rng)
            while batch is not None:
                if cfg.logging.profile_dir:
                    # trace steps 2-4: past compile, short enough to view
                    if self.global_step == 1 and not profiling:
                        jax.profiler.start_trace(cfg.logging.profile_dir)
                        profiling = True
                    elif self.global_step == 4 and profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                        logging.info("profiler trace written to %s",
                                     cfg.logging.profile_dir)
                t_step = time.monotonic()
                try:
                    self.state, metrics = step_fn(
                        self.state, self.bundle.dit_params, emb, rng)
                except Exception as e:  # compile-class failures only; see helper
                    step_fn = self._degrade_remat_or_raise(
                        e, criterion, optimizer, step_cfg)
                    self.state, metrics = step_fn(
                        self.state, self.bundle.dit_params, emb, rng)
                self.global_step += 1
                # one-step batch prefetch: jit dispatch is async, so stage the
                # NEXT batch (cache IO / encode / device_put) while the step
                # runs on device, THEN block on the loss scalar
                next_batch = next(batch_iter, None)
                if self.global_step == 1:
                    # force BEFORE staging the next batch: compile_s is the
                    # jitted-step trace+compile, not encoder staging
                    # (reference has no compile-time observability; SURVEY §5)
                    loss = float(metrics["loss"])
                    self.logger.log_metrics(
                        {"compile_s": time.monotonic() - t_step}, 1)
                    emb = (self._device_batch(
                        self._embeddings_for_batch(next_batch), batch_sharding)
                        if next_batch is not None else None)
                else:
                    emb = (self._device_batch(
                        self._embeddings_for_batch(next_batch), batch_sharding)
                        if next_batch is not None else None)
                    loss = float(metrics["loss"])  # forces the step (tunnel-safe)
                ema_loss = loss if ema_loss is None else 0.95 * ema_loss + 0.05 * loss
                fps = self.fps.step(n_items=self._batch_items(batch))
                lr = self._lr_value(self.global_step)
                self.logger.log_metrics(
                    {"loss": loss, "smooth_loss": ema_loss, "epoch": epoch,
                     **({"lr": lr} if lr is not None else {}),
                     **({"fps": fps} if fps else {})}, self.global_step)

                if self.global_step % cfg.train.checkpointing_steps == 0:
                    self.fps.pause()
                    self.save_checkpoint()
                    self.fps.resume()
                if (cfg.validation.enabled and cfg.validation.steps > 0
                        and self.global_step % cfg.validation.steps == 0):
                    self.fps.pause()
                    self.run_validation()
                    self.fps.resume()
                if self._interrupted or self.global_step >= max_steps:
                    done = True
                    break
                batch = next_batch
            if done:
                break
        if profiling:
            jax.profiler.stop_trace()
        last_ckpt = self.save_checkpoint(last=True)
        if getattr(self, "_async_ckpt", None) is not None:
            self._async_ckpt.wait()  # land in-flight saves before returning
        if cfg.logging.push_to_hub:
            try:
                from qflux_tpu.utils.hub import upload_lora_safetensors

                upload_lora_safetensors(
                    last_ckpt / "pytorch_lora_weights.safetensors",
                    cfg.logging.push_to_hub)
                logging.info("pushed LoRA to hub repo %s", cfg.logging.push_to_hub)
            except Exception as e:  # network-gated: never fail training
                logging.warning("hub push failed: %s", e)
        logging.info("fit done: %d steps in %.1fs", self.global_step,
                     time.monotonic() - t_start)
        self.logger.close()
        return self.state

    def _lr_value(self, step: int):
        """Current learning rate for logging (reference base_trainer.py:543-549
        logs lr per step). The schedule is fully determined by config — build
        it once, not per step."""
        lr = getattr(self, "_lr_schedule", None)
        if lr is None:
            lr = self._lr_schedule = make_lr_schedule(
                self.config.optimizer.learning_rate,
                self.config.lr_scheduler.scheduler_type,
                self.config.lr_scheduler.warmup_steps,
                self.config.train.max_train_steps)
        try:
            return float(lr(step)) if callable(lr) else float(lr)
        except Exception:
            return None

    def _batch_items(self, batch) -> int:
        for v in batch.values():
            if hasattr(v, "shape") and np.ndim(v) >= 1:
                return int(np.shape(v)[0])
        return 1

    def _embeddings_for_batch(self, batch: dict) -> dict:
        """Cached batches pass through; pixel batches get encoded on the fly
        (the reference's cached-vs-compute dispatch, base_trainer.py:457-471)."""
        if "image_latents" in batch:
            emb = {k: v for k, v in batch.items()
                   if isinstance(v, np.ndarray) or hasattr(v, "device")}
            emb.pop("cached", None)
            valid = batch.get("valid_masks") or {}
            multires = any(k in valid for k in ("image_latents", "control_latents"))
            if multires:
                emb = self._build_multires_masks(emb, valid)
            else:
                for k in ("img_ids", "txt_ids"):
                    if k in emb and np.ndim(emb[k]) == 3:
                        emb[k] = np.asarray(emb[k])[0]  # shared ids, collated per-sample
            if hasattr(self.adapter, "prepare_cached_embeddings"):
                emb = self.adapter.prepare_cached_embeddings(emb)
            return emb
        emb = self.adapter.prepare_embeddings(self.bundle, batch,
                                              self.config.predict.max_sequence_length)
        flags = batch.get("drop_context")
        if flags is not None and np.any(flags):
            # prompt_image_dropout on the pixel path: zero the control
            # LATENTS so the null-conditioning representation matches the
            # cached path (which zeroes cached latents at load)
            mask = 1.0 - np.asarray(flags, np.float32).reshape(-1, 1, 1)
            for k in list(emb):
                if k.startswith("control") and np.ndim(emb[k]) == 3:
                    emb[k] = np.asarray(emb[k]) * mask
        return emb

    def _build_multires_masks(self, emb: dict, valid: dict) -> dict:
        """Mixed-resolution cached batch: collate right-padded the latents;
        derive the joint-attention segment ids + token loss mask (the
        reference's multi-res padding path, flux_kontext_trainer.py:579-796,
        re-expressed as segment ids for the flash kernel).

        Joint layout: [txt, target, control]; padding → segment 0."""
        b = np.shape(emb["image_latents"])[0]
        img_valid = np.asarray(valid.get(
            "image_latents", np.ones(np.shape(emb["image_latents"])[:2], bool)))
        parts = []
        if "prompt_embeds_mask" in emb:
            parts.append(np.asarray(emb["prompt_embeds_mask"]).astype(np.int32))
        else:
            parts.append(np.ones((b, np.shape(emb["prompt_embeds"])[1]), np.int32))
        parts.append(img_valid.astype(np.int32))
        if "control_latents" in emb and np.shape(emb["control_latents"])[1]:
            ctl_valid = np.asarray(valid.get(
                "control_latents", np.ones(np.shape(emb["control_latents"])[:2], bool)))
            parts.append(ctl_valid.astype(np.int32))
        emb["segment_ids"] = np.concatenate(parts, axis=1)
        emb["attention_mask"] = img_valid.astype(np.float32)  # token loss mask
        crit = getattr(self, "_criterion", None) or self.build_criterion()
        if not isinstance(crit, AttentionMaskMseLoss):
            logging.warning(
                "multi-resolution batch with a non-token-masked loss (%s); "
                "padded tokens will pollute the loss — set "
                "loss.class_path=qflux_tpu.losses.AttentionMaskMseLoss",
                self.config.loss.class_path)
        return emb

    def _device_batch(self, emb: dict, sharding) -> dict:
        out = {}
        dtype = jnp.bfloat16 if self.config.train.weight_dtype == "bfloat16" else jnp.float32
        n_data = self.mesh.shape["dp"] * self.mesh.shape["fsdp"]
        lat = emb.get("image_latents")
        if (lat is not None and n_data > 1 and np.shape(lat)[0] == 1
                and not getattr(self, "_warned_replicated_batch", False)):
            # batch 1 on a multi-device data mesh replicates every sample to
            # every device — numerically valid but 1/n_data the expected
            # throughput; the per-leaf divisibility error below only fires
            # for batch > 1, so surface this case once
            self._warned_replicated_batch = True
            logging.warning(
                "batch size 1 on a dp×fsdp=%d mesh trains fully REPLICATED "
                "(every device computes the same sample); raise "
                "data.batch_size to a multiple of %d for data parallelism",
                n_data, n_data)
        for k, v in emb.items():
            arr = jnp.asarray(v)
            if arr.dtype in (jnp.float32, jnp.float16, jnp.float64):
                arr = arr.astype(dtype) if k != "edit_mask" else arr.astype(jnp.float32)
            batch_leading = (arr.ndim >= 1 and arr.shape[0] > 1
                             and not k.startswith(SHARED_BATCH_KEY_PREFIXES))
            if batch_leading:
                if arr.shape[0] % n_data:
                    raise ValueError(
                        f"batch size {arr.shape[0]} (key {k!r}) must be divisible "
                        f"by dp×fsdp = {n_data} (mesh {dict(self.mesh.shape)}); "
                        "adjust data.batch_size or the mesh section")
                arr = jax.device_put(arr, sharding)
            out[k] = arr
        return out

    # ------------------------------------------------------------------
    # checkpointing / resume

    def save_checkpoint(self, last: bool = False):
        """Multi-host: file writes happen on process 0 only (LoRA + optimizer
        state are fully replicated, so process 0 holds complete values —
        reference rank-gates the same way, base_trainer.py:798-825); the
        orbax async save stays all-process (orbax coordinates multihost
        writes itself)."""
        from qflux_tpu.parallel.collectives import is_main_process

        main = is_main_process()
        name = f"checkpoint-last-{self.global_step}" if last else f"checkpoint-{self.global_step}"
        ckpt_dir = self.output_dir / name
        if main:
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            lora_host = jax.tree.map(np.asarray, self.state.lora)
            save_lora_safetensors(lora_host, ckpt_dir, self.adapter.lora_module_name_fn,
                                  head_dim=self.bundle.dit_cfg.attention_head_dim)
        if getattr(self, "_async_ckpt", None) is not None:
            # orbax async: device→host copy now, disk write off-thread; the
            # optimizer npz below is skipped (reference saves synchronously on
            # the train thread, base_trainer.py:827-875)
            self._async_ckpt.save(self.global_step,
                                  {"opt_state": self.state.opt_state,
                                   "lora": self.state.lora})
        elif main:
            np.savez(ckpt_dir / "optimizer_state.npz", **{
                "/".join(map(str, path)): np.asarray(leaf)
                for path, leaf in _flatten_with_paths(self.state.opt_state)})
        if main:
            (ckpt_dir / "state.json").write_text(json.dumps({
                "global_step": self.global_step, "epoch": self.epoch, "is_last": last,
                "git": get_git_info(),
            }))
            logging.info("saved checkpoint %s", ckpt_dir)
        return ckpt_dir

    def _load_train_state(self, ckpt: Path, optimizer):
        state_file = ckpt / "state.json"
        if state_file.exists():
            st = json.loads(state_file.read_text())
            self.global_step = st.get("global_step", 0)
            self.epoch = st.get("epoch", 0)
        orbax_dir = ckpt.parent / "orbax"
        if orbax_dir.exists():
            from qflux_tpu.utils.checkpoint import AsyncCheckpointer

            try:
                mngr = AsyncCheckpointer(orbax_dir)
                restored = mngr.restore(
                    self.global_step or None,
                    template={"opt_state": self.state.opt_state,
                              "lora": self.state.lora})
            except Exception as e:
                # e.g. the requested step was pruned by max_to_keep, or the
                # orbax dir belongs to another run — fall back to the npz path
                logging.warning("orbax restore failed (%s); trying "
                                "optimizer_state.npz", e)
                restored = None
            if restored is not None:
                self.state = self.state.replace(
                    lora=jax.tree.map(jnp.asarray, restored["lora"]),
                    opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
                    step=jnp.asarray(self.global_step, jnp.int32))
                return
        opt_file = ckpt / "optimizer_state.npz"
        if opt_file.exists():
            flat = dict(np.load(opt_file))
            template = self.state.opt_state
            leaves = _flatten_with_paths(template)
            new = []
            for path, leaf in leaves:
                key = "/".join(map(str, path))
                new.append(jnp.asarray(flat[key]) if key in flat else leaf)
            self.state = self.state.replace(
                opt_state=jax.tree.unflatten(jax.tree.structure(template), new),
                step=jnp.asarray(self.global_step, jnp.int32))

    # ------------------------------------------------------------------
    # cache

    def cache(self, dataloader):
        """Offline embedding precompute (reference base_trainer.py:418-447):
        encoders run jitted; fp16 arrays land in the content-addressed cache."""
        from qflux_tpu.data.cache import EmbeddingCacheManager

        if self.adapter is None:
            self.load_model()
        cache_dir = self.config.cache.cache_dir
        if not cache_dir:
            raise ValueError("cache mode requires cache.cache_dir")
        cm = EmbeddingCacheManager(cache_dir)
        n = 0
        for batch in dataloader:
            hashes = batch["file_hashes"][0] if isinstance(batch["file_hashes"], list) \
                else batch["file_hashes"]
            if cm.exists(hashes["main_hash"]):
                continue
            arrays, hash_keys = self.adapter.cache_embeddings(
                self.bundle, batch, self.config.predict.max_sequence_length)
            cm.save(hashes["main_hash"], arrays,
                    {k: hashes[v] if v in hashes else v for k, v in hash_keys.items()})
            n += 1
        logging.info("cached %d new samples into %s", n, cache_dir)
        return n

    # ------------------------------------------------------------------
    # predict / validation sampling

    def predict_from_embeddings(self, emb: dict, height: int, width: int,
                                num_inference_steps: Optional[int] = None,
                                lora: Optional[Any] = None,
                                seed: Optional[int] = None,
                                guidance: Optional[float] = None,
                                true_cfg_scale: Optional[float] = None) -> np.ndarray:
        """`guidance`/`true_cfg_scale` default to the predict section; the
        validation loop passes its own values (reference validation sampling
        uses its own params, trainer/validation.py:332-397)."""
        pcfg = self.config.predict
        steps = num_inference_steps or pcfg.num_inference_steps
        guidance = pcfg.guidance if guidance is None else guidance
        true_cfg_scale = (pcfg.true_cfg_scale if true_cfg_scale is None
                          else true_cfg_scale)
        gh, gw = self.adapter.latent_grid(height, width)
        s_img = gh * gw
        plan = self.scheduler.sampling_plan(steps, image_seq_len=s_img)
        params = self.bundle.dit_params
        use_lora = lora if lora is not None else (self.state.lora if self.state else None)
        if use_lora is not None:
            params = merge_lora(params, use_lora)
        sampler = make_sampler(self.adapter.predict_velocity, SamplingConfig(
            num_inference_steps=steps, true_cfg_scale=true_cfg_scale),
            param_formats=self._sampler_formats(params))
        b = int(np.shape(emb["prompt_embeds"])[0])
        key = jax.random.PRNGKey(self.config.logging.sampling_seed if seed is None else seed)
        dtype = jnp.bfloat16 if self.config.train.weight_dtype == "bfloat16" else jnp.float32
        lat0 = jax.random.normal(key, (b, s_img, self.bundle.dit_cfg.in_channels), dtype)
        emb = {k: (jnp.asarray(v).astype(dtype)
                   if jnp.asarray(v).dtype in (jnp.float32, jnp.float16) else jnp.asarray(v))
               for k, v in emb.items()}
        if "guidance" not in emb:
            emb["guidance"] = jnp.full((b,), guidance, dtype)
        latents = sampler(params, emb, lat0, jnp.asarray(plan.sigmas))
        return self.adapter.decode_latents(self.bundle, latents, height, width)

    def predict(self, images, prompt: str, height: Optional[int] = None,
                width: Optional[int] = None, **kw) -> np.ndarray:
        """Full predict path on raw images (reference base_trainer.py:724-753)."""
        if self.adapter is None:
            self.load_model()
        if self.state is None and self.config.model.lora.pretrained_weight:
            # standalone inference with a trained LoRA (reference setup_predict,
            # base_trainer.py:691-714)
            lora = self.build_lora()
            # inference needs no optimizer state — identity keeps TrainState's
            # shape without allocating adam moments or running plugin optimizers
            self.state = TrainState.create(lora, optax.identity())
        imgs = images if isinstance(images, list) else [images]
        imgs = [np.asarray(im) for im in imgs]
        proc = self.config.data.processor
        from qflux_tpu.data.preprocess import ImageProcessor

        processor = ImageProcessor(proc)
        controls = [processor.process_image(im, f"control_{i}")
                    for i, im in enumerate(imgs)]
        height = height or controls[0].shape[0]
        width = width or controls[0].shape[1]
        batch = {"image": np.zeros((1, height, width, 3), np.uint8),
                 "prompt": [prompt]}
        if controls:
            batch["control"] = controls[0][None]
            for i, c in enumerate(controls[1:], start=1):
                batch[f"control_{i}"] = c[None]
        emb = self.adapter.prepare_embeddings(self.bundle, batch,
                                              self.config.predict.max_sequence_length)
        emb.pop("image_latents", None)
        if (self.config.predict.true_cfg_scale > 1.0
                and hasattr(self.adapter, "negative_embeddings")):
            emb.update(self.adapter.negative_embeddings(
                self.bundle, kw.pop("negative_prompt", " "), batch,
                self.config.predict.max_sequence_length))
        return self.predict_from_embeddings(emb, height, width, **kw)

    def predict_multires(self, items: list, num_inference_steps=None,
                         seed=None) -> list:
        """Mixed-size batched inference: one padded sampler call, per-sample
        decode (the reference's multi-res sampling capability,
        flux_kontext_trainer.py:1644-1828)."""
        if self.adapter is None:
            self.load_model()
        if not hasattr(self.adapter, "prepare_multires_embeddings"):
            raise NotImplementedError(
                f"{type(self.adapter).__name__} has no multi-res predict path")
        from qflux_tpu.data.preprocess import ImageProcessor

        processor = ImageProcessor(self.config.data.processor)
        prepped = []
        for it in items:
            controls = [processor.process_image(np.asarray(im), f"control_{i}")
                        for i, im in enumerate(it.get("images", []))]
            h = it.get("height") or controls[0].shape[0]
            w = it.get("width") or controls[0].shape[1]
            entry = {"image": np.zeros((h, w, 3), np.uint8), "prompt": it["prompt"]}
            if controls:
                entry["control"] = controls[0]
                for i, cimg in enumerate(controls[1:], start=1):
                    entry[f"control_{i}"] = cimg
            prepped.append(entry)
        emb = self.adapter.prepare_multires_embeddings(
            self.bundle, prepped, self.config.predict.max_sequence_length)
        grids = emb.pop("sample_grids")
        emb.pop("attention_mask", None)
        lat_template = emb.pop("image_latents")
        pcfg = self.config.predict
        steps = num_inference_steps or pcfg.num_inference_steps
        s_max = lat_template.shape[1]
        plan = self.scheduler.sampling_plan(steps, image_seq_len=s_max)
        params = self.bundle.dit_params
        if self.state is not None:
            params = merge_lora(params, self.state.lora)
        sampler = make_sampler(self.adapter.predict_velocity, SamplingConfig(
            num_inference_steps=steps, true_cfg_scale=pcfg.true_cfg_scale),
            param_formats=self._sampler_formats(params))
        dtype = jnp.bfloat16 if self.config.train.weight_dtype == "bfloat16" else jnp.float32
        key = jax.random.PRNGKey(self.config.logging.sampling_seed if seed is None else seed)
        lat0 = jax.random.normal(key, lat_template.shape, dtype)
        emb_j = {k: (jnp.asarray(v).astype(dtype)
                     if jnp.asarray(v).dtype in (jnp.float32, jnp.float16)
                     and k not in ("segment_ids",) else jnp.asarray(v))
                 for k, v in emb.items() if not isinstance(v, list)}
        if "guidance" not in emb_j:
            emb_j["guidance"] = jnp.full((len(items),), pcfg.guidance, dtype)
        latents = sampler(params, emb_j, lat0, jnp.asarray(plan.sigmas))
        outs = []
        vae_scale2 = self.adapter.vae_scale * 2
        for i, (gh, gw) in enumerate(grids):
            lat_i = latents[i: i + 1, : gh * gw]
            outs.append(self.adapter.decode_latents(
                self.bundle, lat_i, gh * vae_scale2, gw * vae_scale2)[0])
        return outs

    # ------------------------------------------------------------------
    # validation

    def _load_validation_samples(self) -> list[dict]:
        """Config-list or dataset-sourced validation samples (reference
        validation.py:68-152 _load_validation_samples)."""
        vcfg = self.config.validation
        out = []
        if vcfg.samples:
            from qflux_tpu.data.dataset import _read_image

            for s in vcfg.samples:
                out.append({"prompt": s.get("prompt", ""),
                            "images": [_read_image(p) for p in s.get("images", [])],
                            "height": s.get("height"), "width": s.get("width")})
            return out
        if vcfg.dataset:
            from qflux_tpu.utils.instantiate import instantiate_class

            init_args = dict(vcfg.dataset.get("init_args", {}))
            init_args.pop("use_cache", None)
            init_args.pop("cache_dir", None)
            ds = instantiate_class(vcfg.dataset["class_path"], **init_args)
            for i in range(min(vcfg.max_samples, len(ds))):
                item = ds[i]
                from qflux_tpu.utils.tensors import numeric_suffix_key
                imgs = [np.asarray(item[k]) for k in ("control",)
                        if k in item] + [
                    np.asarray(item[k])
                    for k in sorted((k for k in item if k.startswith("control_")),
                                    key=numeric_suffix_key)]
                out.append({"prompt": item.get("prompt", ""), "images": imgs,
                            "height": np.shape(item["image"])[0],
                            "width": np.shape(item["image"])[1]})
        return out

    def setup_validation(self):
        """Precompute validation embeddings ONCE at fit start; each in-training
        validation step reuses them (reference validation.py:217-279
        prepare_validation_embeddings). Samples are round-robin sharded across
        processes (reference validation.py:281-294)."""
        from qflux_tpu.parallel.collectives import shard_validation_samples

        samples = self._load_validation_samples()
        my_idx = set(shard_validation_samples(len(samples)))
        self._validation_embeddings = []
        # every process sees ALL samples here (only embedding compute is
        # sharded), so keep the global prompt list for post-gather logging
        self._validation_prompts = [s["prompt"] for s in samples]
        self._validation_setup_done = True
        for i, s in enumerate(samples):
            if i not in my_idx:
                continue
            from qflux_tpu.data.preprocess import ImageProcessor

            proc = ImageProcessor(self.config.data.processor)
            processed = [proc.process_image(np.asarray(im), f"control_{j}")
                         for j, im in enumerate(s["images"])]
            # with neither images nor explicit size, follow the training
            # processor's target rather than inventing a resolution
            tgt = getattr(self.config.data.processor, "target_size", None)
            h = s.get("height") or (processed[0].shape[0] if processed
                                    else (tgt[0] if tgt else 512))
            w = s.get("width") or (processed[0].shape[1] if processed
                                   else (tgt[1] if tgt else 512))
            pixel_batch = {"image": np.zeros((1, h, w, 3), np.uint8),
                           "prompt": [s["prompt"]]}
            for j, im in enumerate(processed):
                key = "control" if j == 0 else f"control_{j}"
                pixel_batch[key] = im[None]
            emb = self.adapter.prepare_embeddings(
                self.bundle, pixel_batch, self.config.predict.max_sequence_length)
            emb.pop("image_latents", None)
            self._validation_embeddings.append(
                {"index": i, "prompt": s["prompt"], "emb": emb,
                 "height": h, "width": w})

    def run_validation(self):
        """In-training sampling from the precomputed embeddings (reference
        trainer/validation.py:332-478; the mesh IS the distribution, so there
        is no gather choreography). Fails loud unless
        validation.fail_on_error=false."""
        if not getattr(self, "_validation_setup_done", False):
            if self.config.validation.samples or self.config.validation.dataset:
                self.setup_validation()
            if not getattr(self, "_validation_embeddings", None):
                return
        results: list[tuple[int, np.ndarray]] = []
        for rec in self._validation_embeddings:
            try:
                vcfg = self.config.validation
                img = self.predict_from_embeddings(
                    dict(rec["emb"]), rec["height"], rec["width"],
                    num_inference_steps=vcfg.num_inference_steps,
                    guidance=vcfg.guidance,
                    true_cfg_scale=vcfg.true_cfg_scale)
                results.append((rec["index"], np.asarray(img)))
            except Exception as e:
                if self.config.validation.fail_on_error:
                    raise
                logging.warning("validation sample %d failed: %s", rec["index"], e)
        # multi-host: every process sampled its round-robin shard; gather the
        # decoded images so the single (rank-0) logger writes all of them —
        # the reference's accelerator.gather of latents+idx to rank 0
        # (validation.py:359-374). Single-process this is the identity.
        from qflux_tpu.parallel.collectives import gather_validation_images, process_count

        if process_count() > 1:
            try:
                idxs, imgs = gather_validation_images(
                    [i for i, _ in results], [im for _, im in results],
                    n_total=len(self._validation_prompts))
                results = list(zip(idxs, imgs))
            except Exception as e:
                if self.config.validation.fail_on_error:
                    raise
                logging.warning("validation image gather failed (%s); logging "
                                "only this process's shard", e)
        prompts = getattr(self, "_validation_prompts", None) or {}
        for idx, img in results:
            self.logger.log_images(f"validation/sample_{idx}",
                                   [im for im in img], self.global_step)
            if idx < len(prompts):
                self.logger.log_text(f"validation/prompt_{idx}",
                                     prompts[idx], self.global_step)


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        parts = []
        for k in path:
            parts.append(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k)))))
        out.append((parts, leaf))
    return out
