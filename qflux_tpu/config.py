"""YAML → pydantic configuration tree.

TPU-native re-design of the reference's config layer (reference
src/qflux/data/config.py: pydantic Config at :744-830, loaded through OmegaConf
at :838-855).  Differences from the reference, by design:

  * device-placement maps (reference config.py:60-101) are replaced by a
    MeshSection — on TPU, placement is sharding over one mesh, not per-module
    `.to(device)` juggling;
  * resolution lists additionally define the *bucket registry* for static-shape
    compilation (reference treats them only as a resize policy);
  * `${a.b}` interpolation is implemented here directly (omegaconf is not a
    dependency).

Pixel-count expressions like "512*512" are accepted anywhere a pixel budget is
expected (reference config.py:141-149).
"""

from __future__ import annotations

import ast
import re
from enum import Enum
from pathlib import Path
from typing import Any, Literal, Optional, Union

import yaml
from pydantic import BaseModel, ConfigDict, Field, field_validator, model_validator


# ---------------------------------------------------------------------------
# helpers

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(tree: Any, dotted: str) -> Any:
    node = tree
    for part in dotted.split("."):
        if isinstance(node, dict):
            node = node[part]
        elif isinstance(node, list):
            node = node[int(part)]
        else:
            raise KeyError(dotted)
    return node


def resolve_interpolations(tree: Any) -> Any:
    """Resolve ${a.b.c} references against the document root (omegaconf-style)."""

    def resolve(node: Any, seen: tuple[str, ...] = ()) -> Any:
        if isinstance(node, dict):
            return {k: resolve(v, seen) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v, seen) for v in node]
        if isinstance(node, str):
            m = _INTERP.fullmatch(node)
            if m:  # whole-string reference: preserve referenced type
                key = m.group(1)
                if key in seen:
                    raise ValueError(f"circular interpolation: {' -> '.join(seen + (key,))}")
                return resolve(_lookup(tree, key), seen + (key,))

            def sub(mm):
                key = mm.group(1)
                if key in seen:
                    raise ValueError(f"circular interpolation: {' -> '.join(seen + (key,))}")
                return str(resolve(_lookup(tree, key), seen + (key,)))

            return _INTERP.sub(sub, node)
        return node

    return resolve(tree)


def parse_pixels(value: Union[int, str, None]) -> Optional[int]:
    """Parse pixel budgets: 262144 or "512*512" (safe arith only)."""
    if value is None or isinstance(value, int):
        return value
    node = ast.parse(str(value), mode="eval").body

    def ev(n):
        if isinstance(n, ast.Constant) and isinstance(n.value, (int, float)):
            return n.value
        if isinstance(n, ast.BinOp) and isinstance(n.op, (ast.Mult, ast.Add, ast.Sub, ast.FloorDiv, ast.Div, ast.Pow)):
            ops = {ast.Mult: lambda a, b: a * b, ast.Add: lambda a, b: a + b,
                   ast.Sub: lambda a, b: a - b, ast.FloorDiv: lambda a, b: a // b,
                   ast.Div: lambda a, b: a / b, ast.Pow: lambda a, b: a ** b}
            return ops[type(n.op)](ev(n.left), ev(n.right))
        raise ValueError(f"unsupported pixel expression: {value!r}")

    return int(ev(node))


class StrictModel(BaseModel):
    model_config = ConfigDict(extra="forbid")


# ---------------------------------------------------------------------------
# enums

class TrainerKind(str, Enum):
    """Maps 1:1 onto the reference's trainer registry (reference main.py:16-39)."""

    flux_kontext = "FluxKontextLoraTrainer"
    qwen_image_edit = "QwenImageEditTrainer"
    qwen_image_edit_plus = "QwenImageEditPlusTrainer"
    dreamomni2 = "DreamOmni2Trainer"
    flux2_klein = "Flux2KleinLoraTrainer"


class RunMode(str, Enum):
    fit = "fit"
    cache = "cache"
    predict = "predict"


# ---------------------------------------------------------------------------
# sections

class MeshSection(StrictModel):
    """Replaces the reference's accelerate_config.yaml + device maps."""

    dp: int = 1
    fsdp: int = -1
    tp: int = 1
    # sequence parallel (ring attention over the joint sequence)
    sp: int = 1
    dcn_axes: list[str] = Field(default_factory=list)
    # remat ≈ the reference's gradient checkpointing (base_trainer.py:324-325).
    # "flash" (default) = full recompute EXCEPT the flash-attention kernel
    # outputs (+11% step time vs "full" at ~1 GB extra; docs/PERF.md);
    # "minimal" = save matmul outputs (most memory, least recompute).
    # flash_mlp = flash + saved MLP pre-activations (skips the 4×-wide GEMM
    # recompute in backward; exact, costs the bf16 hidden per block)
    # flash_single = flash saves on FLUX's 38 single blocks only (full
    # recompute on the dual blocks): the long-sequence middle ground when
    # 'flash' residuals exceed HBM (Qwen has no dual/single split — there
    # it behaves exactly like flash)
    # flash_offload = flash, but the saved kernel outputs are parked in HOST
    # memory across fwd→bwd instead of HBM — the 16 GB-chip escape hatch for
    # long-sequence buckets where even flash_single fails memory assignment
    # (832×576 next to a 12 GB int8 base; trades PCIe bandwidth for HBM)
    remat: Literal["none", "minimal", "full", "flash", "flash_mlp",
                   "flash_single", "flash_offload"] = "flash"


class LoraSection(StrictModel):
    r: int = 16
    lora_alpha: int = 16
    init_lora_weights: Union[bool, str] = "gaussian"
    target_modules: list[str] = Field(
        default_factory=lambda: ["to_q", "to_k", "to_v", "to_out", "add_q", "add_k", "add_v", "add_out"]
    )
    pretrained_weight: Optional[str] = None


class QuantizeSection(StrictModel):
    enabled: bool = False
    # int8/fp8 weight-only + grouped int4 are the TPU-native analogues of the
    # reference's bnb int8/NF4 path (reference models/quantize.py:169-273);
    # int4 is what fits the 20B Qwen DiT on one 16 GB v5e
    dtype: Literal["int8", "int8_dynamic", "int4", "int4_dynamic",
                   "int4_requant", "fp8_e4m3", "fp8_e5m2"] = "int8"
    group_size: int = 128  # int4 scale granularity along the in-dim
    # also run the attention score GEMM int8 on the MXU (fused flash kernels
    # only — ops/flash_nr.py; same quantized numerics class as the weights)
    attention: bool = False
    skip_patterns: list[str] = Field(default_factory=lambda: [r".*norm.*", r".*embed.*"])


class ModelSection(StrictModel):
    pretrained_model_name_or_path: Optional[str] = None
    # component overrides for tests / partial loading
    dit_path: Optional[str] = None
    vae_path: Optional[str] = None
    text_encoder_path: Optional[str] = None
    text_encoder_2_path: Optional[str] = None
    tokenizer_path: Optional[str] = None
    lora: LoraSection = Field(default_factory=LoraSection)
    quantize: Union[bool, QuantizeSection] = False
    pretrained_embeddings: Optional[str] = None
    use_vlm_prompt_enhancer: bool = False
    # Qwen2.5-VL checkpoint dir for the prompt enhancer (reference
    # dreamomni2_trainer.py:95 vlm_path, default repo "xiabs/DreamOmni2")
    vlm_path: Optional[str] = None
    # size preset for tests: "full" loads real weights; "test" builds a tiny
    # random-init model with the same topology
    variant: str = "full"

    @field_validator("quantize")
    @classmethod
    def _coerce_quant(cls, v):
        if isinstance(v, bool):
            return QuantizeSection(enabled=v)
        return v


class ProcessorSection(StrictModel):
    """Resolution policy (reference data/preprocess.py:464-498)."""

    process_type: Literal[
        "resize", "center_crop", "center_padding", "right_padding", "fixed_pixels"
    ] = "resize"
    resize_mode: str = "bilinear"
    target_size: Optional[list[int]] = None      # [H, W]
    controls_size: Optional[list[Optional[list[int]]]] = None
    target_pixels: Optional[Union[int, str]] = None
    controls_pixels: Optional[list[Union[int, str, None]]] = None
    # multi-resolution candidates: list of [H, W] or {target: [...], controls: [[...], ...]}
    multi_resolutions: Optional[Union[list, dict]] = None
    max_aspect_ratio: float = 4.0
    divisible_by: int = 16

    @field_validator("target_pixels")
    @classmethod
    def _pix(cls, v):
        return parse_pixels(v)

    @field_validator("controls_pixels")
    @classmethod
    def _pixs(cls, v):
        if v is None:
            return v
        return [parse_pixels(x) for x in v]


class DataSection(StrictModel):
    class_path: str = "qflux_tpu.data.dataset.ImageDataset"
    init_args: dict[str, Any] = Field(default_factory=dict)
    processor: ProcessorSection = Field(default_factory=ProcessorSection)
    batch_size: int = 1
    shuffle: bool = True
    drop_last: bool = True
    num_workers: int = 0
    caption_dropout_rate: float = 0.0
    use_edit_mask: bool = False
    # True (default): group batches by resolution bucket — one compiled step
    # per static shape. False: allow mixed-shape batches via the padded +
    # segment-masked multi-resolution path.
    bucket_by_shape: bool = True


class CacheSection(StrictModel):
    use_cache: bool = False
    cache_dir: Optional[str] = None
    # VAE latents are deterministic (mode of the latent dist,
    # reference flux_kontext_trainer.py:885-889) so caching is exact.


class OptimizerSection(StrictModel):
    class_path: str = "optax.adamw"
    init_args: dict[str, Any] = Field(default_factory=lambda: {"b1": 0.9, "b2": 0.999, "weight_decay": 1e-2})
    learning_rate: float = 1e-4


class LRSchedulerSection(StrictModel):
    scheduler_type: Literal["constant", "cosine", "linear", "constant_with_warmup"] = "constant"
    warmup_steps: int = 0


class TrainSection(StrictModel):
    gradient_accumulation_steps: int = 1
    max_train_steps: int = 1000
    num_epochs: int = 10000
    checkpointing_steps: int = 500
    max_grad_norm: float = 1.0
    timestep_sampling: Literal["uniform", "logit_normal", "shift", "weighted"] = "uniform"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    # per-timestep loss weighting (reference custom_flowmatch_scheduler.py:39-82):
    # "weighted" uses the 1000-entry empirical table (or weighting_table if set)
    weighting_scheme: Literal["none", "bell", "half_bell", "weighted"] = "none"
    weighting_table: Optional[str] = None  # path to .npy/.json custom table
    seed: int = 1234
    weight_dtype: Literal["bfloat16", "float32"] = "bfloat16"
    low_memory: bool = False
    # overlap full-state (lora+optimizer) checkpoint serialization with
    # training via orbax async (utils/checkpoint.AsyncCheckpointer); the LoRA
    # safetensors interop export stays synchronous either way
    async_checkpointing: bool = False
    # move the frozen base params into XLA's preferred entry layouts once at
    # fit start (train_step.relayout_base_params) instead of paying the
    # weight-stack relayout copies every step (−2% step time measured at the
    # 512² headline; docs/PERF.md round 3). Single-process, single-device
    # runs only — a sharded mesh keeps default layouts.
    auto_entry_layouts: bool = True

    @model_validator(mode="after")
    def _weighted_sampling_implies_weighting(self):
        # the reference's timestep_type="weighted" = uniform/linear timesteps
        # + empirical-table LOSS weights (custom_flowmatch_scheduler.py:68-82);
        # make the knob mean that instead of silently degrading to uniform
        if self.timestep_sampling == "weighted" and self.weighting_scheme == "none":
            self.weighting_scheme = "weighted"
        return self


class ValidationSection(StrictModel):
    enabled: bool = False
    steps: int = 500
    num_inference_steps: int = 20
    true_cfg_scale: float = 1.0
    guidance: float = 2.5
    # [{prompt, images: [control image paths], height, width}]
    samples: list[dict[str, Any]] = Field(default_factory=list)
    # alternative sample source: a dataset spec {class_path, init_args}
    # (reference validation.py:80-118 _load_validation_samples)
    dataset: Optional[dict[str, Any]] = None
    max_samples: int = 4
    # fail-loud by default (reference raises on shape mismatch,
    # validation.py:154-204); set False to log-and-continue
    fail_on_error: bool = True

    @model_validator(mode="after")
    def _check_sample_keys(self):
        # the sample dicts are untyped (Any) so a typo like `control_image:`
        # would otherwise silently validate with NO control images and a
        # default-size blank target — fail loud instead
        allowed = {"prompt", "images", "height", "width"}
        for i, s in enumerate(self.samples):
            unknown = sorted(set(s) - allowed)
            if unknown:
                raise ValueError(
                    f"validation.samples[{i}]: unknown keys {unknown}; allowed "
                    f"keys are {sorted(allowed)} (images = list of control "
                    f"image paths)")
        return self


class LoggingSection(StrictModel):
    output_dir: str = "output"
    project: str = "qflux_tpu"
    report_to: Literal["tensorboard", "wandb", "swanlab", "none"] = "tensorboard"
    tracker_project_name: Optional[str] = None
    sampling_seed: int = 42
    # capture an XLA/TPU profiler trace of a few post-compile train steps
    # into this dir (viewable in TensorBoard/Perfetto; utils/profiling.trace)
    profile_dir: Optional[str] = None
    # push the final LoRA checkpoint to this HF Hub repo id after fit
    # (reference utils/huggingface.py:469 upload_lora_safetensors; network-
    # gated — failures log a warning, training output is unaffected)
    push_to_hub: Optional[str] = None


class PredictSection(StrictModel):
    num_inference_steps: int = 20
    guidance: float = 2.5
    true_cfg_scale: float = 1.0
    max_sequence_length: int = 512


class LossSection(StrictModel):
    class_path: str = "qflux_tpu.losses.MseLoss"
    init_args: dict[str, Any] = Field(default_factory=dict)


class Config(StrictModel):
    trainer: TrainerKind = TrainerKind.flux_kontext
    mode: RunMode = RunMode.fit
    resume: Optional[str] = None
    mesh: MeshSection = Field(default_factory=MeshSection)
    model: ModelSection = Field(default_factory=ModelSection)
    data: DataSection = Field(default_factory=DataSection)
    cache: CacheSection = Field(default_factory=CacheSection)
    train: TrainSection = Field(default_factory=TrainSection)
    optimizer: OptimizerSection = Field(default_factory=OptimizerSection)
    lr_scheduler: LRSchedulerSection = Field(default_factory=LRSchedulerSection)
    validation: ValidationSection = Field(default_factory=ValidationSection)
    logging: LoggingSection = Field(default_factory=LoggingSection)
    predict: PredictSection = Field(default_factory=PredictSection)
    loss: LossSection = Field(default_factory=LossSection)

    @model_validator(mode="after")
    def _low_memory_remat(self):
        # low_memory trades step time for headroom: plain full recompute
        # (no extra saved activations) — the reference declares the knob
        # without semantics (reference data/config.py:617); here it acts
        if self.train.low_memory and self.mesh.remat in (
                "flash", "flash_mlp", "flash_single"):
            self.mesh.remat = "full"
        return self

    @model_validator(mode="after")
    def _wire_cache_into_data(self):
        # mirror the reference's cross-default wiring (config.py:822-830)
        if self.cache.use_cache and self.cache.cache_dir:
            self.data.init_args.setdefault("cache_dir", self.cache.cache_dir)
            self.data.init_args.setdefault("use_cache", True)
        return self


def load_config_from_yaml(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    raw = resolve_interpolations(raw)
    return Config.model_validate(raw)
