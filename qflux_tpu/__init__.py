"""qflux_tpu — TPU-native LoRA fine-tuning framework for image-editing diffusion models.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
tsiendragon/qwen-image-finetune (reference mounted at /root/reference):
LoRA fine-tuning of FLUX.1-Kontext / Qwen-Image-Edit(+Plus) / DreamOmni2 /
FLUX.2-Klein image-editing diffusion models, with

  * a single jit-compiled flow-matching train step shared by all model families
    (the reference's per-model trainer subclasses become *model adapters*),
  * GSPMD parameter/optimizer sharding over an ICI device mesh (the reference's
    Accelerate DDP/FSDP, re-thought as NamedSharding + shard_map),
  * Pallas flash-attention kernels with segment-id masking for the joint
    [txt, img] MMDiT stream (the reference's flash-attn/SDPA CUDA kernels),
  * a content-addressed embedding cache (offline jitted VAE + text encoding),
  * bucketed static-shape multi-resolution training (the reference's dynamic
    padding + masks, restructured for XLA's compile-once model).

Package layout:
  parallel/   mesh construction, partitioning rules, collective helpers
  ops/        Pallas kernels + pure-function compute ops (attention, RoPE, packing)
  models/     functional (pytree-params) model definitions + weight porting
  scheduler/  flow-match Euler scheduler, timestep sampling & weighting
  losses/     pure loss functions (MSE / edit-mask / attention-mask token loss)
  data/       dataset, resolution-policy preprocessing, embedding cache
  trainer/    train/cache/predict orchestration around the jitted step
  utils/      logging, hashing, safetensors IO, profiling
"""

__version__ = "0.1.0"
