"""CLI: python -m qflux_tpu.main --config cfg.yaml [--cache|--fit-no-cache]
[--resume DIR]

Mirrors the reference entrypoint (reference main.py:42-99, utils/options.py:
6-36) minus the `accelerate launch` process ceremony: one process per host,
jax.distributed handles multi-host, and the mesh handles multi-chip.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser("qflux_tpu")
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--cache", action="store_true", help="run the embedding-cache pass")
    p.add_argument("--fit-no-cache", action="store_true",
                   help="train without the embedding cache")
    p.add_argument("--predict", action="store_true",
                   help="run inference on --image/--prompt and write --output")
    p.add_argument("--image", action="append", default=None,
                   help="control image path(s) for --predict")
    p.add_argument("--prompt", default=None, help="edit instruction for --predict")
    p.add_argument("--output", default="prediction.png", help="output image path")
    p.add_argument("--steps", type=int, default=None, help="inference steps")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture an XLA profiler trace of steps 2-4 into DIR")
    p.add_argument("--plan", action="store_true",
                   help="preflight: per-device memory + collective report for "
                        "this config's mesh (no TPU needed), then exit")
    p.add_argument("--plan-devices", type=int, default=None, metavar="N",
                   help="device count assumed by --plan when mesh axes use -1")
    return p.parse_args(argv)


def _run_plan(config, args) -> None:
    """--plan: derive mesh_report.py flags from the config and run it (the
    report itself executes on a virtual CPU platform in a subprocess —
    qflux_tpu/parallel/planner.py)."""
    import subprocess

    trainer_name = str(config.trainer).lower()
    if "qwen" in trainer_name or "dreamomni" in trainer_name:
        model = "qwen"
    elif "flux2" in trainer_name:
        model = "flux2"   # klein-4B topology (trainer/flux2_klein.py)
    else:
        model = "flux"
    width = "tiny" if getattr(config.model, "variant", "") == "test" else "full"

    m = config.mesh
    sizes = {"dp": m.dp, "fsdp": m.fsdp, "tp": m.tp, "sp": m.sp}
    if -1 in sizes.values():
        n = args.plan_devices
        if n is None:
            raise SystemExit(
                "--plan: mesh uses -1 (absorb remaining devices); pass "
                "--plan-devices N for the target slice size")
        from qflux_tpu.parallel.mesh import MeshConfig

        sizes = MeshConfig(dp=m.dp, fsdp=m.fsdp, tp=m.tp, sp=m.sp).resolve(n)
    spec = ",".join(f"{k}{v}" for k, v in sizes.items() if v > 1) or "fsdp1"

    # packed 2×2 latent grid: H/16 × W/16 (e.g. 512² → 32×32, 832×576 → 52×36)
    grid_h = grid_w = 32
    ts = config.data.processor.target_size
    if ts:
        grid_h = max(2, int(ts[0] // 16))
        grid_w = max(2, int(ts[1] // 16)) if len(ts) > 1 else grid_h

    from qflux_tpu.trainer.flux_kontext import remat_policy_from_config

    # the fit loop shards the global batch over dp×fsdp, so plan with the
    # config batch rounded up to a multiple of the data axes
    n_data = sizes["dp"] * sizes["fsdp"]
    bs = max(config.data.batch_size, n_data)
    bs = ((bs + n_data - 1) // n_data) * n_data
    if bs != config.data.batch_size:
        print(f"--plan: batch {config.data.batch_size} -> {bs} "
              f"(must divide dp*fsdp={n_data})")

    # sequence-parallel advice straight from the geometry (the report repeats
    # it from the compiled plan; SURVEY §2.8 new-capability mandate)
    from qflux_tpu.parallel.planner import SP_ADVICE_SEQ

    joint = 512 + 2 * grid_h * grid_w
    if joint >= SP_ADVICE_SEQ and sizes.get("sp", 1) == 1:
        print(f"--plan: joint sequence ~{joint} tokens; consider mesh.sp >= 2 "
              "(ring attention) to split it across devices")

    # remat "none" must plan WITHOUT remat (activation residency is far
    # larger) — a flash-remat estimate would pass configs that OOM for real
    remat = ("none" if config.mesh.remat == "none"
             else remat_policy_from_config(config.mesh.remat))
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), os.pardir,
                                        "scripts", "mesh_report.py"),
           "--model", model, "--width", width, "--meshes", spec,
           "--grid", str(grid_h), "--grid-w", str(grid_w),
           "--batch-size", str(bs), "--remat", remat,
           "--lora-rank", str(config.model.lora.r)]
    q = config.model.quantize  # bool defaults bypass the coercing validator
    if getattr(q, "enabled", q):
        cmd += ["--quant", q.dtype]
    raise SystemExit(subprocess.run(cmd).returncode)


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(process)d %(filename)s:%(lineno)d %(levelname)s %(message)s")
    args = parse_args(argv)

    # before the backend initializes: raise XLA's scoped-VMEM limit so the
    # folded attention layout's VMEM output placement compiles (tpu_env.py)
    from qflux_tpu.runtime.tpu_env import configure_scoped_vmem
    configure_scoped_vmem()

    if args.distributed:
        import jax

        jax.distributed.initialize()

    # persistent XLA compilation cache: the full-model train step compiles in
    # ~1 min cold; subsequent runs load from disk in seconds
    import jax

    # honor an explicit CPU request: the axon TPU plugin registers at
    # discovery and IGNORES the env var afterwards (same dance as bench.py),
    # so without this a "CPU" run silently lands on the real chip
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get("QFLUX_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/qflux_tpu/xla"))
    if cache_dir and cache_dir != "0":
        try:
            # per-backend subdir: a CPU AOT result cached by a run on another
            # host machine type can SIGILL if replayed here (XLA warns), and
            # TPU/CPU entries must never mix
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(cache_dir, jax.default_backend()))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:
            logging.debug("compilation cache unavailable: %s", e)

    from qflux_tpu.config import RunMode, load_config_from_yaml
    from qflux_tpu.data.loader import DataLoader
    from qflux_tpu.data.preprocess import ImageProcessor
    from qflux_tpu.trainer.base import Trainer
    from qflux_tpu.utils.instantiate import instantiate_class

    config = load_config_from_yaml(args.config)
    if args.plan:
        _run_plan(config, args)
    if args.resume:
        config.resume = args.resume
    if args.cache:
        config.mode = RunMode.cache
        config.cache.use_cache = True
    if args.fit_no_cache:
        config.mode = RunMode.fit
        config.cache.use_cache = False
        config.data.init_args.pop("use_cache", None)
    if args.predict:
        config.mode = RunMode.predict
    if args.profile:
        config.logging.profile_dir = args.profile

    if config.mode == RunMode.predict:
        # inference: no dataset needed (reference predict path,
        # base_trainer.py:724-753)
        import numpy as np
        from PIL import Image

        if not args.image or args.prompt is None:
            raise SystemExit("--predict requires --image (repeatable) and --prompt")
        trainer = Trainer(config)
        controls = [np.asarray(Image.open(p).convert("RGB")) for p in args.image]
        imgs = trainer.predict(controls, args.prompt,
                               num_inference_steps=args.steps)
        # write EVERY output: first keeps the requested name, extras get
        # -1, -2, … suffixes (reference predict saves all samples)
        stem, ext = os.path.splitext(args.output)
        for i, im in enumerate(imgs):
            path = args.output if i == 0 else f"{stem}-{i}{ext}"
            Image.fromarray(im).save(path)
            logging.info("wrote %s", path)
        return

    processor = ImageProcessor(config.data.processor)
    init_args = dict(config.data.init_args)
    init_args.setdefault("processor", processor)
    init_args.setdefault("caption_dropout_rate", config.data.caption_dropout_rate)
    init_args.setdefault("use_edit_mask", config.data.use_edit_mask)
    dataset = instantiate_class(config.data.class_path, **init_args)

    trainer = Trainer(config)
    if config.mode == RunMode.cache:
        # cache pass: bs=1, no shuffle, keep every sample (reference
        # main.py:71-78). Conditioning dropout must NOT bake into the cache —
        # it is a per-epoch resample applied at cached-load time instead.
        dataset.caption_dropout_rate = 0.0
        dataset.prompt_image_dropout_rate = 0.0
        dl = DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False,
                        bucket_by_shape=False)
        trainer.cache(dl)
    else:
        dl = DataLoader(dataset, batch_size=config.data.batch_size,
                        shuffle=config.data.shuffle, drop_last=config.data.drop_last,
                        seed=config.train.seed,
                        bucket_by_shape=config.data.bucket_by_shape,
                        num_workers=config.data.num_workers)
        trainer.fit(dl)


if __name__ == "__main__":
    main(sys.argv[1:])
