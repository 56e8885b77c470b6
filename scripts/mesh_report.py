"""Mesh memory report: per-device memory + collective plan for candidate
meshes, from XLA's own buffer assignment (qflux_tpu/parallel/planner.py).

Answers the reference's "which FSDP/DDP layout fits my GPUs?" tables
(reference README.md:361-364,617-632) offline, before touching hardware:

    python scripts/mesh_report.py --model qwen --width full \
        --meshes fsdp4 fsdp2,tp2 dp2,fsdp4 --grid 32 --txt-len 512

Mesh spec syntax: comma-separated axis sizes, e.g. `dp2,fsdp2,tp2` or
`fsdp4`.  Self-contained: re-execs itself on an n-device virtual CPU
platform when the active backend is too small (same pattern as
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# must cover every transformer remat_policy a config value can map to
# (trainer.flux_kontext.remat_policy_from_config) — kept in sync by
# tests/trainer/test_plan_cli.py::test_plan_remat_vocab_in_sync
REMAT_CHOICES = ["none", "dots", "full", "flash", "flash_qkv", "flash_mlp",
                 "flash_single", "flash_offload"]


def parse_mesh(spec: str) -> dict[str, int]:
    axes = {}
    for part in spec.split(","):
        m = re.fullmatch(r"(dp|fsdp|tp|sp)(\d+)", part.strip())
        if not m:
            raise SystemExit(f"bad mesh spec {spec!r} (want e.g. dp2,fsdp2,tp2)")
        axes[m.group(1)] = int(m.group(2))
    return axes


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=["flux", "flux2", "qwen"], default="flux")
    ap.add_argument("--width", choices=["tiny", "bench", "full"], default="bench")
    ap.add_argument("--meshes", nargs="+", default=["fsdp2", "fsdp4"],
                    metavar="SPEC", help="e.g. dp2,fsdp2,tp2")
    ap.add_argument("--grid", type=int, default=32,
                    help="packed latent grid per image (32 = 512d input)")
    ap.add_argument("--grid-w", type=int, default=None,
                    help="grid width when non-square (e.g. 832x576 = 52 36)")
    ap.add_argument("--txt-len", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="global batch (default: one per data-parallel slice)")
    ap.add_argument("--quant", default=None,
                    choices=[None, "int8", "int8_dynamic", "int4",
                             "int4_dynamic", "int4_requant", "fp8_e4m3",
                             "fp8_e5m2"])
    ap.add_argument("--remat", default="flash", choices=REMAT_CHOICES)
    ap.add_argument("--lora-rank", type=int, default=16)
    ap.add_argument("--json", action="store_true", help="one JSON line per mesh")
    args = ap.parse_args(argv)

    n_needed = max(math.prod(parse_mesh(s).values()) for s in args.meshes)

    import jax

    try:
        backend = jax.default_backend()
        available = len(jax.devices())
    except RuntimeError:
        backend, available = "", 0
    # always plan on the virtual CPU platform: compiling the full model for
    # the real chip (through the tunnel) is minutes-slow and can OOM — the
    # planner's whole point is answering fit questions without the hardware
    if backend != "cpu" or available < n_needed:
        _reexec_on_cpu(n_needed)
        return

    from qflux_tpu.parallel.planner import plan

    rows = []
    for spec in args.meshes:
        grid = (args.grid, args.grid_w) if args.grid_w else args.grid
        r = plan(args.model, args.width, mesh_axes=parse_mesh(spec),
                 batch_size=args.batch_size, grid=grid,
                 txt_len=args.txt_len, quant_dtype=args.quant,
                 remat_policy=args.remat, lora_rank=args.lora_rank)
        rows.append(r)
        if args.json:
            print(json.dumps(r), flush=True)

    if not args.json:
        hdr = (f"{'mesh':<20} {'args MB':>9} {'temp MB':>9} {'resident MB':>12} "
               f"{'fits v5e':>8}  collectives (ar/ag/rs/cp)")
        print(f"\n{args.model} {args.width} {args.quant or 'bf16'} "
              f"remat={args.remat} grid={args.grid}x{args.grid_w or args.grid} "
              f"txt={args.txt_len}")
        print(hdr)
        print("-" * len(hdr))
        for r in rows:
            mesh_s = ",".join(f"{k}{v}" for k, v in r["mesh"].items() if v > 1) or "1chip"
            pd, c = r["per_device_mb"], r["collectives"]
            print(f"{mesh_s:<20} {pd['arguments']:>9} {pd['temp']:>9} "
                  f"{pd['resident_est']:>12} {str(r['fits_16gb_v5e']):>8}  "
                  f"{c['all-reduce']}/{c['all-gather']}/{c['reduce-scatter']}/"
                  f"{c['collective-permute']}")
        for r in rows:
            for a in r.get("advice", []):
                print(f"ADVICE: {a}")


def _reexec_on_cpu(n: int) -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (flags +
                        f" --xla_force_host_platform_device_count={n}").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys\n"
            f"sys.argv = {[sys.argv[0]] + sys.argv[1:]!r}\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "from scripts.mesh_report import main\n"
            "main()\n")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO)
    raise SystemExit(proc.returncode)


if __name__ == "__main__":
    main()
