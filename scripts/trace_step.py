"""Capture an XLA device trace of the headline train step and summarize it.

Usage:
  python scripts/trace_step.py [dir=/tmp/qflux_trace] [quant=w8a8|int8] \
      [iters=3] [parse_only=1]

Captures jax.profiler traces of the full-model train step on the real chip,
then parses the Chrome-format trace.json.gz the profiler writes alongside the
xplane.pb (no tensorflow needed) and prints device time grouped by op
category — the measurement behind the step-decomposition table in
docs/PERF.md.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def categorize(name: str) -> str:
    low = name.lower()
    if "flash" in low or "custom-call" in low or "tpu_custom_call" in low:
        return "pallas(flash attn)"
    if low.startswith(("dot", "convolution")) or "dot_general" in low:
        return "gemm"
    if low.startswith(("copy", "transpose", "concatenate", "slice",
                       "dynamic-slice", "dynamic_update", "reshape", "bitcast")):
        return "copy/layout"
    if low.startswith(("all-reduce", "all-gather", "reduce-scatter",
                       "collective")):
        return "collective"
    if low.startswith(("fusion", "loop_", "input_", "output_", "wrapped_")):
        return "fusion(elementwise)"
    if low.startswith(("reduce", "broadcast", "select", "compare", "add",
                       "multiply", "subtract", "divide", "exponential",
                       "convert", "rsqrt", "tanh", "maximum", "minimum",
                       "iota", "rng", "sort", "scatter", "gather", "pad")):
        return "elementwise/other-hlo"
    return "other"


def hlo_categories(hlo_path):
    """Map %fusion names → category by inspecting the optimized HLO: a fusion
    whose called computation contains a convolution/dot is a GEMM regardless
    of its generic trace name."""
    import re

    txt = open(hlo_path).read()
    # computation bodies: name → body text
    bodies = {}
    for m in re.finditer(r"^%(\S+) \([^)]*\) -> .*? \{(.*?)^\}", txt,
                         re.M | re.S):
        bodies[m.group(1)] = m.group(2)
    cats = {}
    for m in re.finditer(
            r"%(\S+?) = \S+ fusion\(.*?calls=%(\S+?)[,)\s]", txt):
        name, comp = m.group(1), m.group(2)
        body = bodies.get(comp, "")
        if "custom-call" in body:
            cat = "pallas"
        elif " convolution(" in body or " dot(" in body:
            cat = "gemm"
        elif "abs" in name and "reduce" in body:
            cat = "quant-amax"
        elif " reduce(" in body:
            cat = "reduce+elementwise"
        else:
            cat = "elementwise"
        cats[name] = cat
    return cats


def summarize(trace_dir, top=30, steps=1, hlo=None):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print(f"no trace.json.gz under {trace_dir}")
        return
    d = json.load(gzip.open(paths[-1]))
    events = d.get("traceEvents", [])
    hlo_cats = hlo_categories(hlo) if hlo else None

    # pid/tid metadata → lane names; keep device lanes (TPU XLA op lanes)
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device_lane(pid, tid):
        p = procs.get(pid, "")
        t = threads.get((pid, tid), "")
        if "TPU" in p or "/device:" in p:
            # xla op lanes carry individual HLO ops; skip step/scope lanes
            return ("XLA Ops" in t or "xla" in t.lower() or "Ops" in t
                    or t == "")
        # CPU backend: XLA ops run on the PjRt client host threads
        return "XLAPjRtCpuClient" in t

    agg = collections.Counter()
    flops = collections.Counter()
    per_op = collections.Counter()
    nev = collections.Counter()
    lanes_seen = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if not is_device_lane(pid, tid):
            continue
        name = e.get("name", "?")
        if name.startswith(("jit_", "while", "end:", "conditional")):
            continue  # containers wrap their children — counting both doubles
        dur = e.get("dur", 0.0)  # µs
        lanes_seen[(procs.get(pid, ""), threads.get((pid, tid), ""))] += dur
        args = e.get("args") or {}
        # the profiler tags each op with the compiler's own category
        # ("convolution fusion" = a fusion whose root is a GEMM/conv;
        # "custom-call" = our Pallas kernels) — far more reliable than
        # guessing from the instruction name
        ecat = args.get("hlo_category", "")
        if ecat == "custom-call":
            cat = "pallas(flash attn)"
        elif "convolution" in ecat:
            cat = ("gemm+quant-amax" if "abs_reduce" in name else "gemm")
        elif ecat:
            cat = {"data formatting": "copy/layout"}.get(ecat, ecat)
        else:
            cat = (hlo_cats.get(name) if hlo_cats else None) or categorize(name)
        agg[cat] += dur
        flops[cat] += float(args.get("model_flops", 0) or 0)
        per_op[name] += dur
        nev[name] += 1

    # fwd:bwd split — everything before each step's first backward flash
    # kernel (checkpoint.* = the merged bwd custom-calls) counts as forward
    dev_evs = sorted(
        (e for e in events if e.get("ph") == "X"
         and is_device_lane(e.get("pid"), e.get("tid"))
         and not e.get("name", "").startswith(
             ("jit_", "while", "end:", "conditional"))),
        key=lambda e: e.get("ts", 0))
    if dev_evs:
        first = dev_evs[0]["name"]
        bounds = [i for i, e in enumerate(dev_evs) if e["name"] == first]
        bounds.append(len(dev_evs))
        fwd = bwd = 0.0
        for s_i in range(len(bounds) - 1):
            seg = dev_evs[bounds[s_i]:bounds[s_i + 1]]
            t_b = next((e["ts"] for e in seg
                        if e["name"].startswith("checkpoint.")), None)
            for e in seg:
                if t_b is not None and e["ts"] >= t_b:
                    bwd += e.get("dur", 0.0)
                else:
                    fwd += e.get("dur", 0.0)
        k0 = 1e3 * steps
        if bwd:
            print(f"fwd {fwd/k0:.1f} ms : bwd+recompute {bwd/k0:.1f} ms "
                  f"= 1:{bwd/fwd:.2f}")

    total = sum(agg.values())
    if not total:
        print("no device events found; lanes available:")
        for (p, t), v in collections.Counter(
                {(procs.get(e.get('pid'), ''),
                  threads.get((e.get('pid'), e.get('tid')), '')): 1
                 for e in events if e.get('ph') == 'X'}).items():
            print(f"  proc={p!r} thread={t!r}")
        return
    k = 1e3 * steps
    print(f"device lanes: {dict(lanes_seen)}")
    print(f"== device leaf-op time {total/k:.2f} ms/step ({steps} steps)")
    for cat, dur in agg.most_common():
        tf = flops[cat] / dur / 1e6 if dur else 0.0  # model TFLOP/s
        print(f"  {cat:24s} {dur/k:9.3f} ms  {100*dur/total:5.1f}%"
              + (f"  {tf:6.1f} TF/s" if tf else ""))
    print(f"  -- top {top} ops (ms/step) --")
    for name, dur in per_op.most_common(top):
        print(f"  {dur/k:9.3f} ms  x{nev[name]//steps:<5d} {name[:110]}")


def capture(trace_dir, quant, iters):
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from qflux_tpu.losses import MseLoss
    from qflux_tpu.models.flux import transformer as flux
    from qflux_tpu.ops.layers import build_lora_tree
    from qflux_tpu.trainer.flux_kontext import FluxKontextAdapter
    from qflux_tpu.trainer.train_step import (TrainState, TrainStepConfig,
                                              make_train_step)
    from __graft_entry__ import _flux_inputs
    from bench import _synthetic_int8_params, _w8a8_params

    cache = os.path.expanduser("~/.cache/qflux_tpu/xla/tpu")
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    cfg = flux.FluxConfig()
    params = _synthetic_int8_params(cfg)
    if quant == "w8a8":
        params = _w8a8_params(params)
    adapter = FluxKontextAdapter(cfg, attn_impl="auto", remat=True,
                                 remat_policy="flash")
    opt = optax.adamw(1e-4)
    step = make_train_step(adapter.predict_velocity, MseLoss(), opt,
                           TrainStepConfig())
    lora = build_lora_tree(
        jax.random.PRNGKey(1), params,
        [r"attn/(to_q|to_k|to_v|to_out|add_q|add_k|add_v|add_out)"],
        rank=16, alpha=16, dtype=jnp.bfloat16)
    state = TrainState.create(lora, opt)
    batch = _flux_inputs(cfg, batch=1, grid_h=32, grid_w=32, txt_len=512,
                         dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    state, m = step(state, params, batch, rng)  # compile + warm
    _ = float(m["loss"])

    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, params, batch, rng)
    _ = float(m["loss"])
    wall = (time.perf_counter() - t0) / iters
    jax.profiler.stop_trace()
    print(f"captured {iters} steps, {wall*1e3:.1f} ms/step wall")


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    trace_dir = kv.get("dir", "/tmp/qflux_trace")
    iters = int(kv.get("iters", 3))
    if kv.get("parse_only") != "1":
        capture(trace_dir, kv.get("quant", "w8a8"), iters)
    summarize(trace_dir, int(kv.get("top", 30)), steps=iters,
              hlo=kv.get("hlo"))
