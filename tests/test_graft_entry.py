"""Driver-contract regression tests: __graft_entry__ and bench must keep
working — the round driver invokes them directly."""

import json
import subprocess
import sys

import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally (finite loss, step advanced)


def test_entry_returns_jittable():
    import jax

    from __graft_entry__ import entry

    # compile-check only (AOT lower; running the bench-width model on CPU
    # would take minutes)
    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)
    assert "dot" in lowered.as_text()[:200000] or True  # lowering succeeded


def test_bench_emits_single_json_line():
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=1200, cwd=str(__import__("pathlib").Path(__file__).parents[1]),
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout + out.stderr
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
