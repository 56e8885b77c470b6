"""Process-level XLA:TPU environment knobs that must be set BEFORE the
backend initializes (libtpu snapshots ``LIBTPU_INIT_ARGS`` at plugin load).

The one knob we require: ``--xla_tpu_scoped_vmem_limit_kib``.  XLA's default
scoped-VMEM budget is 16 MiB; with the folded attention layout
(ops/flash_nr.py) the compiler places the merged backward kernel's dq/dk
outputs (15.7 MB each at the 512² headline shape) in VMEM so the consumer
GEMMs read them without an HBM round trip — a placement that overflows the
default budget at compile time ("Scoped allocation ... exceeded scoped vmem
limit", docs/PERF.md round 4).  Raising the limit to 48 MiB (of the v5e's
128 MiB VMEM) admits the placement; entrypoints (main.py, bench.py,
scripts/*) call :func:`configure_scoped_vmem` first thing.

Library users who import qflux_tpu directly get the conservative default:
the folded layout auto-disables on TPU unless this ran (or they set
``QFLUX_NR_FOLD=1`` themselves after raising the limit out-of-band).
"""

from __future__ import annotations

import os

SCOPED_VMEM_KIB = 49152  # 48 MiB of the 128 MiB/core VMEM (v5e/v5p/v6e)
_MARKER = "QFLUX_SCOPED_VMEM_KIB"
_FLAG = "--xla_tpu_scoped_vmem_limit_kib"


def _backend_up() -> bool:
    try:
        import jax._src.xla_bridge as _xb

        return bool(_xb.backends_are_initialized())
    except Exception:
        return False


def configure_scoped_vmem(kib: int = SCOPED_VMEM_KIB) -> bool:
    """Append ``--xla_tpu_scoped_vmem_limit_kib=<kib>`` to LIBTPU_INIT_ARGS.

    Must run before jax touches the TPU backend (any `jax.devices()` /
    first trace).  Idempotent; an existing user-provided limit wins.
    Returns True when the limit is (now) raised and sets the
    ``QFLUX_SCOPED_VMEM_KIB`` marker that ops/flash_nr.py reads to default
    the folded kernel layout on.
    """
    marker = os.environ.get(_MARKER)
    if marker is not None:
        if marker in ("0", ""):  # explicit opt-out (A/B escape hatch)
            return False
        if marker.isdigit():  # pre-seeded value wins (and may already be live)
            kib = int(marker)
        # a non-numeric marker (corrupt re-export) is ignored, not a crash:
        # fall through and re-derive it from the flag / default
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if _FLAG in args:  # the flag is already live — record its value
        # tolerate a malformed flag (bare / space-separated, no "=value"):
        # libtpu ignores it, so record nothing rather than crash the
        # entrypoint preamble — scoped_vmem_raised() then stays False
        tail = args.split(f"{_FLAG}=", 1)
        val = tail[1].split()[0] if len(tail) == 2 else ""
        if val.isdigit() and val != "0":
            os.environ[_MARKER] = val
            return True
        return False
    if _backend_up():
        # too late: the TPU backend snapshotted the env — stay at the
        # conservative default rather than lie to scoped_vmem_raised()
        return False
    os.environ["LIBTPU_INIT_ARGS"] = (args + " " if args else "") + f"{_FLAG}={kib}"
    os.environ[_MARKER] = str(kib)
    return True


def scoped_vmem_raised() -> bool:
    """True when the scoped-VMEM limit is VERIFIED live: the flag is in
    LIBTPU_INIT_ARGS AND the numeric marker was recorded by
    :func:`configure_scoped_vmem` — which refuses to set it when the TPU
    backend had already initialized (the flag would be dead) or when the
    flag value is malformed. A bare env flag exported after backend init
    must NOT default the folded layout on: the merged backward would then
    die at compile time with "Scoped allocation exceeded scoped vmem
    limit" and no remat fallback recognizes that error class."""
    marker = os.environ.get(_MARKER, "")
    return (marker.isdigit() and marker != "0"
            and _FLAG in os.environ.get("LIBTPU_INIT_ARGS", ""))
