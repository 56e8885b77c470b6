"""Real multi-process execution: two OS processes join via
jax.distributed.initialize and run a psum over the global mesh — exercising
the --distributed code path (reference launches via `accelerate launch`
torch.distributed; here one program + jax.distributed)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).parents[2]

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import jax.numpy as jnp
    import numpy as np
    from qflux_tpu.parallel.collectives import shard_validation_samples

    # round-robin sample sharding differs per process (reference
    # validation.py:281-294)
    mine = shard_validation_samples(5)
    expect = [i for i in range(5) if i % 2 == pid]
    assert mine == expect, (pid, mine)

    # a real cross-process collective over the global devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.asarray(jax.devices())  # 2 global devices (1 per process)
    assert len(devs) == 2
    mesh = Mesh(devs, ("dp",))
    arr = jax.make_array_from_callback(
        (2,), NamedSharding(mesh, P("dp")),
        lambda idx: np.asarray([float(pid + 1)]))
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 3.0, float(total)  # 1 (proc0) + 2 (proc1)
    print(f"proc {pid} ok")
""")


def test_two_process_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process (strip the conftest 8-device flag)
    import re

    env["XLA_FLAGS"] = re.sub(r"--xla_force_host_platform_device_count=\d+",
                              "", env.get("XLA_FLAGS", "")).strip()
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
