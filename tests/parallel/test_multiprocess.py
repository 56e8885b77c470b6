"""Real multi-process execution: two OS processes join via
jax.distributed.initialize and run a psum over the global mesh — exercising
the --distributed code path (reference launches via `accelerate launch`
torch.distributed; here one program + jax.distributed)."""

import json
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


FIT_WORKER = textwrap.dedent("""
    import json, sys
    from pathlib import Path
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid, root = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    import numpy as np
    from qflux_tpu.config import Config
    from qflux_tpu.data.dataset import ImageDataset
    from qflux_tpu.data.loader import DataLoader
    from qflux_tpu.data.preprocess import ImageProcessor
    from qflux_tpu.parallel.collectives import gather_validation_images
    from qflux_tpu.trainer.base import Trainer

    # 1) the validation-image gather: each process contributes its shard,
    #    both receive the union in index order
    mine = ([0], [np.full((1, 4, 4, 3), 10, np.uint8)]) if pid == 0 else \
           ([1], [np.full((1, 4, 4, 3), 20, np.uint8)])
    idxs, imgs = gather_validation_images(mine[0], mine[1], n_total=2)
    assert idxs == [0, 1], idxs
    assert imgs[0][0, 0, 0, 0] == 10 and imgs[1][0, 0, 0, 0] == 20

    # 2) a REAL 2-process Trainer.fit for 2 steps on the tiny stack
    img_dir = root / "data"
    cfg = Config.model_validate({
        "trainer": "FluxKontextLoraTrainer",
        "mesh": {"dp": 2, "fsdp": 1},
        "model": {"variant": "test", "lora": {"r": 2, "lora_alpha": 2}},
        "data": {"init_args": {"dataset_path": str(img_dir)},
                 "processor": {"process_type": "resize", "target_size": [32, 32]}},
        "train": {"max_train_steps": 2, "checkpointing_steps": 1000,
                  "weight_dtype": "float32", "num_epochs": 10},
        "validation": {"enabled": True, "steps": 2, "num_inference_steps": 2,
                       "samples": [
                           {"images": [str(img_dir / "control_images" / "img_000.png")],
                            "prompt": "a"},
                           {"images": [str(img_dir / "control_images" / "img_001.png")],
                            "prompt": "b"}]},
        "logging": {"output_dir": str(root / "out"), "project": "mp",
                    "report_to": "tensorboard"},
    })
    t = Trainer(cfg)
    ds = ImageDataset(dataset_path=str(img_dir),
                      processor=ImageProcessor(cfg.data.processor))
    state = t.fit(DataLoader(ds, batch_size=2, shuffle=False, drop_last=False))
    assert int(state.step) == 2, int(state.step)
    assert t.output_dir == root / "out" / "mp" / "v0", t.output_dir
    print(f"fitproc {pid} ok")
""")


def test_two_process_fit(tmp_path):
    """Round 3 (VERDICT #4): a real 2-process Trainer.fit — one run dir, one
    checkpoint set, rank-gated logging, gathered validation images."""
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "data"
    (img_dir / "training_images").mkdir(parents=True)
    (img_dir / "control_images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        stem = f"img_{i:03d}"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "training_images" / f"{stem}.png")
        (img_dir / "training_images" / f"{stem}.txt").write_text(f"prompt {i}")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            img_dir / "control_images" / f"{stem}.png")

    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    script = tmp_path / "fit_worker.py"
    script.write_text(FIT_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    import re

    env["XLA_FLAGS"] = re.sub(r"--xla_force_host_platform_device_count=\d+",
                              "", env.get("XLA_FLAGS", "")).strip()
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"fitproc {i} ok" in out

    # exactly ONE run dir — no create/GC race between processes
    runs = sorted((tmp_path / "out" / "mp").glob("v*"))
    assert [r.name for r in runs] == ["v0"], runs
    # one checkpoint set, written by process 0 only
    ckpts = sorted(runs[0].glob("checkpoint-last-*"))
    assert len(ckpts) == 1 and (ckpts[0] / "state.json").exists()
    assert json.loads((ckpts[0] / "state.json").read_text())["global_step"] == 2
    # rank-gated tensorboard: exactly one writer produced event files,
    # containing BOTH validation samples (gathered to rank 0)
    events = list((runs[0] / "logs").rglob("events*"))
    assert len(events) == 1, events
    data = events[0].read_bytes()
    assert b"validation/sample_0" in data and b"validation/sample_1" in data
    assert b"validation/prompt_1" in data
