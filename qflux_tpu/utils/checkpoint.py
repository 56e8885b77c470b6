"""Async checkpointing via orbax (full-state) alongside the LoRA safetensors.

The reference saves synchronously on the training thread (reference
base_trainer.py:827-875 — FSDP-safe rank-0 export).  On TPU, orbax's async
checkpointer overlaps the serialization with the next train steps — the
device-to-host copy happens immediately, the disk write in the background —
so checkpointing stops costing step time (SURVEY.md §7 step 8).

The LoRA safetensors export (utils/lora_io) remains the interop format; this
module handles the full resumable state (lora + optimizer + step).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax


class AsyncCheckpointer:
    def __init__(self, directory: str | Path):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mngr = ocp.CheckpointManager(
                str(self.directory),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=3, enable_async_checkpointing=True),
            )
        except Exception as e:  # pragma: no cover
            logging.warning("orbax unavailable (%s); falling back to sync npz", e)
            self._mngr = None

    def save(self, step: int, state: Any) -> None:
        if self._mngr is not None:
            self._mngr.save(step, args=self._ocp.args.StandardSave(state))
            return
        import numpy as np

        flat, _ = jax.tree_util.tree_flatten(state)
        np.savez(self.directory / f"state_{step}.npz",
                 **{str(i): np.asarray(x) for i, x in enumerate(flat)})

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        if self._mngr is not None:
            step = step if step is not None else self._mngr.latest_step()
            if step is None:
                return None
            if template is not None:
                return self._mngr.restore(
                    step, args=self._ocp.args.StandardRestore(template))
            return self._mngr.restore(step)
        import numpy as np

        steps = sorted(int(p.stem.split("_")[1]) for p in self.directory.glob("state_*.npz"))
        if not steps:
            return None
        step = step if step is not None else steps[-1]
        flat = np.load(self.directory / f"state_{step}.npz")
        leaves = [flat[str(i)] for i in range(len(flat.files))]
        if template is None:
            return leaves
        treedef = jax.tree_util.tree_structure(template)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def latest_step(self) -> Optional[int]:
        if self._mngr is not None:
            return self._mngr.latest_step()
        steps = sorted(int(p.stem.split("_")[1]) for p in self.directory.glob("state_*.npz"))
        return steps[-1] if steps else None

    def wait(self) -> None:
        """Block until in-flight async saves land (call before process exit)."""
        if self._mngr is not None:
            self._mngr.wait_until_finished()

    def close(self):
        if self._mngr is not None:
            self._mngr.close()
