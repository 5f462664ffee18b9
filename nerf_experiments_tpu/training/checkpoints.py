"""Checkpoint/resume via orbax.

Reference behavior (SURVEY.md §5.4): Lightning ModelCheckpoint every N
epochs with save_top_k=-1 (`barf/run_barf.py:142-146`), resume via
ckpt_path, hyperparameters captured alongside. Here: orbax saves of the full
TrainState (params + optimizer state + step) plus a JSON sidecar with the
config/seeds needed for exact resume (dataset noise seeds, schedule state is
derivable from `step`).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None) -> None:
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metadata is not None:
            with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
                json.dump(metadata, f, default=str)
        self._mgr.wait_until_finished()

    def restore(self, state_like, step: Optional[int] = None):
        """Restore into the structure of `state_like` (an abstract or concrete
        TrainState with the right shapes/dtypes)."""
        ocp = _ocp()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            state_like,
        )
        return self._mgr.restore(step, args=_ocp().args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def close(self):
        self._mgr.close()
