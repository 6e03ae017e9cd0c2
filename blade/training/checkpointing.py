"""Orbax checkpointing for TDM training (save/rotate/resume).

Reference behavior being replaced: ``accelerator.save_state`` every
``checkpointing_steps`` with ``checkpoints_total_limit`` rotation and
``resume_from_checkpoint latest`` scanning (``train_cogvideo_tdm.py:
1130-1189, 1370-1396, 1768-1791``).  Improvement over the reference: the
fake-score adapter and BOTH optimizer states are checkpointed, so resume is
exact (the reference silently drops fake/optimizer state).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin orbax wrapper with step-dir naming + rotation."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def all_steps(self):
        return self._mgr.all_steps()
