"""Checkpointing: orbax save + REAL resume.

The reference only saves (torch.save of state_dicts at epoch boundaries and
every-N updates, reference train.py:267-283,411-417,577-578) — **no loading
code exists anywhere** (SURVEY.md §5).  Here checkpoints hold the full
train-state pytree (params, optimizer state, step) plus loop metadata
(epoch, global_step, config snapshot), and ``restore`` brings training back.

Layout: ``<model_dir>/<run_ts>/ckpt_<step>/`` (orbax tree) +
``training_config.json`` (parity with the reference's training_args.json,
reference train.py:62-66).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import orbax.checkpoint as ocp

from statecatcher_tpu.config import Config


def setup_run_dir(cfg: Config) -> str:
    """models/<unix-ts>/ with a config snapshot (reference train.py:56-68)."""
    run_dir = os.path.join(cfg.train.model_dir, str(int(time.time())))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_config.json"), "w") as f:
        f.write(cfg.to_json())
    return run_dir


class CheckpointManager:
    def __init__(self, run_dir: str, max_to_keep: int = 5):
        self.run_dir = os.path.abspath(run_dir)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.run_dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, train_state, meta: dict):
        """Save train state + loop metadata; non-blocking (async orbax)."""
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(train_state),
                meta=ocp.args.JsonSave(meta),
            ),
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, train_state_template, step: Optional[int] = None):
        """Restore (train_state, meta); template provides structure/shardings."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {self.run_dir}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(train_state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"]

    def close(self):
        self._mgr.close()
