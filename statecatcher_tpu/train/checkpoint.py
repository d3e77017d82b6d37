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

    def save(self, step: int, train_state, meta: dict, carry=None):
        """Save train state + loop metadata; non-blocking (async orbax).

        ``carry`` (optional): the inter-segment encoder-state pytree.  SURVEY
        §5 checkpoint row requires the full training session — "including
        carry-state buffers" — so a preemption mid-recording-batch resumes
        with the exact streamed state instead of silently re-zeroing it.
        """
        items = {
            "state": ocp.args.StandardSave(train_state),
            "meta": ocp.args.JsonSave(meta),
        }
        if carry is not None:
            items["carry"] = ocp.args.StandardSave(carry)
        self._mgr.save(step, args=ocp.args.Composite(**items))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def has_carry(self, step: Optional[int] = None) -> bool:
        step = step if step is not None else self.latest_step()
        if step is None:
            return False
        return "carry" in (self._mgr.item_metadata(step) or {})

    def restore(self, train_state_template, step: Optional[int] = None,
                carry_template=None):
        """Restore (train_state, meta[, carry]); templates provide structure
        and shardings.

        With ``carry_template`` the return is a 3-tuple whose last element is
        the restored carry pytree, or ``None`` for checkpoints written before
        carry saving existed (layout migration: old composites simply lack
        the item, new readers ask only when the item is present)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {self.run_dir}")
        items = {
            "state": ocp.args.StandardRestore(train_state_template),
            "meta": ocp.args.JsonRestore(),
        }
        want_carry = carry_template is not None and self.has_carry(step)
        if want_carry:
            items["carry"] = ocp.args.StandardRestore(carry_template)
        out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        if carry_template is not None:
            return out["state"], out["meta"], out["carry"] if want_carry else None
        return out["state"], out["meta"]

    def close(self):
        self._mgr.close()
