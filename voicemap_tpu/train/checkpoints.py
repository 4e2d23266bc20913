"""Orbax checkpointing: params + opt_state + step + lr, with auto-resume and
a best-by-n-shot-accuracy export policy.

Sampler state needs no explicit checkpointing: batch sampling is a pure
function of (seed, step) — every train step folds ``state.step`` into the
PRNG key — so restoring ``step`` exactly resumes the data stream
(SURVEY.md §5 "checkpoint/resume": the reference could not resume at all).

Rebuild of the reference's ``ModelCheckpoint(monitor='val_1-shot_acc',
mode='max', save_best_only)`` → ``models/*.hdf5`` (SURVEY.md §5
"Checkpoint / resume") — extended with full optimizer-state resume, which the
reference lacked.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        # Best metric persists on disk so a resumed run cannot overwrite the
        # historical best checkpoint with a worse post-restart evaluation.
        self._best_metric_path = os.path.join(self.directory, "best_metric.json")
        self.best_metric: Optional[float] = None
        if os.path.exists(self._best_metric_path):
            try:
                with open(self._best_metric_path) as f:
                    self.best_metric = float(json.load(f)["metric"])
            except (ValueError, KeyError, json.JSONDecodeError):
                self.best_metric = None

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def save_best(self, state: TrainState, metric: float) -> bool:
        """Keep only the best-by-metric state (mode='max'). Returns True if saved."""
        if self.best_metric is None or metric > self.best_metric:
            self.best_metric = metric
            self._best_mgr.save(int(state.step), args=ocp.args.StandardSave(state))
            with open(self._best_metric_path, "w") as f:
                json.dump({"metric": float(metric), "step": int(state.step)}, f)
            return True
        return False

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_best(self, template: TrainState) -> Optional[TrainState]:
        step = self._best_mgr.latest_step()
        if step is None:
            return None
        return self._best_mgr.restore(step, args=ocp.args.StandardRestore(template))

    def metadata(self, which: str = "best") -> Optional[Any]:
        """Shape/dtype metadata of the stored state, restored WITHOUT a
        template — lets tools built around a checkpoint (e.g. the embed CLI)
        size their model to the checkpoint instead of guessing (the head's
        class count is not recoverable from the embedding corpus)."""
        mgr = self._best_mgr if which == "best" else self._mgr
        step = mgr.latest_step()
        if step is None:
            return None
        # item_metadata warns (absl) that the item "could not be restored"
        # — expected for a metadata-only probe; keep CLI output clean.
        from absl import logging as absl_logging

        prev = absl_logging.get_verbosity()
        absl_logging.set_verbosity(absl_logging.ERROR)
        try:
            return mgr.item_metadata(step)
        finally:
            absl_logging.set_verbosity(prev)

    def wait(self):
        self._mgr.wait_until_finished()
        self._best_mgr.wait_until_finished()

    def head_num_classes(self, which: str = "best") -> Optional[int]:
        """Width of the stored classifier head, or None when it doesn't
        constrain the class count (siamese Dense(1) heads, missing/opaque
        metadata). Lets eval/embed CLIs size their restore template to the
        checkpoint instead of guessing from the corpus being evaluated."""
        try:
            meta = self.metadata(which)
        except Exception:
            return None
        if meta is None:
            return None
        node = getattr(meta, "tree", meta)  # TreeMetadata wraps the pytree
        for key in ("params", "head", "kernel"):
            if isinstance(node, dict):
                node = node.get(key)
            else:
                node = getattr(node, key, None)
            if node is None:
                return None
        shape = getattr(node, "shape", None)
        if not shape or len(shape) != 2:
            return None
        if int(shape[-1]) <= 1:
            # Siamese verification heads are Dense(1) — width 1 says nothing
            # about a class count.
            return None
        return int(shape[-1])

    def template_num_classes(self, which: str, corpus_classes: int) -> int:
        """The class count a restore template must use: the checkpoint's
        stored head width when it differs from the corpus's (orbax
        StandardRestore is shape-strict; the corpus being evaluated or
        embedded has no bearing on the trained head)."""
        ckpt_classes = self.head_num_classes(which)
        if ckpt_classes is not None and ckpt_classes != corpus_classes:
            print(f"sizing head to checkpoint: {ckpt_classes} classes "
                  f"(corpus has {corpus_classes})")
            return ckpt_classes
        return corpus_classes

    def close(self):
        self.wait()
        self._mgr.close()
        self._best_mgr.close()
