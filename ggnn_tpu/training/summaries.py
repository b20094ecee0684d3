"""TensorBoard scalar summaries (SURVEY §2 row 11).

The reference writes per-batch `loss` and `accuracy<i>` scalars through
merged TF summaries into `<log_dir>/tb/<run_id>/{train,validation}`
(chem_tensorflow.py:53-54,101-102,195-200,236-238), with global step
counters that persist across checkpoint resume. This reproduces that
layout over tensorboardX; when tensorboardX is unavailable the writer
degrades to a no-op so the training stack has no hard dependency.
"""

import os
from typing import Optional, Sequence


class SummarySink:
    """Per-split scalar writer with reference-compatible tag names."""

    def __init__(self, log_dir: str, run_id: str, enabled: bool = True):
        self._writers = {}
        self._enabled = enabled
        if not enabled:
            return
        try:
            from tensorboardX import SummaryWriter
        except ImportError:      # pragma: no cover - env without tbX
            self._enabled = False
            return
        base = os.path.join(log_dir, "tb", run_id)
        self._writers = {
            "train": SummaryWriter(os.path.join(base, "train")),
            "validation": SummaryWriter(os.path.join(base, "validation")),
        }

    def add_batch(self, split: str, step: int, loss: float,
                  accuracies: Sequence[float],
                  task_ids: Optional[Sequence[int]] = None) -> None:
        if not self._enabled:
            return
        w = self._writers[split]
        w.add_scalar("loss", loss, step)
        ids = task_ids if task_ids is not None else range(len(accuracies))
        for task_id, acc in zip(ids, accuracies):
            w.add_scalar(f"accuracy{task_id}", float(acc), step)

    def flush(self) -> None:
        """tensorboardX buffers with a 120s interval and NO atexit hook
        (daemon writer thread) — without explicit flushes a short run's
        scalars never reach disk. Called once per epoch by the Runner."""
        for w in self._writers.values():
            w.flush()

    def close(self) -> None:
        for w in self._writers.values():
            w.close()
