"""Orbax checkpointing: params + BN stats + bin boundaries + optimizer + step.

The reference saves only the model ``state_dict`` plus (for dynamic bins)
the boundary buffers, keyed on best validation metric, with no optimizer
state or step counter — so training cannot resume mid-run
(train_modelnet.py:491-509; the save condition even reads a config key,
``bin.dynamic_boundaries``, that no shipped YAML defines — a latent bug).
This rebuild checkpoints the full :class:`TrainState` atomically and keeps
a ``best`` alias alongside step-numbered saves.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from samble_tpu.train.state import TrainState


def _state_pytree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "bin_stats": state.bin_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    """Thin wrapper over an orbax CheckpointManager with a 'best' policy."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # best metric persists in a sidecar so resume in a fresh process
        # keeps the best-checkpoint policy (otherwise the first post-resume
        # validation always "improves" on 0 and can evict the true best)
        self.best_metric: Optional[float] = None
        self._best_path = os.path.join(self.directory, "best_metric.json")
        if os.path.isfile(self._best_path):
            try:
                import json

                with open(self._best_path) as f:
                    self.best_metric = float(json.load(f)["best_metric"])
            except Exception:
                pass

    def reset_best(self) -> None:
        """Forget any persisted best metric (call when starting a FRESH run
        in a reused directory — a stale sidecar from a previous run would
        otherwise suppress every save after a later resume)."""
        self.best_metric = None
        try:
            os.remove(self._best_path)
        except FileNotFoundError:  # already gone (or a multi-host peer won)
            pass

    def save(self, step: int, state: TrainState, metric: Optional[float] = None):
        """Save at ``step``; tracks the best metric seen (higher = better)."""
        self._mgr.save(
            step, args=ocp.args.StandardSave(_state_pytree(state))
        )
        if metric is not None and (
            self.best_metric is None or metric >= self.best_metric
        ):
            self.best_metric = metric
            import json

            import jax

            # process 0 only + atomic rename: concurrent multi-host writers
            # must not interleave into a corrupt sidecar
            if jax.process_index() == 0:
                tmp = self._best_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"best_metric": float(metric), "step": step}, f)
                os.replace(tmp, self._best_path)
        self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state_template``."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_state_pytree(state_template))
        )
        return state_template.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            bin_stats=restored["bin_stats"],
            opt_state=restored["opt_state"],
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
