"""Batched, mesh-sharded inference (BASELINE.json config #5).

The reference has no serving story beyond its eval scripts; this module is
the production-shaped path: restore a checkpoint once, build a jitted
forward over a ``jax.sharding.Mesh`` (batch sharded on the ``data`` axis so
the same code serves 1 chip or a v5e-8 over ICI), optionally apply
on-device TTA voting, and stream host batches through it.

    from samble_tpu.serve import Server
    srv = Server.from_run("runs/<run>")          # config resurrection
    logits = srv(points)                          # (B, N, 3) -> (B, 40)

Throughput notes: keep B a multiple of the device count; the first call
compiles (persistent compilation cache recommended); subsequent calls are
dispatch-only.  ``srv.throughput()`` reports measured clouds/sec with the
chained-dispatch methodology (see bench.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu.models import ClsModel, SegModel
from samble_tpu.parallel import make_mesh, replicate_state, shard_batch
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state


class Server:
    """Checkpoint-backed sharded inference for either task."""

    def __init__(self, cfg: Any, ckpt_dir: str, task: str = "cls",
                 dtype: Any = jnp.bfloat16, num_vote: int = 0,
                 mesh: Optional[Any] = None):
        self.cfg = cfg
        self.task = task
        self.mesh = mesh if mesh is not None else make_mesh()
        n_sel = int(cfg.train.dataloader.selected_points)
        if task == "cls":
            model_t = ClsModel(cfg=cfg, num_classes=40, train=True, dtype=dtype)
            self.model = ClsModel(cfg=cfg, num_classes=40, train=False,
                                  dtype=dtype)
            example = (np.zeros((2, n_sel, 3), np.float32),)
        elif task == "seg":
            model_t = SegModel(cfg=cfg, num_parts=50, train=True, dtype=dtype)
            self.model = SegModel(cfg=cfg, num_parts=50, train=False,
                                  dtype=dtype)
            example = (
                np.zeros((2, n_sel, 3), np.float32),
                np.zeros((2, 16), np.float32),
            )
        else:
            raise ValueError(f"task must be cls or seg, got {task}")
        tx = make_optimizer(cfg.train, steps_per_epoch=1)
        template = create_train_state(model_t, example, tx, jax.random.key(0))
        mgr = CheckpointManager(ckpt_dir)
        state = mgr.restore(template)
        mgr.close()
        self.state = replicate_state(self.mesh, state)
        self.num_vote = int(num_vote)

        if self.num_vote > 0:
            from samble_tpu.data.augmentation import make_vote_augment
            from samble_tpu.train.step import make_vote_eval_step

            self._vote = make_vote_eval_step(
                self.model, task, self.num_vote,
                make_vote_augment(cfg.train.dataloader.data_augmentation),
            )
        else:
            self._vote = None

        # close over the restored variables instead of passing them as an
        # argument: weights become compile-time constants XLA can pre-pack
        # into the executable.  Serving restores once, so the
        # one-executable-per-checkpoint tradeoff is right here (the training
        # loop, which updates params every step, passes state).  Measured
        # equal-throughput on this box within its hour-scale drift envelope.
        # The closure makes the executable weight-specific: swapping
        # checkpoints requires building a new Server (documented contract —
        # there is deliberately no state argument to mis-pass stale weights
        # through).
        captured = self.state.variables()

        def forward(points, cat, rng):
            if task == "cls":
                logits, _ = self.model.apply(
                    captured, points, rngs={"sampling": rng}
                )
            else:
                logits, _ = self.model.apply(
                    captured, points, cat, rngs={"sampling": rng}
                )
            return logits

        self._forward = jax.jit(forward)

    @classmethod
    def from_run(cls, run_dir: str, task: Optional[str] = None, **kw):
        """Build from a training run directory (config resurrection)."""
        from samble_tpu.cli.common import (
            build_config_from_run,
            normalize_ckpt_dir,
            resurrect_run_config,
        )

        cfg_path, _ = resurrect_run_config(run_dir)
        if cfg_path is None:
            raise FileNotFoundError(f"no run_config.json under {run_dir}")
        cfg = build_config_from_run(cfg_path, [])
        if task is None:
            # ShapeNet's category mapping has 16 entries, ModelNet40 has 40
            mapping = cfg.select("datasets.mapping")
            mapping = mapping.to_dict() if hasattr(mapping, "to_dict") else (
                mapping or {}
            )
            task = "seg" if len(mapping) == 16 else "cls"
        return cls(cfg, normalize_ckpt_dir(run_dir), task=task, **kw)

    def __call__(self, points: np.ndarray, cat: Optional[np.ndarray] = None,
                 seed: int = 0):
        """Sharded batched forward.  ``points (B, N, 3)`` with B divisible by
        the mesh size; returns logits on host."""
        rng = jax.random.key(seed)
        if self.task == "cls":
            pts = shard_batch(self.mesh, points)
            if self._vote is not None:
                out = self._vote(self.state, pts, None, rng)
                return np.asarray(out["logits"])
            return np.asarray(self._forward(pts, None, rng))
        cat_oh = cat if cat is not None else np.zeros(
            (points.shape[0], 16), np.float32
        )
        pts, cat_oh = shard_batch(self.mesh, (points, cat_oh.astype(np.float32)))
        if self._vote is not None:
            out = self._vote(self.state, pts, cat_oh, rng)
            return np.asarray(out["logits"])
        return np.asarray(self._forward(pts, cat_oh, rng))

    def throughput(self, batch: int = 128, iters: int = 10) -> float:
        """Measured clouds/sec (chained dispatch + readback fence — the
        shared utils.profiling.timeit_chained methodology)."""
        from samble_tpu.utils.profiling import timeit_chained

        n_sel = int(self.cfg.train.dataloader.selected_points)
        rng = np.random.default_rng(0)
        pts = shard_batch(
            self.mesh, rng.normal(size=(batch, n_sel, 3)).astype(np.float32)
        )
        cat = (
            shard_batch(self.mesh, np.zeros((batch, 16), np.float32))
            if self.task == "seg" else None
        )
        def fwd(p):
            return self._forward(p, cat, jax.random.key(1))

        return batch / timeit_chained(fwd, pts, iters=iters)
