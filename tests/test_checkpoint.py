"""Checkpoint save → restore roundtrip and exact-resume semantics.

The reference cannot resume training (it saves only ``state_dict`` plus the
dynamic bin boundaries, no optimizer state/step — train_modelnet.py:491-509).
This rebuild checkpoints the full TrainState; these tests pin that down:

  * every leaf (params, BN stats, bin boundaries, optimizer state, step)
    survives a roundtrip bitwise,
  * eval logits from the restored state are bitwise-identical,
  * one further train step from the restored state matches an uninterrupted
    run exactly (true resume, not approximate).
"""

import os

import jax
import numpy as np
import optax
import pytest

from samble_tpu.models import ClsModel
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.state import create_train_state
from samble_tpu.train.step import make_eval_step, make_train_step

from tests._tiny_configs import tiny_cls_config, N


def _make_state_and_step(cfg, seed=0):
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    tx = optax.adamw(1e-3)
    example = (np.zeros((4, N, 3), np.float32),)
    state = create_train_state(model, example, tx, jax.random.key(seed))
    step = make_train_step(model, cfg, "cls", 40, donate=False)
    return model, state, step


def _leaves_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_and_exact_resume(tmp_path):
    cfg = tiny_cls_config()
    model, state, step = _make_state_and_step(cfg, seed=0)

    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(4, N, 3)).astype(np.float32),
            rng.integers(0, 40, 4).astype(np.int32),
        )
        for _ in range(3)
    ]
    # two steps so BN stats / bin boundaries / adam moments are all non-init
    for b in batches[:2]:
        state, _ = step(state, b, jax.random.key(1))

    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(2, state, metric=0.5)

    # restore into a template initialized with a DIFFERENT rng: every leaf
    # must come from the checkpoint, not the template
    _, template, _ = _make_state_and_step(cfg, seed=99)
    restored = mgr.restore(template)
    mgr.close()
    _leaves_equal(
        {
            "step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "bin_stats": state.bin_stats,
            "opt_state": state.opt_state,
        },
        {
            "step": restored.step, "params": restored.params,
            "batch_stats": restored.batch_stats, "bin_stats": restored.bin_stats,
            "opt_state": restored.opt_state,
        },
    )

    # eval logits bitwise equal (deterministic sampler path not required:
    # same rng key ⇒ same Gumbel noise either way)
    model_eval = ClsModel(cfg=cfg, num_classes=40, train=False)
    eval_step = make_eval_step(model_eval, "cls")
    out_a = eval_step(state, batches[2][0], None, jax.random.key(3))
    out_b = eval_step(restored, batches[2][0], None, jax.random.key(3))
    np.testing.assert_array_equal(
        np.asarray(out_a["logits"]), np.asarray(out_b["logits"])
    )

    # exact resume: one more train step from saved vs restored is identical
    state_c, out_c = step(state, batches[2], jax.random.key(2))
    state_r, out_r = step(restored, batches[2], jax.random.key(2))
    np.testing.assert_array_equal(
        np.asarray(out_c["loss"]), np.asarray(out_r["loss"])
    )
    _leaves_equal(state_c.params, state_r.params)
    _leaves_equal(state_c.opt_state, state_r.opt_state)


def test_best_metric_persists_across_processes(tmp_path):
    """Resume must not reset the best-checkpoint policy: a fresh
    CheckpointManager reloads the best metric from its sidecar, so a worse
    post-resume validation cannot evict the true best checkpoint."""
    cfg = tiny_cls_config()
    _, state, _ = _make_state_and_step(cfg, seed=0)
    d = os.path.join(str(tmp_path), "ckpts")
    mgr = CheckpointManager(d)
    mgr.save(0, state, metric=0.92)
    mgr.close()
    mgr2 = CheckpointManager(d)
    assert mgr2.best_metric == pytest.approx(0.92)
    mgr2.close()
