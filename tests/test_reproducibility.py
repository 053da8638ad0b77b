"""Same seed ⇒ bitwise-identical training trajectory.

The reference leans on global torch RNG (SURVEY.md §7 hard part 5); this
framework threads explicit keys through loader, augmentation, dropout and
the Gumbel sampler.  This test guards that discipline end-to-end: two
fresh runs from one seed must produce identical batches and identical
per-step losses.
"""

from __future__ import annotations

import jax
import numpy as np

from samble_tpu.config import load_config
from samble_tpu.data import synthetic_modelnet, make_batch_augment
from samble_tpu.models import ClsModel
from samble_tpu.native import make_train_loader
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state
from samble_tpu.train.step import make_train_step

TINY = [
    "train.dataloader.selected_points=64",
    "feature_learning_block.downsample.M=[32,16]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
]


def _losses(seed: int, native: str):
    cfg = load_config(
        "configs/default.yaml", "configs/datasets/modelnet.yaml",
        "configs/cls.yaml", TINY,
    )
    ds = synthetic_modelnet(24, num_points=128)
    loader = make_train_loader(
        ds.pcd, ds.label, batch_size=4, selected_points=64, seed=seed,
        native=native,
    )
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=len(loader))
    state = create_train_state(
        model, (np.zeros((4, 64, 3), np.float32),), tx, jax.random.key(seed)
    )
    step = make_train_step(
        model, cfg, "cls", 40,
        augment_fn=make_batch_augment(cfg.train.dataloader.data_augmentation),
    )
    losses = []
    for batch in loader:
        state, out = step(state, (batch[0], batch[1]), jax.random.key(seed))
        losses.append(float(out["loss"]))
    return losses


def test_same_seed_same_trajectory():
    for native in ("off", "auto"):
        a = _losses(123, native)
        b = _losses(123, native)
        assert a == b, f"trajectory diverged (native={native})"
        assert all(np.isfinite(a))


def test_different_seed_different_trajectory():
    a = _losses(123, "off")
    c = _losses(124, "off")
    assert a != c
