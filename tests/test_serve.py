"""Sharded serving path (BASELINE config #5): restore → mesh → batched
inference, on the 8-device virtual CPU mesh."""

import os

import jax
import numpy as np
import pytest

from samble_tpu.models import ClsModel
from samble_tpu.serve import Server
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state

from tests._tiny_configs import N, tiny_cls_config


def _tiny_full_config():
    """tiny_cls_config + the train/datasets sections Server needs."""
    cfg = tiny_cls_config()
    cfg.train = {
        "lr": 1e-3,
        "epochs": 1,
        "lr_scheduler": {"enable": False},
        "optimizer": {"which": "adamw", "weight_decay": 0.0},
        "dataloader": {
            "selected_points": N,
            "data_augmentation": {
                "enable": False, "num_aug": 0,
                "jitter": {"enable": False}, "rotate": {"enable": False},
                "translate": {"enable": False},
                "anisotropic_scale": {"enable": False},
            },
        },
    }
    cfg.datasets = {"mapping": {str(i): i for i in range(40)}}
    return cfg


def test_server_sharded_inference(tmp_path):
    assert jax.device_count() >= 8
    cfg = _tiny_full_config()
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    # same optimizer factory as Server's restore template, so the saved
    # opt_state tree matches
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = create_train_state(
        model, (np.zeros((8, N, 3), np.float32),), tx, jax.random.key(0)
    )
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.close()

    srv = Server(cfg, ckpt_dir, task="cls", dtype=np.float32)
    pts = np.random.default_rng(0).normal(size=(16, N, 3)).astype(np.float32)
    logits = srv(pts)
    assert logits.shape == (16, 40)
    assert np.isfinite(logits).all()
    # per-cloud results do not depend on batch co-membership / sharding
    logits2 = srv(pts[:8])
    np.testing.assert_allclose(logits[:8], logits2, rtol=2e-4, atol=2e-5)
