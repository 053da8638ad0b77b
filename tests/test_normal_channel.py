"""End-to-end xyz+normal (6-channel) path.

The reference keeps the option alive through config validation
(``normal_channel`` / ``shapenet_Normal``, utils/check_config.py:108-124)
and ships normal-aware augmentations (data_augmentation.py:79-140) but no
loader; here the whole path runs: synthetic 6-channel clouds → normal-aware
on-device augmentation → EdgeConv with xyz-only kNN → one training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu.config import load_config, check_config
from samble_tpu.data import synthetic_modelnet, BatchLoader, make_batch_augment
from samble_tpu.data import augmentation as aug
from samble_tpu.models import ClsModel
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state
from samble_tpu.train.step import make_train_step

TINY = [
    "train.dataloader.selected_points=64",
    "feature_learning_block.downsample.M=[32,16]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
    # the 6-channel wiring (reference check_config.py:117-120: first
    # conv1_in must be 12 with normals)
    "feature_learning_block.embedding.normal_channel=true",
    "feature_learning_block.embedding.conv1_in=[12,128]",
    # normals require isotropic scaling (data_augmentation.py:69)
    "train.dataloader.data_augmentation.anisotropic_scale.isotropic=true",
]


def _cfg():
    return load_config(
        "configs/default.yaml", "configs/datasets/modelnet.yaml",
        "configs/cls.yaml", TINY,
    )


def test_normal_aware_transforms_preserve_normals():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(128, 3)).astype(np.float32)
    nrm = rng.normal(size=(128, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pcd = jnp.asarray(np.concatenate([xyz, nrm.astype(np.float32)], -1))
    key = jax.random.key(0)

    # rotation rotates normals WITH the points (norms preserved)
    out = aug.rotate_with_normal(key, pcd, (-15.0, 15.0))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[:, 3:]), axis=-1), 1.0, atol=1e-5
    )
    # relative orientation is rigid: dot(xyz_i, n_i) invariant
    np.testing.assert_allclose(
        np.sum(np.asarray(out[:, :3]) * np.asarray(out[:, 3:]), -1),
        np.sum(xyz * np.asarray(nrm), -1), atol=1e-4,
    )

    out = aug.rotate_perturbation_with_normal(key, pcd)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[:, 3:]), axis=-1), 1.0, atol=1e-5
    )

    # translate / isotropic scale leave the normal half untouched
    out = aug.translate(key, pcd)
    np.testing.assert_array_equal(np.asarray(out[:, 3:]), np.asarray(pcd[:, 3:]))
    out = aug.anisotropic_scale(key, pcd, isotropic=True)
    np.testing.assert_array_equal(np.asarray(out[:, 3:]), np.asarray(pcd[:, 3:]))


def test_batch_augment_adapts_to_channels():
    cfg = _cfg()
    fn = make_batch_augment(cfg.train.dataloader.data_augmentation)
    key = jax.random.key(1)
    out3 = fn(key, jnp.zeros((2, 32, 3)))
    assert out3.shape == (2, 32, 3)
    rng = np.random.default_rng(1)
    nrm = rng.normal(size=(2, 32, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    batch6 = jnp.asarray(
        np.concatenate([rng.normal(size=(2, 32, 3)), nrm], -1).astype(np.float32)
    )
    out6 = fn(key, batch6)
    assert out6.shape == (2, 32, 6)
    # every branch keeps normals unit-length up to jitter's clip bound
    norms = np.linalg.norm(np.asarray(out6[..., 3:]), axis=-1)
    assert np.all(norms > 0.8) and np.all(norms < 1.2)


def test_cls_train_step_on_6ch_clouds():
    cfg = _cfg()
    check_config(cfg)  # validates the conv1_in=12 invariant
    ds = synthetic_modelnet(16, num_points=128, with_normals=True)
    assert ds.pcd.shape[-1] == 6
    loader = BatchLoader(ds.pcd, ds.label, batch_size=4, selected_points=64)
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=len(loader))
    state = create_train_state(
        model, (np.zeros((4, 64, 6), np.float32),), tx, jax.random.key(0)
    )
    step = make_train_step(
        model, cfg, "cls", 40,
        augment_fn=make_batch_augment(cfg.train.dataloader.data_augmentation),
    )
    for batch in loader:
        state, out = step(state, (batch[0], batch[1]), jax.random.key(1))
        assert np.isfinite(float(out["loss"]))
        break
