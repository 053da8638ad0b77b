"""HDF5 dataset loading against miniature archives in the reference layout.

The real archives can't be downloaded in this environment, so these tests
generate tiny .h5 files with the exact dataset/shape/dtype conventions of
modelnet40_ply_hdf5_2048 and shapenet_part_seg_hdf5_data
(utils/dataloader.py:357-510, :42-212) and exercise the loaders' globbing,
partition logic, concatenation and dtype handling.
"""

import os

import h5py
import numpy as np
import pytest

from samble_tpu.data.datasets import ModelNetDataset, ShapeNetDataset


def _write_modelnet(dirpath, name, n_samples, n_points=32):
    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    with h5py.File(os.path.join(dirpath, name), "w") as h:
        h["data"] = rng.normal(size=(n_samples, n_points, 3)).astype(np.float32)
        h["label"] = rng.integers(0, 40, (n_samples, 1)).astype(np.uint8)


def _write_shapenet(dirpath, name, n_samples, n_points=32):
    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    with h5py.File(os.path.join(dirpath, name), "w") as h:
        h["data"] = rng.normal(size=(n_samples, n_points, 3)).astype(np.float32)
        h["label"] = rng.integers(0, 16, (n_samples, 1)).astype(np.uint8)
        h["pid"] = rng.integers(0, 50, (n_samples, n_points)).astype(np.uint8)


def test_modelnet_from_hdf5(tmp_path):
    d = tmp_path / "modelnet40_ply_hdf5_2048"
    d.mkdir()
    _write_modelnet(str(d), "ply_data_train0.h5", 5)
    _write_modelnet(str(d), "ply_data_train1.h5", 3)
    _write_modelnet(str(d), "ply_data_test0.h5", 4)
    train = ModelNetDataset.from_hdf5(str(tmp_path), "trainval")
    test = ModelNetDataset.from_hdf5(str(tmp_path), "test")
    assert len(train) == 8 and len(test) == 4
    assert train.pcd.shape == (8, 32, 3) and train.pcd.dtype == np.float32
    assert train.label.dtype == np.int32
    assert (train.label >= 0).all() and (train.label < 40).all()


def test_shapenet_from_hdf5_partitions(tmp_path):
    d = tmp_path / "shapenet_part_seg_hdf5_data"
    d.mkdir()
    _write_shapenet(str(d), "ply_data_train0.h5", 5)
    _write_shapenet(str(d), "ply_data_val0.h5", 2)
    _write_shapenet(str(d), "ply_data_test0.h5", 3)
    assert len(ShapeNetDataset.from_hdf5(str(tmp_path), "train")) == 5
    assert len(ShapeNetDataset.from_hdf5(str(tmp_path), "val")) == 2
    assert len(ShapeNetDataset.from_hdf5(str(tmp_path), "trainval")) == 7
    test = ShapeNetDataset.from_hdf5(str(tmp_path), "test")
    assert len(test) == 3
    assert test.seg.shape == (3, 32) and test.seg.dtype == np.int32


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        ModelNetDataset.from_hdf5(str(tmp_path), "trainval")
    with pytest.raises(FileNotFoundError):
        ShapeNetDataset.from_hdf5(str(tmp_path), "test")
