"""Datasets: ModelNet40 and ShapeNet-part HDF5 archives, in-RAM.

Reference: utils/dataloader.py — ``ModelNet`` (:357-510), ``ShapeNet``
(:42-212), download helpers (:21-39, :341-354).  Both datasets fit in RAM
(<0.5 GB); loading is a one-shot numpy concat, and everything per-step
(subsampling, augmentation, one-hots) happens on device.

``synthetic_modelnet`` / ``synthetic_shapenet`` generate structured random
clouds for tests and benchmarks in network-less environments.
"""

from __future__ import annotations

import glob
import os
import urllib.request
import zipfile
from dataclasses import dataclass

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _download_and_unzip(url: str, saved_path: str, final_dir: str, inner_name: str):
    os.makedirs(saved_path, exist_ok=True)
    target = os.path.join(saved_path, final_dir)
    if os.path.exists(target):
        return target
    zip_name = os.path.basename(url)
    zip_path = os.path.join(saved_path, zip_name)
    urllib.request.urlretrieve(url, zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(saved_path)
    extracted = os.path.join(saved_path, inner_name)
    if extracted != target:
        os.rename(extracted, target)
    os.remove(zip_path)
    return target


def download_modelnet(url: str, saved_path: str) -> str:
    """Fetch modelnet40_ply_hdf5_2048 (utils/dataloader.py:341-354)."""
    return _download_and_unzip(
        url, saved_path, "modelnet40_ply_hdf5_2048", "modelnet40_ply_hdf5_2048"
    )


def download_shapenet(url: str, saved_path: str) -> str:
    """Fetch shapenet_part_seg_hdf5_data (utils/dataloader.py:21-39)."""
    return _download_and_unzip(
        url, saved_path, "shapenet_part_seg_hdf5_data", "hdf5_data"
    )


@dataclass
class ModelNetDataset:
    """All clouds + labels in RAM.

    :ivar pcd: (S, 2048, 3) float32
    :ivar label: (S,) int32 class ids (40 classes)
    """

    pcd: np.ndarray
    label: np.ndarray

    @classmethod
    def from_hdf5(cls, saved_path: str, partition: str) -> "ModelNetDataset":
        """partition: 'trainval' (all train files — ModelNet40 has no val
        split, utils/dataloader.py:424-447) or 'test'."""
        assert h5py is not None, "h5py required for HDF5 datasets"
        pat = "*train*.h5" if partition == "trainval" else "*test*.h5"
        files = sorted(
            glob.glob(os.path.join(saved_path, "modelnet40_ply_hdf5_2048", pat))
        )
        if not files:
            raise FileNotFoundError(
                f"no ModelNet40 h5 files under {saved_path} for {partition}"
            )
        pcds, labels = [], []
        for f in files:
            with h5py.File(f, "r") as h:
                pcds.append(h["data"][:].astype(np.float32))
                labels.append(h["label"][:].astype(np.int64)[:, 0])
        return cls(np.concatenate(pcds), np.concatenate(labels).astype(np.int32))

    def __len__(self):
        return self.label.shape[0]


@dataclass
class ShapeNetDataset:
    """All clouds + class and per-point part labels in RAM.

    :ivar pcd: (S, 2048, 3) float32
    :ivar label: (S,) int32 category ids (16)
    :ivar seg: (S, 2048) int32 part ids (50)
    """

    pcd: np.ndarray
    label: np.ndarray
    seg: np.ndarray

    @classmethod
    def from_hdf5(cls, saved_path: str, partition: str) -> "ShapeNetDataset":
        """partition: 'train' | 'val' | 'trainval' | 'test'
        (utils/dataloader.py:118-131)."""
        assert h5py is not None, "h5py required for HDF5 datasets"
        base = os.path.join(saved_path, "shapenet_part_seg_hdf5_data")
        if partition == "trainval":
            files = sorted(glob.glob(os.path.join(base, "*train*.h5"))) + sorted(
                glob.glob(os.path.join(base, "*val*.h5"))
            )
        else:
            files = sorted(glob.glob(os.path.join(base, f"*{partition}*.h5")))
        if not files:
            raise FileNotFoundError(
                f"no ShapeNet h5 files under {saved_path} for {partition}"
            )
        pcds, labels, segs = [], [], []
        for f in files:
            with h5py.File(f, "r") as h:
                pcds.append(h["data"][:].astype(np.float32))
                labels.append(h["label"][:].astype(np.int64)[:, 0])
                segs.append(h["pid"][:].astype(np.int64))
        return cls(
            np.concatenate(pcds),
            np.concatenate(labels).astype(np.int32),
            np.concatenate(segs).astype(np.int32),
        )

    def __len__(self):
        return self.label.shape[0]


def _synthetic_normals(rng, pts: np.ndarray) -> np.ndarray:
    """Unit surface-normal stand-ins: radial direction from the cloud
    centroid, slightly perturbed (the reference keeps a normal-channel
    dataset option alive via ``shapenet_Normal`` / ``normal_channel``,
    utils/check_config.py:108-124, but ships no loader for it)."""
    d = pts - pts.mean(axis=0, keepdims=True)
    d = d + 0.05 * rng.normal(size=d.shape)
    return (d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)).astype(
        np.float32
    )


def synthetic_modelnet(
    num_samples: int, num_points: int = 2048, num_classes: int = 40,
    seed: int = 0, with_normals: bool = False,
) -> ModelNetDataset:
    """Structured random clouds: class-conditioned ellipsoid mixtures so a
    classifier can actually learn (used for tests/bench without network).
    ``with_normals`` appends unit pseudo-normals → (N, 6) clouds."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples).astype(np.int32)
    pcds = np.empty((num_samples, num_points, 6 if with_normals else 3),
                    np.float32)
    for i, c in enumerate(labels):
        crng = np.random.default_rng(1000 + int(c))
        centers = crng.uniform(-0.5, 0.5, (4, 3))
        scales = crng.uniform(0.1, 0.4, (4, 3))
        comp = rng.integers(0, 4, num_points)
        pts = centers[comp] + rng.normal(size=(num_points, 3)) * scales[comp]
        pts = np.clip(pts, -1, 1).astype(np.float32)
        if with_normals:
            pcds[i] = np.concatenate(
                [pts, _synthetic_normals(rng, pts)], axis=-1
            )
        else:
            pcds[i] = pts
    return ModelNetDataset(pcds, labels)


def synthetic_shapenet(
    num_samples: int,
    num_points: int = 2048,
    num_categories: int = 16,
    num_parts: int = 50,
    seed: int = 0,
    with_normals: bool = False,
) -> ShapeNetDataset:
    """Random clouds with geometry-correlated part labels (z-sliced).
    ``with_normals`` appends unit pseudo-normals → (N, 6) clouds (the
    reference's ``shapenet_Normal`` dataset option)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_categories, num_samples).astype(np.int32)
    # parts per category mirroring the real 2-6 part counts
    parts_per_cat = [
        [0, 1, 2, 3], [4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14, 15],
        [16, 17, 18], [19, 20, 21], [22, 23], [24, 25, 26, 27], [28, 29],
        [30, 31, 32, 33, 34, 35], [36, 37], [38, 39, 40], [41, 42, 43],
        [44, 45, 46], [47, 48, 49],
    ]
    pcds = np.empty((num_samples, num_points, 6 if with_normals else 3),
                    np.float32)
    segs = np.empty((num_samples, num_points), np.int32)
    for i, c in enumerate(labels):
        pts = rng.uniform(-1, 1, (num_points, 3)).astype(np.float32)
        parts = parts_per_cat[int(c) % len(parts_per_cat)]
        z = pts[:, 2]
        bins = np.quantile(z, np.linspace(0, 1, len(parts) + 1)[1:-1])
        segs[i] = np.asarray(parts, np.int32)[np.digitize(z, bins)]
        if with_normals:
            pcds[i] = np.concatenate(
                [pts, _synthetic_normals(rng, pts)], axis=-1
            )
        else:
            pcds[i] = pts
    return ShapeNetDataset(pcds, labels, segs)
