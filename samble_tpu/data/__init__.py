from samble_tpu.data.augmentation import (
    jitter,
    rotate,
    translate,
    anisotropic_scale,
    make_batch_augment,
)
from samble_tpu.data.datasets import (
    ModelNetDataset,
    ShapeNetDataset,
    synthetic_modelnet,
    synthetic_shapenet,
    download_modelnet,
    download_shapenet,
)
from samble_tpu.data.pipeline import BatchLoader

__all__ = [
    "jitter",
    "rotate",
    "translate",
    "anisotropic_scale",
    "make_batch_augment",
    "ModelNetDataset",
    "ShapeNetDataset",
    "synthetic_modelnet",
    "synthetic_shapenet",
    "download_modelnet",
    "download_shapenet",
    "BatchLoader",
]
