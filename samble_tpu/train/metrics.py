"""Metrics: overall/category accuracy, shape/category mIoU.

Reference: utils/metrics.py (numpy).  The IoU computation here is fully
vectorized and device-friendly: a (num_categories, num_parts) membership
matrix replaces the per-shape Python loops of ``calculate_shape_IoU``
(utils/metrics.py:4-28), so per-batch IoUs can be computed inside the jitted
eval step; host code only aggregates scalars.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def parts_matrix(mapping: Any, num_categories: int = 16, num_parts: int = 50):
    """(num_categories, num_parts) bool: which part labels belong to each
    category (from the dataset mapping, configs/datasets/shapenet.yaml)."""
    m = np.zeros((num_categories, num_parts), bool)
    for entry in mapping.to_dict().values() if hasattr(mapping, "to_dict") else mapping.values():
        cid = entry["category_id"]
        for p in entry["parts_id"]:
            m[cid, p] = True
    return jnp.asarray(m)


def accuracy(preds: np.ndarray, labels: np.ndarray) -> float:
    """Overall accuracy (utils/metrics.py:55-57)."""
    return float(np.mean(preds == labels))


def category_accuracy(
    preds: np.ndarray, labels: np.ndarray, mapping: Any
) -> Dict[str, float]:
    """Per-category accuracy (utils/metrics.py:60-67)."""
    out = {}
    mp = mapping.to_dict() if hasattr(mapping, "to_dict") else mapping
    for cid, name in mp.items():
        idx = np.where(labels == int(cid))
        out[str(name)] = float(np.mean(preds[idx] == int(cid))) if len(idx[0]) else float("nan")
    return out


def shape_iou(
    preds: jax.Array,  # (B, N) int
    labels: jax.Array,  # (B, N) int
    category_id: jax.Array,  # (B,) int
    parts_mask: jax.Array,  # (num_categories, num_parts) bool
) -> jax.Array:
    """Per-shape part-averaged IoU with the U==0 ⇒ IoU=1 rule
    (utils/metrics.py:15-27).  Returns (B,) float32."""
    num_parts = parts_mask.shape[1]
    p_oh = jax.nn.one_hot(preds, num_parts, dtype=jnp.float32)  # (B, N, P)
    l_oh = jax.nn.one_hot(labels, num_parts, dtype=jnp.float32)
    inter = jnp.sum(p_oh * l_oh, axis=1)  # (B, P)
    union = jnp.sum(jnp.maximum(p_oh, l_oh), axis=1)  # (B, P)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 1.0)
    belongs = parts_mask[category_id].astype(jnp.float32)  # (B, P)
    return jnp.sum(iou * belongs, axis=1) / jnp.sum(belongs, axis=1)


def category_miou(
    shape_ious: np.ndarray, category_id: np.ndarray, mapping: Any
) -> Dict[str, float]:
    """Mean of per-shape IoUs within each category (utils/metrics.py:31-52)."""
    mp = mapping.to_dict() if hasattr(mapping, "to_dict") else mapping
    out = {}
    for entry in mp.values():
        cid, name = entry["category_id"], entry["category"]
        sel = shape_ious[category_id == cid]
        out[str(name)] = float(sel.mean()) if sel.size else float("nan")
    return out


def downsampled_iou_labels(
    preds: np.ndarray,  # (B, N)
    labels: np.ndarray,  # (B, N)
    ds_indices: Sequence[np.ndarray],  # per-layer (B, M_l) indices
):
    """Per-downsample-layer predictions/labels with cross-layer index
    remapping (train_shapenet.py:584-602): layer-l indices address layer
    l−1's point set, so they are composed before gathering."""
    outs = []
    idx_prev = None
    for ds_idx in ds_indices:
        idx = ds_idx if idx_prev is None else np.take_along_axis(idx_prev, ds_idx, axis=1)
        outs.append(
            (np.take_along_axis(preds, idx, axis=1),
             np.take_along_axis(labels, idx, axis=1))
        )
        idx_prev = idx
    return outs
