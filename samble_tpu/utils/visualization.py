"""Sampling-introspection visualization.

The reference *references* visualization utilities that are absent from its
repo (train_modelnet.py:109-155 copies utils/visualization.py and
visualization_data_processing.py, which do not exist — SURVEY.md §4); its
eval scripts gather per-layer scores/indices/bin data for them
(test_shapenet.py:278-334).  This module provides a working equivalent over
this framework's fixed-shape introspection dumps
(``introspect=true`` in the test CLIs → ``introspection.npz``):

  * per-cloud renders of the attention point score,
  * kept-vs-dropped sampling decisions per downsample layer,
  * bin assignments, and per-bin sample-count bars,
  * the host-side ragged per-bin index chunks the reference builds on-GPU
    (models/downsample.py:346-362).

Everything renders headless (Agg) to PNG.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def bin_index_chunks(bin_points_mask: np.ndarray) -> List[List[np.ndarray]]:
    """Ragged per-(cloud, bin) point-index lists from the fixed-shape mask.

    :param bin_points_mask: (B, 1, N, num_bins) or (B, N, num_bins) bool
    :returns: ``chunks[b][j]`` = int array of point ids in bin j of cloud b
        (the reference's ``idx_chunks``, models/downsample.py:346-362).
    """
    m = np.asarray(bin_points_mask)
    if m.ndim == 4:
        m = m[:, 0]
    return [
        [np.nonzero(m[b, :, j])[0] for j in range(m.shape[-1])]
        for b in range(m.shape[0])
    ]


def _scatter3(ax, xyz, c, s=4, cmap="viridis", vmin=None, vmax=None):
    return ax.scatter(
        xyz[:, 0], xyz[:, 1], xyz[:, 2], c=c, s=s, cmap=cmap,
        vmin=vmin, vmax=vmax, linewidths=0,
    )


def plot_attention_scores(
    xyz: np.ndarray, scores: np.ndarray, path: str, title: str = ""
) -> str:
    """One cloud colored by its attention point score.

    :param xyz: (N, 3);  scores: (N,)
    """
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    sc = _scatter3(ax, xyz, np.asarray(scores))
    fig.colorbar(sc, ax=ax, shrink=0.6, label="attention score")
    ax.set_title(title or "attention point score")
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_sampled_points(
    xyz: np.ndarray, idx: np.ndarray, path: str, title: str = ""
) -> str:
    """Kept (highlighted) vs dropped points of one downsample decision.

    :param xyz: (N, 3);  idx: (M,) kept point ids
    """
    n = xyz.shape[0]
    kept = np.zeros(n, bool)
    kept[np.asarray(idx)] = True
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(*xyz[~kept].T, c="lightgray", s=3, linewidths=0, label="dropped")
    ax.scatter(*xyz[kept].T, c="crimson", s=6, linewidths=0, label="kept")
    ax.legend(loc="upper right")
    ax.set_title(title or f"sampled {kept.sum()} / {n}")
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_bins(
    xyz: np.ndarray,
    bin_points_mask: np.ndarray,
    path: str,
    k_point_to_choose: Optional[np.ndarray] = None,
    title: str = "",
) -> str:
    """Bin assignment of one cloud (+ optional per-bin budget bars).

    :param xyz: (N, 3);  bin_points_mask: (N, num_bins) or (1, N, num_bins)
    """
    m = np.asarray(bin_points_mask)
    if m.ndim == 3:
        m = m[0]
    bin_id = np.argmax(m, axis=-1)
    nb = m.shape[-1]
    if k_point_to_choose is not None:
        fig = plt.figure(figsize=(9, 5))
        ax = fig.add_subplot(121, projection="3d")
    else:
        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(111, projection="3d")
    sc = _scatter3(ax, xyz, bin_id, cmap="tab10", vmin=0, vmax=max(nb - 1, 1))
    fig.colorbar(sc, ax=ax, shrink=0.6, ticks=range(nb), label="bin")
    ax.set_title(title or "score bins")
    ax.set_axis_off()
    if k_point_to_choose is not None:
        ax2 = fig.add_subplot(122)
        counts = m.sum(axis=0)
        width = 0.4
        xs = np.arange(nb)
        ax2.bar(xs - width / 2, counts, width, label="population")
        ax2.bar(xs + width / 2, np.asarray(k_point_to_choose), width,
                label="budget")
        ax2.set_xlabel("bin")
        ax2.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def visualize_introspection(
    npz_path: str,
    xyz: Optional[np.ndarray] = None,
    outdir: str = "viz",
    max_clouds: int = 4,
) -> List[str]:
    """Render the eval CLIs' ``introspection.npz`` into per-cloud PNGs.

    :param npz_path: from ``test_modelnet/shapenet ... introspect=true``
    :param xyz: (S, N, 3) evaluated clouds; None reads the ``points`` array
        the eval harness stores in the npz
    :returns: list of written files
    """
    os.makedirs(outdir, exist_ok=True)
    data: Dict[str, np.ndarray] = dict(np.load(npz_path))
    if xyz is None:
        xyz = data["points"][..., :3]
    layers = sorted({k.split("_", 1)[0] for k in data if k.startswith("layer")})
    written = []
    for b in range(min(max_clouds, xyz.shape[0])):
        # layer l sees the points selected by layers 0..l-1: chain the
        # index gathers exactly like the per-ds-layer mIoU remapping
        cloud = np.asarray(xyz[b])
        for layer in layers:
            score = data.get(f"{layer}_attention_point_score")
            idx = data.get(f"{layer}_idx")
            mask = data.get(f"{layer}_bin_points_mask")
            budget = data.get(f"{layer}_k_point_to_choose")
            if score is not None:
                s = score[b][0] if score[b].ndim == 2 else score[b]
                written.append(plot_attention_scores(
                    cloud, s,
                    os.path.join(outdir, f"cloud{b}_{layer}_score.png"),
                    f"cloud {b} {layer} score",
                ))
            if mask is not None:
                mb = mask[b][0] if mask[b].ndim == 3 else mask[b]
                written.append(plot_bins(
                    cloud, mb,
                    os.path.join(outdir, f"cloud{b}_{layer}_bins.png"),
                    budget[b] if budget is not None else None,
                    f"cloud {b} {layer} bins",
                ))
            if idx is not None:
                written.append(plot_sampled_points(
                    cloud, idx[b],
                    os.path.join(outdir, f"cloud{b}_{layer}_sampled.png"),
                    f"cloud {b} {layer} sampling",
                ))
                cloud = cloud[np.asarray(idx[b])]
    return written
