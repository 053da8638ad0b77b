"""Visualization subsystem: the reference references visualization utils it
never shipped (SURVEY.md §4); these tests exercise the working equivalent
over synthetic introspection data."""

import os

import numpy as np

from samble_tpu.utils.visualization import (
    bin_index_chunks,
    plot_attention_scores,
    plot_bins,
    plot_sampled_points,
    visualize_introspection,
)

N, M, NB = 64, 32, 4


def test_bin_index_chunks_roundtrip():
    rng = np.random.default_rng(0)
    bin_id = rng.integers(0, NB, (3, N))
    mask = np.eye(NB, dtype=bool)[bin_id][:, None]  # (3, 1, N, NB)
    chunks = bin_index_chunks(mask)
    assert len(chunks) == 3 and len(chunks[0]) == NB
    for b in range(3):
        got = np.sort(np.concatenate(chunks[b]))
        np.testing.assert_array_equal(got, np.arange(N))
        for j in range(NB):
            assert (bin_id[b][chunks[b][j]] == j).all()


def test_plot_helpers_write_pngs(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    p1 = plot_attention_scores(xyz, rng.normal(size=N), str(tmp_path / "s.png"))
    p2 = plot_sampled_points(xyz, rng.choice(N, M, replace=False),
                             str(tmp_path / "k.png"))
    mask = np.eye(NB, dtype=bool)[rng.integers(0, NB, N)]
    p3 = plot_bins(xyz, mask, str(tmp_path / "b.png"),
                   k_point_to_choose=np.array([8, 8, 8, 8]))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_visualize_introspection_end_to_end(tmp_path):
    """Synthesize a two-layer introspection dump in the eval CLI's layout
    and render it; layer-1 arrays must chain through layer-0's indices."""
    rng = np.random.default_rng(2)
    s, n0, m0, m1 = 2, N, M, M // 2
    xyz = rng.normal(size=(s, n0, 3)).astype(np.float32)
    data = {
        "layer0_attention_point_score": rng.normal(size=(s, 1, n0)),
        "layer0_idx": np.stack([rng.choice(n0, m0, replace=False) for _ in range(s)]),
        "layer0_bin_points_mask": np.eye(NB, dtype=bool)[rng.integers(0, NB, (s, n0))][:, None],
        "layer0_k_point_to_choose": np.full((s, NB), m0 // NB),
        "layer1_attention_point_score": rng.normal(size=(s, 1, m0)),
        "layer1_idx": np.stack([rng.choice(m0, m1, replace=False) for _ in range(s)]),
        "layer1_bin_points_mask": np.eye(NB, dtype=bool)[rng.integers(0, NB, (s, m0))][:, None],
        "layer1_k_point_to_choose": np.full((s, NB), m1 // NB),
    }
    npz = str(tmp_path / "introspection.npz")
    np.savez_compressed(npz, **data)
    written = visualize_introspection(npz, xyz, str(tmp_path / "viz"),
                                      max_clouds=2)
    # 2 clouds × 2 layers × 3 figures
    assert len(written) == 12
    for p in written:
        assert os.path.getsize(p) > 1000
