"""Native C++ batch producer (samble_tpu/native): build + semantics.

The native loader must be a faithful drop-in for the numpy BatchLoader:
same tuple layout, subsampling without replacement, pad-and-mask ragged
tails, deterministic for a fixed seed, and points/seg staying aligned.
"""

from __future__ import annotations

import numpy as np
import pytest

from samble_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


def _data(s=37, n0=50, c=3, seed=0, with_seg=False):
    rng = np.random.default_rng(seed)
    # encode (sample, point) identity in the values so provenance is checkable
    pcd = np.zeros((s, n0, c), np.float32)
    pcd[:, :, 0] = np.arange(s)[:, None]
    pcd[:, :, 1] = np.arange(n0)[None, :]
    pcd[:, :, 2:] = rng.normal(size=(s, n0, c - 2))
    label = np.arange(s, dtype=np.int32) % 7
    seg = (
        (np.arange(s)[:, None] * 1000 + np.arange(n0)[None, :]).astype(np.int32)
        if with_seg else None
    )
    return pcd, label, seg


def test_shapes_and_len():
    pcd, label, _ = _data()
    ld = native.NativeBatchLoader(
        pcd, label, batch_size=8, selected_points=20, drop_last=True, seed=1
    )
    assert len(ld) == 37 // 8
    batches = list(ld)
    assert len(batches) == len(ld)
    for points, lab, valid in batches:
        assert points.shape == (8, 20, 3)
        assert lab.shape == (8,)
        assert valid.all()


def test_subsample_without_replacement_and_provenance():
    pcd, label, _ = _data()
    ld = native.NativeBatchLoader(
        pcd, label, batch_size=8, selected_points=20, drop_last=True, seed=2
    )
    seen_samples = []
    for points, lab, valid in ld:
        for i in range(points.shape[0]):
            s_ids = np.unique(points[i, :, 0]).astype(int)
            assert s_ids.size == 1, "each row must come from ONE cloud"
            assert label[s_ids[0]] == lab[i]
            p_ids = points[i, :, 1].astype(int)
            assert np.unique(p_ids).size == p_ids.size, "no replacement"
            seen_samples.append(s_ids[0])
    # shuffled epoch covers distinct samples (drop_last trims the tail)
    assert len(set(seen_samples)) == len(seen_samples)


def test_ragged_tail_pad_and_mask():
    pcd, label, _ = _data(s=19)
    ld = native.NativeBatchLoader(
        pcd, label, batch_size=8, selected_points=20, shuffle=False,
        drop_last=False, seed=3,
    )
    assert len(ld) == 3
    batches = list(ld)
    *full, last = batches
    for _, _, valid in full:
        assert valid.all()
    assert last[2].sum() == 19 - 16
    assert not last[2][3:].any()


def test_seg_alignment():
    pcd, label, seg = _data(with_seg=True)
    ld = native.NativeBatchLoader(
        pcd, label, seg, batch_size=8, selected_points=20, seed=4
    )
    for points, lab, seg_b, valid in ld:
        s_ids = points[:, 0, 0].astype(int)
        p_ids = points[:, :, 1].astype(int)
        np.testing.assert_array_equal(
            seg_b, s_ids[:, None] * 1000 + p_ids,
            err_msg="seg labels must follow the same point subsample",
        )


def test_deterministic_per_seed_and_epoch_reshuffle():
    pcd, label, _ = _data()

    def collect(seed):
        ld = native.NativeBatchLoader(
            pcd, label, batch_size=8, selected_points=20, seed=seed
        )
        e1 = [p.copy() for p, *_ in ld]
        e2 = [p.copy() for p, *_ in ld]
        return e1, e2

    a1, a2 = collect(5)
    b1, _ = collect(5)
    for x, y in zip(a1, b1):
        np.testing.assert_array_equal(x, y)  # same seed → same epoch 1
    assert any((x != y).any() for x, y in zip(a1, a2))  # epochs reshuffle


def test_full_point_budget_passthrough():
    pcd, label, _ = _data(n0=20)
    ld = native.NativeBatchLoader(
        pcd, label, batch_size=8, selected_points=64, shuffle=False, seed=6
    )
    points, lab, valid = next(iter(ld))
    # n_sel clamps to N0 and passes points through in order
    assert points.shape == (8, 20, 3)
    np.testing.assert_array_equal(
        points[:, :, 1], np.broadcast_to(np.arange(20), (8, 20))
    )


def test_factory_falls_back():
    from samble_tpu.data.pipeline import BatchLoader

    pcd, label, _ = _data()
    ld = native.make_train_loader(
        pcd, label, batch_size=8, selected_points=20, native="off"
    )
    assert isinstance(ld, BatchLoader)
    ld = native.make_train_loader(
        pcd, label, batch_size=8, selected_points=20
    )
    assert isinstance(ld, native.NativeBatchLoader)
