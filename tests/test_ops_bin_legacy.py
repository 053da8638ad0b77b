"""Legacy APES bin samplers (reference models/downsample.py:662-793).

Dead code in the shipped reference (no forward reaches them), rebuilt as
static-shape ops for older-config parity.  Tests check the structural
contract: exactly M distinct valid indices, per-bin budgets respected,
reference budget formula, replacement-count redistribution, output ordered
bin 0 first.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu.ops.sampling import (
    bin2_idx_selection,
    bin_idx_selection,
    _sorted_chunk_bins,
)

B, N, NB, M = 3, 48, 6, 16


def _scores():
    return jnp.asarray(np.random.default_rng(0).normal(size=(B, N)), jnp.float32)


def _bin_of(scores, idx, nb=NB):
    """Chunk id of each selected point, from the descending sort."""
    bin_id = _sorted_chunk_bins(scores, nb)[0]
    return np.take_along_axis(np.asarray(bin_id), np.asarray(idx), axis=1)


# realistic bin_prob: edge halves in [0.5, 1], inner mirrored as 1 - edge
# (models/downsample.py:650-657) — the budget formula assumes this shape
EDGE = [0.9, 0.7, 0.6]
BIN_PROB = EDGE + [1 - p for p in reversed(EDGE)]


@pytest.mark.parametrize("mode", ["topk", "uniform", "random"])
def test_bin_idx_selection_contract(mode):
    scores = _scores()
    bin_prob = jnp.broadcast_to(jnp.asarray(BIN_PROB, jnp.float32), (B, NB))
    idx, k = bin_idx_selection(
        jax.random.key(1), scores, NB, bin_prob, M, mode, 0.1
    )
    idx, k = np.asarray(idx), np.asarray(k)
    assert idx.shape == (B, M) and k.shape == (B, NB)
    # reference budget formula: int(2M/nb * p) per bin, last takes remainder
    per = [int(2 * M / NB * p) for p in BIN_PROB[:-1]]
    np.testing.assert_array_equal(
        k[:, :-1], np.broadcast_to(np.asarray(per), (B, NB - 1))
    )
    np.testing.assert_array_equal(k.sum(1), M)
    for b in range(B):
        assert len(set(idx[b].tolist())) == M  # distinct
        assert (idx[b] >= 0).all() and (idx[b] < N).all()
    # selected points honor their bin budgets and come out bin 0 first
    bins = _bin_of(scores, idx)
    for b in range(B):
        counts = np.bincount(bins[b], minlength=NB)
        np.testing.assert_array_equal(counts, k[b])
        assert (np.diff(bins[b]) >= 0).all()


def test_bin_idx_selection_topk_picks_best_in_bin():
    scores = _scores()
    bin_prob = jnp.broadcast_to(jnp.asarray(BIN_PROB, jnp.float32), (B, NB))
    idx, k = bin_idx_selection(
        jax.random.key(1), scores, NB, bin_prob, M, "topk", 0.1
    )
    s = np.asarray(scores)
    bin_id = _sorted_chunk_bins(scores, NB)[0]
    bin_id = np.asarray(bin_id)
    for b in range(B):
        for j in range(NB):
            members = np.where(bin_id[b] == j)[0]
            chosen = np.asarray(idx)[b][_bin_of(scores, idx)[b] == j]
            want = members[np.argsort(-s[b][members])][: len(chosen)]
            assert set(chosen.tolist()) == set(want.tolist())


def test_bin2_idx_selection_contract():
    scores = _scores()
    idx, k, bin_prob = bin2_idx_selection(jax.random.key(2), scores, NB, M, 0.5)
    idx, k, bin_prob = np.asarray(idx), np.asarray(k), np.asarray(bin_prob)
    chunk = N // NB
    assert idx.shape == (B, M)
    np.testing.assert_array_equal(k.sum(1), M)
    assert (k <= chunk).all() and (k >= 0).all()
    np.testing.assert_allclose(bin_prob, k / M)
    bins = _bin_of(scores, idx)
    for b in range(B):
        assert len(set(idx[b].tolist())) == M
        np.testing.assert_array_equal(np.bincount(bins[b], minlength=NB), k[b])


def test_bin2_redistribution_caps_at_chunk_size():
    """Low temperature concentrates all draws in one bin; overflow must
    cascade so no bin exceeds its population."""
    scores = _scores()
    m = 20  # > chunk size 8, forces overflow
    idx, k, _ = bin2_idx_selection(jax.random.key(3), scores, NB, m, 1e-4)
    k = np.asarray(k)
    assert (k <= N // NB).all()
    np.testing.assert_array_equal(k.sum(1), m)
    for b in range(B):
        assert len(set(np.asarray(idx)[b].tolist())) == m


def test_bin_samplers_non_divisible_n():
    """Shipped defaults use num_bins=6 at power-of-two N — the samplers must
    handle the ragged last chunk (torch.chunk semantics)."""
    rng = np.random.default_rng(5)
    n, nb, m = 50, 6, 20  # ceil(50/6)=9 -> chunks 9,9,9,9,9,5
    scores = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    bin_prob = jnp.broadcast_to(jnp.asarray(BIN_PROB, jnp.float32), (2, nb))
    idx, k = bin_idx_selection(jax.random.key(1), scores, nb, bin_prob, m,
                               "topk", 0.1)
    idx, k = np.asarray(idx), np.asarray(k)
    np.testing.assert_array_equal(k.sum(1), m)
    caps = np.asarray(_sorted_chunk_bins(scores, nb)[4])
    assert (k <= caps[None]).all()
    for b in range(2):
        assert len(set(idx[b].tolist())) == m
        np.testing.assert_array_equal(
            np.bincount(_bin_of(scores, idx, nb)[b], minlength=nb), k[b]
        )
    idx2, k2, _ = bin2_idx_selection(jax.random.key(2), scores, nb, m, 0.5)
    idx2, k2 = np.asarray(idx2), np.asarray(k2)
    np.testing.assert_array_equal(k2.sum(1), m)
    assert (k2 <= caps[None]).all()
    for b in range(2):
        assert len(set(idx2[b].tolist())) == m


def test_bin_idx_budgets_match_selection_when_saturated():
    """M > N/2 with saturated probs: clipped budgets are redistributed so
    k_counts always equals the realized per-bin composition."""
    rng = np.random.default_rng(6)
    n, nb, m = 48, 6, 30
    scores = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    bin_prob = jnp.ones((2, nb), jnp.float32)  # saturated
    idx, k = bin_idx_selection(jax.random.key(3), scores, nb, bin_prob, m,
                               "topk", 0.1)
    idx, k = np.asarray(idx), np.asarray(k)
    np.testing.assert_array_equal(k.sum(1), m)
    assert (k <= n // nb).all()
    for b in range(2):
        assert len(set(idx[b].tolist())) == m
        np.testing.assert_array_equal(
            np.bincount(_bin_of(scores, idx)[b], minlength=nb), k[b]
        )
