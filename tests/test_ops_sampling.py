"""Tests for the static-shape Gumbel per-bin sampler and FPS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import ops
from samble_tpu.ops.sampling import rank_within_bins


def _setup(rng, B=3, N=48, nb=4, M=24):
    scores = rng.normal(size=(B, 1, N)).astype(np.float32) ** 2  # nonnegative
    bin_id = rng.integers(0, nb, size=(B, N))
    mask = np.zeros((B, 1, N, nb), bool)
    for b in range(B):
        mask[b, 0, np.arange(N), bin_id[b]] = True
    # budgets: proportional then clipped, summing to M
    counts = np.stack([np.bincount(bin_id[b], minlength=nb) for b in range(B)])
    k = np.minimum(counts, M // nb)
    for b in range(B):
        while k[b].sum() < M:
            slack = counts[b] - k[b]
            k[b, np.argmax(slack)] += 1
    return scores, mask, bin_id, counts, k.astype(np.int32)


def test_rank_within_bins():
    rng = np.random.default_rng(0)
    pert = rng.normal(size=(2, 20)).astype(np.float32)
    bin_id = rng.integers(0, 3, size=(2, 20)).astype(np.int32)
    rank, grank = rank_within_bins(jnp.asarray(pert), jnp.asarray(bin_id), 3)
    rank, grank = np.asarray(rank), np.asarray(grank)
    for b in range(2):
        order = np.argsort(-pert[b])
        np.testing.assert_array_equal(grank[b][order], np.arange(20))
        for j in range(3):
            members = np.flatnonzero(bin_id[b] == j)
            mem_order = members[np.argsort(-pert[b][members])]
            np.testing.assert_array_equal(rank[b][mem_order], np.arange(len(members)))


@pytest.mark.parametrize("mode", ["topk", "uniform", "random"])
def test_sampler_counts_and_order(mode):
    rng = np.random.default_rng(1)
    scores, mask, bin_id, counts, k = _setup(rng)
    B, _, N, nb = mask.shape
    M = int(k[0].sum())
    idx = ops.generate_downsampled_index(
        jax.random.key(0), M, jnp.asarray(scores), jnp.asarray(mask),
        jnp.asarray(k), mode, 0.1,
    )
    idx = np.asarray(idx)
    assert idx.shape == (B, M)
    for b in range(B):
        # distinct indices
        assert len(set(idx[b].tolist())) == M
        # exactly k[b, j] samples from bin j, in bin order
        chosen_bins = bin_id[b][idx[b]]
        np.testing.assert_array_equal(
            np.bincount(chosen_bins, minlength=nb), k[b]
        )
        assert (np.diff(chosen_bins) >= 0).all(), "output must be bin-ordered"


def test_topk_picks_best_scores_per_bin():
    rng = np.random.default_rng(2)
    scores, mask, bin_id, counts, k = _setup(rng)
    M = int(k[0].sum())
    idx = np.asarray(
        ops.generate_downsampled_index(
            jax.random.key(0), M, jnp.asarray(scores), jnp.asarray(mask),
            jnp.asarray(k), "topk", 0.1,
        )
    )
    for b in range(scores.shape[0]):
        for j in range(mask.shape[-1]):
            members = np.flatnonzero(bin_id[b] == j)
            best = set(members[np.argsort(-scores[b, 0][members])][: k[b, j]].tolist())
            got = set(idx[b][bin_id[b][idx[b]] == j].tolist())
            assert got == best


def test_uniform_sampler_is_unbiased():
    # one bin, uniform mode: each point should be selected ~ M/N of the time
    B, N, M, trials = 1, 16, 8, 600
    scores = jnp.ones((B, 1, N), jnp.float32)
    mask = jnp.ones((B, 1, N, 1), bool)
    k = jnp.full((B, 1), M, jnp.int32)
    hits = np.zeros(N)
    for t in range(trials):
        idx = ops.generate_downsampled_index(
            jax.random.key(t), M, scores, mask, k, "uniform", 1.0
        )
        hits[np.asarray(idx[0])] += 1
    freq = hits / trials
    # expected 0.5; loose 4-sigma bound for binomial(600, .5)/600 ≈ 0.02 std
    assert np.abs(freq - M / N).max() < 0.09


def test_random_sampler_matches_boltzmann_marginals():
    # single bin, N=2 style analytic check generalized: N=8, k=1 →
    # selection probability ∝ exp(logit)
    N, trials = 8, 4000
    rng = np.random.default_rng(3)
    s = rng.normal(size=(1, 1, N)).astype(np.float32)
    mask = jnp.ones((1, 1, N, 1), bool)
    k = jnp.ones((1, 1), jnp.int32)
    z = (s - s.mean()) / s.std()
    logit = np.tanh(z)[0, 0] / 0.5  # boltzmann_t = 0.5
    p_ref = np.exp(logit) / np.exp(logit).sum()
    hits = np.zeros(N)
    sample = jax.jit(
        lambda key: ops.generate_downsampled_index(
            key, 1, jnp.asarray(s), mask, k, "random", 0.5
        )
    )
    for t in range(trials):
        hits[int(sample(jax.random.key(t))[0, 0])] += 1
    p_emp = hits / trials
    assert np.abs(p_emp - p_ref).max() < 0.03


def test_fps_spreads_points():
    rng = np.random.default_rng(4)
    # two well-separated clusters; FPS with npoint=2 must pick one from each
    a = rng.normal(size=(1, 10, 3)).astype(np.float32) * 0.01
    b = a + 10.0
    xyz = np.concatenate([a, b], axis=1)
    idx = np.asarray(ops.farthest_point_sample(jax.random.key(0), jnp.asarray(xyz), 2))
    assert (idx[0] < 10).sum() == 1
    x_ds, idx2 = ops.fps(jax.random.key(0), jnp.asarray(xyz), jnp.asarray(xyz), 4)
    assert x_ds.shape == (1, 4, 3)
    assert len(set(np.asarray(idx2)[0].tolist())) == 4


def test_sort_chunk_ragged_matches_torch_chunk_semantics():
    """N not divisible by num_bins: torch.chunk semantics (utils/ops.py:
    239-259) — ceil-sized chunks with a shorter tail, as a ragged list."""
    import numpy as np

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(2, 1, 10)).astype(np.float32))
    x_chunks, idx_chunks = ops.sort_chunk(scores, 4)
    assert isinstance(x_chunks, list)
    assert [c.shape[-1] for c in x_chunks] == [3, 3, 3, 1]
    flat = np.concatenate([np.asarray(c) for c in x_chunks], axis=-1)
    np.testing.assert_array_equal(flat, np.sort(np.asarray(scores), axis=-1))
    # indices recover the sorted values
    for xc, ic in zip(x_chunks, idx_chunks):
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(scores), np.asarray(ic), axis=-1),
            np.asarray(xc),
        )
    # bins == 4 but only ceil fits in 3 chunks: num_bins=4 over N=7 gives
    # ceil=2 → chunks [2,2,2,1]; over N=4 with 6 bins torch yields 4 chunks
    xc, _ = ops.sort_chunk(jnp.ones((1, 1, 4)), 6)
    assert [c.shape[-1] for c in xc] == [1, 1, 1, 1]
