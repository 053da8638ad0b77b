"""Unit tests for the SAMBLE bin machinery."""

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu import ops
from samble_tpu.ops.attention import attention_point_score, zscore
from samble_tpu.ops.bins import boundaries_to_upper_lower


def test_boundaries_from_scores_are_descending_quantiles():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(4, 1, 120)).astype(np.float32)
    nb = 6
    b = ops.compute_bin_boundaries_from_scores(jnp.asarray(s), nb)
    flat = np.sort(s.reshape(-1))[::-1]
    idx = (np.arange(1, nb) / nb * flat.size).astype(int)
    np.testing.assert_allclose(np.asarray(b), flat[idx], rtol=1e-6)
    assert (np.diff(np.asarray(b)) <= 0).all()


def test_bin_partition_masks_partition_points():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(3, 1, 60)).astype(np.float32)
    nb = 4
    bounds = jnp.asarray([0.7, 0.0, -0.7], jnp.float32)
    new_bounds, mask = ops.bin_partition(
        jnp.asarray(s), bounds, nb, dynamic=False, momentum=0.99, update=False
    )
    np.testing.assert_array_equal(np.asarray(new_bounds), np.asarray(bounds))
    m = np.asarray(mask)
    # every point is in exactly one bin
    np.testing.assert_array_equal(m.sum(-1), np.ones((3, 1, 60)))
    # bin order: bin 0 holds the highest z-scores
    z = np.asarray(zscore(jnp.asarray(s), axis=2))
    assert (z[m[..., 0]] >= 0.7).all()
    assert (z[m[..., nb - 1]] < -0.7).all()


def test_dynamic_update_moves_boundaries():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(2, 1, 600)).astype(np.float32))
    nb = 6
    b0 = jnp.zeros((nb - 1,), jnp.float32)
    b1, _ = ops.bin_partition(s, b0, nb, dynamic=True, momentum=0.5, update=True)
    target = ops.compute_bin_boundaries_from_scores(zscore(s, axis=2), nb)
    np.testing.assert_allclose(np.asarray(b1), 0.5 * np.asarray(target), rtol=1e-5)
    # eval mode: no update
    b2, _ = ops.bin_partition(s, b0, nb, dynamic=True, momentum=0.5, update=False)
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b0))


def test_upper_lower_padding():
    b = jnp.asarray([2.0, 1.0, -1.0])
    up, lo = boundaries_to_upper_lower(b, 4)
    assert np.asarray(up)[0] == np.inf and np.asarray(lo)[-1] == -np.inf
    np.testing.assert_array_equal(np.asarray(up)[1:], np.asarray(b))
    np.testing.assert_array_equal(np.asarray(lo)[:-1], np.asarray(b))


def test_water_filling_respects_capacity_and_total():
    rng = np.random.default_rng(4)
    B, nb, M = 5, 6, 64
    prob = jnp.asarray(rng.uniform(0.0, 1.0, size=(B, nb)).astype(np.float32))
    maxn = jnp.asarray(
        rng.multinomial(128, [1 / nb] * nb, size=B).astype(np.int32)
    )
    k = ops.calculate_num_points_to_choose(prob, maxn, M)
    k = np.asarray(k)
    assert (k >= 0).all()
    np.testing.assert_array_equal(k.sum(1), np.full(B, M))
    assert (k <= np.asarray(maxn)).all()


def test_water_filling_zero_weight_bins_still_fill_when_needed():
    # all weight on bin 0 which has few points: budget must spill over
    prob = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    maxn = jnp.asarray([[10, 30, 30, 30]], jnp.int32)
    k = np.asarray(ops.calculate_num_points_to_choose(prob, maxn, 40))
    assert k[0, 0] == 10
    assert k.sum() == 40
    assert (k <= np.asarray(maxn)).all()


def test_bin_weights_calculation_orders():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(2, 1, 50, 4)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(2, 1, 50, 4)) < 0.5)
    w_mr, before_mr = ops.bin_weights_calculation(a, mask, "mean_relu")
    w_rm, before_rm = ops.bin_weights_calculation(a, mask, "relu_mean")
    an, mn = np.asarray(a), np.asarray(mask)
    cnt = mn.sum(2) + 1e-8
    ref_mr = (an * mn).sum(2) / cnt
    np.testing.assert_allclose(np.asarray(before_mr), ref_mr[:, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w_mr), np.maximum(ref_mr[:, 0], 0), rtol=1e-5)
    ref_rm = np.maximum(an * mn, 0).sum(2) / cnt
    np.testing.assert_allclose(np.asarray(w_rm), ref_rm[:, 0], rtol=1e-5)


def test_attention_point_score_modes():
    rng = np.random.default_rng(6)
    B, H, N, K = 2, 1, 24, 5
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32)
    attn = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask = np.asarray(ops.neighbor_mask(jnp.asarray(x), K))
    sparse = attn * mask[:, None]
    deg = mask.sum(-2)[:, None] + 1e-8
    expected = {
        "col_sum": attn.sum(-2),
        "row_std": attn.std(-1, ddof=1),
        "sparse_row_sum": sparse.sum(-1),
        "sparse_col_sum": sparse.sum(-2),
        "sparse_col_avg": sparse.sum(-2) / deg,
        "sparse_col_sqr": sparse.sum(-2) / deg / deg,
        "sparse_col_sum_sqr": 0.5 * sparse.sum(-2) / deg / deg + 0.5 * sparse.sum(-2),
    }
    for mode, ref in expected.items():
        got = attention_point_score(
            jnp.asarray(attn), jnp.asarray(mask), mode, K
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-6), mode
    # sparse_row_std: std over the K masked entries per row
    got = attention_point_score(jnp.asarray(attn), jnp.asarray(mask), "sparse_row_std", K)
    ref = np.zeros((B, H, N), np.float32)
    for b in range(B):
        for i in range(N):
            vals = attn[b, 0, i][mask[b, i] > 0]
            ref[b, 0, i] = vals.std(ddof=1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=1e-6)
