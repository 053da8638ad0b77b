"""Unit tests for kNN / grouping ops against independent numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import ops


def _np_knn(a, b, k):
    """Independent numpy oracle for the reference kNN semantics
    (normalize by a's mean and mean-channel-std, then -cdist topk)."""
    a_mean = a.mean(axis=1, keepdims=True)
    a = a - a_mean
    b = b - a_mean
    a_std = a.std(axis=1, keepdims=True, ddof=1).mean(axis=2, keepdims=True)
    a = a / a_std
    b = b / a_std
    d = np.linalg.norm(a[:, :, None, :] - b[:, None, :, :], axis=-1)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    dist = -np.take_along_axis(d, idx, axis=-1)
    return dist, idx


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_knn_matches_numpy_oracle(rng):
    a = rng.normal(size=(2, 64, 8)).astype(np.float32)
    b = rng.normal(size=(2, 48, 8)).astype(np.float32)
    dist, idx = jax.jit(lambda x, y: ops.knn(x, y, 5))(a, b)
    ref_dist, ref_idx = _np_knn(a, b, 5)
    np.testing.assert_allclose(np.asarray(dist), ref_dist, rtol=2e-4, atol=2e-5)
    # indices can differ on exact ties; distances must agree regardless
    d_at_idx = np.take_along_axis(
        np.linalg.norm(
            _norm(a, b)[0][:, :, None, :] - _norm(a, b)[1][:, None, :, :], axis=-1
        ),
        np.asarray(idx),
        axis=-1,
    )
    np.testing.assert_allclose(-d_at_idx, ref_dist, rtol=2e-4, atol=2e-5)


def _norm(a, b):
    a_mean = a.mean(axis=1, keepdims=True)
    a = a - a_mean
    b = b - a_mean
    a_std = a.std(axis=1, keepdims=True, ddof=1).mean(axis=2, keepdims=True)
    return a / a_std, b / a_std


def test_self_knn_first_neighbor_is_self(rng):
    x = rng.normal(size=(3, 32, 4)).astype(np.float32)
    _, idx = ops.knn(x, x, 4)
    np.testing.assert_array_equal(
        np.asarray(idx[..., 0]), np.broadcast_to(np.arange(32), (3, 32))
    )


def test_index_points_gathers(rng):
    pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5, 4)).astype(np.int32)
    out = ops.index_points(pts, idx)
    assert out.shape == (2, 5, 4, 3)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out[b]), pts[b][idx[b]])


def test_group_modes(rng):
    x = rng.normal(size=(2, 20, 6)).astype(np.float32)
    for mode, ch in [
        ("neighbor", 6),
        ("diff", 6),
        ("center_neighbor", 12),
        ("center_diff", 12),
    ]:
        out, idx = ops.group(x, 4, mode)
        assert out.shape == (2, 20, 4, ch), mode
        assert idx.shape == (2, 20, 4)
    # diff = neighbor - center
    nb, idx = ops.group(x, 4, "neighbor")
    df, _ = ops.group(x, 4, "diff")
    np.testing.assert_allclose(
        np.asarray(df), np.asarray(nb) - x[:, :, None, :], rtol=1e-6
    )
    # center_diff = [center | diff]
    cd, _ = ops.group(x, 4, "center_diff")
    np.testing.assert_allclose(np.asarray(cd[..., :6]), np.broadcast_to(
        x[:, :, None, :], (2, 20, 4, 6)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cd[..., 6:]), np.asarray(df), rtol=1e-6)


def test_neighbor_mask_rows_have_k_ones(rng):
    x = rng.normal(size=(2, 30, 3)).astype(np.float32)
    mask = ops.neighbor_mask(x, 5)
    assert mask.shape == (2, 30, 30)
    np.testing.assert_array_equal(np.asarray(mask.sum(-1)), np.full((2, 30), 5.0))
    # mask rows match knn indices
    _, idx = ops.knn(x, x, 5)
    for b in range(2):
        for i in range(30):
            row = set(np.flatnonzero(np.asarray(mask[b, i])))
            assert row == set(np.asarray(idx[b, i]).tolist())


def test_select_neighbors_interpolate_distances_positive(rng):
    unknown = rng.normal(size=(2, 16, 3)).astype(np.float32)
    known = rng.normal(size=(2, 8, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 8, 7)).astype(np.float32)
    nb, idx, d = ops.select_neighbors_interpolate(unknown, known, feats, k=3)
    assert nb.shape == (2, 16, 3, 7)
    assert (np.asarray(d) >= 0).all()
    # neighbors are gathered features
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(nb[b]), feats[b][np.asarray(idx[b])])


def test_l2_global(rng):
    q = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    k = rng.normal(size=(1, 2, 7, 4)).astype(np.float32)
    out = ops.l2_global(q, k)
    ref = ((q[:, :, :, None, :] - k[:, :, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_norm_range_modes(rng):
    x = rng.normal(size=(2, 3, 10)).astype(np.float32)
    mm = ops.norm_range(x, axis=-1, n_min=0.5, n_max=1.0, mode="minmax")
    assert np.asarray(mm).min() >= 0.5 - 1e-6 and np.asarray(mm).max() <= 1.0 + 1e-6
    th = ops.norm_range(x, axis=-1, n_min=0.0, n_max=1.0, mode="tanh")
    # XLA's tanh is a rational approximation; ~1e-3 relative vs numpy
    np.testing.assert_allclose(np.asarray(th), (np.tanh(x) + 1) / 2, rtol=2e-3, atol=3e-5)
    zs = ops.norm_range(x, axis=-1, n_min=0.0, mode="z-score")
    np.testing.assert_allclose(np.asarray(zs).mean(-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zs).std(-1), 1.0, rtol=1e-5)


def test_gather_by_idx(rng):
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 6)).astype(np.int32)
    out = ops.gather_by_idx(x, idx)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(out[b]), x[b][idx[b]])


def test_knn_gradient_finite_at_zero_distance(rng):
    """d(sqrt)/d(sq) → ∞ at sq == 0: self-distances and interpolation
    queries that coincide with known points hit this on every forward.
    Regression for the seg-model NaN (UpSampleInterpolation backprops
    through knn distances into the STN-transformed xyz)."""
    import jax
    import jax.numpy as jnp

    known = rng.normal(size=(2, 8, 3)).astype(np.float32)
    # queries contain the known points themselves (exact zero distances)
    unknown = np.concatenate([known, rng.normal(size=(2, 8, 3)).astype(np.float32)], 1)

    def loss(unknown, known):
        d, _ = ops.knn(jnp.asarray(unknown), jnp.asarray(known), 3)
        return jnp.sum(d)

    g_u, g_k = jax.grad(loss, argnums=(0, 1))(unknown, known)
    assert bool(jnp.isfinite(g_u).all()) and bool(jnp.isfinite(g_k).all())
    # values still match the positive-distance convention (up to f32
    # cancellation noise in the ‖a‖²-2ab+‖b‖² expansion)
    d, _ = ops.knn(jnp.asarray(unknown), jnp.asarray(known), 1)
    np.testing.assert_allclose(np.asarray(d[:, :8, 0]), 0.0, atol=2e-3)
