"""Differential tests: Pallas kernels (interpret mode) vs the pure-XLA ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samble_tpu import ops
from samble_tpu.ops.neighbors import _normalize_pair, mask_from_idx
from samble_tpu.ops.attention import attention_point_score
from samble_tpu.kernels.knn import knn_pallas
from samble_tpu.kernels.score import (
    FUSED_IDX_MODES,
    score_from_colsums,
    sparse_attention_score_pallas,
)


@pytest.mark.parametrize("n,m,c,k", [(64, 64, 8, 5), (96, 64, 16, 7)])
def test_knn_pallas_matches_xla(n, m, c, k):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, n, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, m, c)).astype(np.float32))
    ref_dist, ref_idx = ops.knn(a, b, k)
    an, bn = _normalize_pair(a, b)
    dist, idx = knn_pallas(an, bn, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(ref_dist), rtol=1e-4, atol=1e-5
    )
    # indices may differ only on exact distance ties
    same = np.asarray(idx) == np.asarray(ref_idx)
    if not same.all():
        d_sorted = np.asarray(ref_dist)
        mism = np.argwhere(~same)
        for b_, i_, k_ in mism:
            assert np.isclose(
                d_sorted[b_, i_, k_], np.asarray(dist)[b_, i_, k_], atol=1e-5
            )


def test_knn_pallas_self_query():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 128, 8)).astype(np.float32))
    xn, _ = _normalize_pair(x, x)
    _, idx = knn_pallas(xn, xn, 4, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(idx[0, :, 0]), np.arange(128)
    )


@pytest.mark.parametrize("idx_mode", list(FUSED_IDX_MODES))
def test_score_kernel_matches_xla(idx_mode):
    rng = np.random.default_rng(2)
    b, n, d, nb, kk = 2, 64, 16, 6, 8
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, n + nb, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    nb_idx = ops.knn(x, x, kk)[1]
    scale = 1.0 / np.sqrt(d)

    # XLA reference path: full maps
    energy = jnp.einsum("bnd,bmd->bnm", q, keys) * scale
    attn = jax.nn.softmax(energy, axis=-1)
    attention_points = attn[..., :n]
    mask = mask_from_idx(nb_idx, n)
    ref = attention_point_score(attention_points[:, None], mask, idx_mode, kk)[:, 0]

    cm, cf, cc = sparse_attention_score_pallas(q, keys, nb_idx, scale, interpret=True)
    got = score_from_colsums(cm, cf, cc, idx_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-6)


def test_score_kernel_nonaligned_shapes():
    # N not a multiple of 128 and tokens padding the key columns
    rng = np.random.default_rng(3)
    b, n, d, nb, kk = 1, 96, 8, 4, 5
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, n + nb, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    nb_idx = ops.knn(x, x, kk)[1]
    scale = 0.25
    energy = jnp.einsum("bnd,bmd->bnm", q, keys) * scale
    attn = jax.nn.softmax(energy, axis=-1)
    mask = mask_from_idx(nb_idx, n)
    ref = attention_point_score(attn[..., :n][:, None], mask, "sparse_col_sqr", kk)[:, 0]
    cm, cf, cc = sparse_attention_score_pallas(q, keys, nb_idx, scale, interpret=True)
    got = score_from_colsums(cm, cf, cc, "sparse_col_sqr")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("group_type",
                         ["center_diff", "center_neighbor", "diff", "neighbor"])
def test_fused_edgeconv_matches_gather(group_type):
    """Eval-mode fused EdgeConv (BN affine folded by submodule probing,
    one-hot MXU gather) vs the reference-shaped gather path, shared params."""
    import jax.numpy as jnp

    from samble_tpu.nn.embedding import EdgeConv

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 6)).astype(np.float32)
    gather = EdgeConv(k=8, group_type=group_type, conv1_out=16, conv2_out=16,
                      impl="gather", train=False)
    fused = EdgeConv(k=8, group_type=group_type, conv1_out=16, conv2_out=16,
                     impl="fused", train=False)
    train_mod = EdgeConv(k=8, group_type=group_type, conv1_out=16,
                         conv2_out=16, train=True)
    variables = train_mod.init({"params": jax.random.key(0)}, x)
    # push BN running stats off their init values so the affine fold is
    # actually exercised
    _, upd = train_mod.apply(variables, x, mutable=["batch_stats"])
    variables = {"params": variables["params"], **upd}
    out_g = gather.apply(variables, x)
    out_f = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_g), rtol=2e-4, atol=2e-5
    )


def test_knn_fast_fallback_boundaries():
    """knn_fast silently falls back to XLA outside the kernel's envelope
    (n < 256 or k > 128); both sides of each boundary must agree on the
    neighbor sets."""
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(7)
    for n, k in ((255, 8), (256, 8), (64, 8)):
        x = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
        d_fast, i_fast = nbr.knn_fast(x, x, k)
        d_ref, i_ref = nbr.knn(x, x, k)
        assert i_fast.shape == (2, n, k)
        match = (np.sort(np.asarray(i_fast), -1)
                 == np.sort(np.asarray(i_ref), -1)).mean()
        assert match > 0.999, f"n={n} k={k}: match {match}"


def test_fused_stn_matches_gather():
    """STN's grouped front through the fused EdgeConv kernel (submodule
    affine probing) vs the grouped XLA path, shared params."""
    from samble_tpu.nn.embedding import STN

    rng = np.random.default_rng(4)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    train_mod = STN(k=8, train=True)
    variables = train_mod.init({"params": jax.random.key(0),
                                "dropout": jax.random.key(1)}, xyz)
    # move BN running stats off init so the affine fold is exercised
    _, upd = train_mod.apply(variables, xyz, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(2)})
    variables = {"params": variables["params"], **upd}
    out_g = STN(k=8, impl="gather", train=False).apply(variables, xyz)
    out_f = STN(k=8, impl="fused", train=False).apply(variables, xyz)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_g), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("n,nb,kk", [(64, 6, 8), (96, 4, 5)])
def test_score_fused_matches_split_pipeline(n, nb, kk):
    """kNN-fused score kernel (threshold mask in-kernel) vs the split
    pipeline (kNN kernel → index-list mask rebuild): identical column sums."""
    from samble_tpu.kernels.score import sparse_attention_score_fused
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(8)
    b, d = 2, 16
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, n + nb, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, n, 8)).astype(np.float32))
    xn = nbr.knn_normalized(x)
    scale = float(1.0 / np.sqrt(d))

    nb_idx = knn_pallas(xn, xn, kk, interpret=True)[1]
    want = sparse_attention_score_pallas(q, keys, nb_idx, scale,
                                         interpret=True)
    got = sparse_attention_score_fused(q, keys, xn, kk, scale,
                                       interpret=True)
    for name, a, b_ in zip(("colsum_m", "colsum_f", "colcnt"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6, err_msg=name
        )


def test_kth_smallest_key_fast_matches_extraction():
    """Bisection+adaptive-tail selection vs plain K-round extraction —
    exact equality, including duplicate-heavy rows and INTMAX padding."""
    from samble_tpu.kernels import keys as keys_mod

    rng = np.random.default_rng(11)
    for k in (1, 8, 32):
        rows = []
        # random unique-ish keys
        rows.append(rng.integers(0, 2**30, size=512))
        # heavy duplicates in the value bits (packed col idx keeps keys unique)
        dup = np.repeat(rng.integers(0, 2**20, size=16), 32)
        rows.append(dup)
        # padded tail
        padded = np.concatenate(
            [rng.integers(0, 2**28, size=256),
             np.full(256, keys_mod.INTMAX, np.int64)]
        )
        rows.append(padded)
        # narrow value range
        rows.append(rng.integers(1000, 1030, size=512) * 1024
                    + np.arange(512))
        key = np.stack([r[:512] for r in rows]).astype(np.int64)
        # make keys unique per row the way packing does (low bits = column)
        key = ((key >> 10) << 10) + np.arange(512)[None, :]
        key = np.minimum(key, keys_mod.INTMAX).astype(np.int32)
        kj = jnp.asarray(key)
        want = np.asarray(keys_mod.kth_smallest_key(kj, k))
        got = np.asarray(keys_mod.kth_smallest_key_fast(kj, k))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")
        # oracle: numpy partition
        ref = np.sort(key, axis=1)[:, k - 1:k]
        np.testing.assert_array_equal(want, ref, err_msg=f"k={k} oracle")


@pytest.mark.parametrize("n", [96, 91])
def test_fused_kernels_odd_n(n):
    """Fused kernels at N not divisible by the preferred tile sizes: the
    tile=n fallback path must stay exact (verified bit-exact on real TPU up
    to N=273 prime-ish; this guards the interpret path in CI)."""
    from samble_tpu.kernels.n2p import _n2p_fused_pallas_fwd, n2p_dense_reference
    from samble_tpu.kernels.score import sparse_attention_score_fused
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(21)
    c, kk = 16, 5
    x = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    xn = nbr.knn_normalized(x)
    q = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    out, _ = _n2p_fused_pallas_fwd(q, k, v, xn, 4, 0.5, False, True, kk,
                                   interpret=True)
    idx = knn_pallas(xn, xn, kk, interpret=True)[1]
    ref = n2p_dense_reference(q, k, v, idx, 4, 0.5, False, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    kt = jnp.asarray(rng.normal(size=(2, n + 4, c)), jnp.float32)
    cm, cf, cc = sparse_attention_score_fused(q, kt, xn, kk, 0.25,
                                              interpret=True)
    want = sparse_attention_score_pallas(q, kt, idx, 0.25, interpret=True)
    for name, a, b in zip(("cm", "cf", "cc"), (cm, cf, cc), want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


class TestGatherScatter:
    """kernels/gather.py: one-hot-matmul neighbor gather/scatter + VJPs."""

    def _data(self, b=2, n=128, k=5, c=16, seed=31):
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
        return w, idx

    def test_gather_matches_xla(self):
        from samble_tpu.kernels.gather import gather_neighbors

        w, idx = self._data()
        ref = jnp.take_along_axis(w[:, :, None], idx[..., None], axis=1)
        got = gather_neighbors(w, idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_scatter_matches_xla(self):
        from samble_tpu.kernels.gather import scatter_neighbors_kfirst

        w, idx = self._data()
        b, n, k = idx.shape
        c = w.shape[-1]
        rng = np.random.default_rng(32)
        g = jnp.asarray(rng.normal(size=(b, k, n, c)), jnp.float32)
        ref = jax.vmap(
            lambda gg, ii: jnp.zeros((n, c)).at[ii].add(jnp.moveaxis(gg, 0, 1))
        )(g, idx)
        got = scatter_neighbors_kfirst(g, idx, n, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_gather_vjp_matches_xla(self):
        from samble_tpu.kernels.gather import gather_neighbors

        w, idx = self._data()

        def loss_ref(w):
            g = jnp.take_along_axis(w[:, :, None], idx[..., None], axis=1)
            return jnp.sum(jnp.sin(g) * jnp.cos(g * 0.5))

        def loss_ker(w):
            return jnp.sum(
                jnp.sin(gather_neighbors(w, idx, interpret=True))
                * jnp.cos(gather_neighbors(w, idx, interpret=True) * 0.5)
            )

        gr = jax.grad(loss_ref)(w)
        gk = jax.grad(loss_ker)(w)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-5, atol=1e-6)

    def test_scatter_vjp_is_gather(self):
        from samble_tpu.kernels.gather import scatter_neighbors_kfirst

        w, idx = self._data()
        b, n, k = idx.shape
        c = w.shape[-1]
        rng = np.random.default_rng(33)
        g = jnp.asarray(rng.normal(size=(b, k, n, c)), jnp.float32)

        def loss_ker(g):
            return jnp.sum(scatter_neighbors_kfirst(g, idx, n, interpret=True) ** 2)

        def loss_ref(g):
            out = jax.vmap(
                lambda gg, ii: jnp.zeros((n, c)).at[ii].add(
                    jnp.moveaxis(gg, 0, 1))
            )(g, idx)
            return jnp.sum(out ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_ker)(g)),
            np.asarray(jax.grad(loss_ref)(g)),
            rtol=1e-5, atol=1e-6,
        )

    def test_edgeconv_kfirst_branch_equivalence(self):
        """The K-first train branch (kernels/gather.py path) must match the
        axis-2 gather branch bit-for-math on identical params — forward AND
        parameter gradients (BN batch-stat chain included)."""
        from samble_tpu.nn.embedding import EdgeConv
        from samble_tpu import kernels

        rng = np.random.default_rng(34)
        x = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)

        # CPU backend: use_pallas() is False, so the module can't take the
        # K-first branch here — build its exact twin explicitly (interpret
        # mode) and compare against the module's axis-2 gather branch.
        from samble_tpu.kernels.gather import gather_neighbors_kfirst
        from samble_tpu import ops as sops

        mod = EdgeConv(k=8, group_type="center_diff", conv1_out=16,
                       conv2_out=16, train=True, impl="gather")
        vs = mod.init({"params": jax.random.key(5)}, x)

        def loss_ref(p):
            out, mut = mod.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2) * 1e-3

        # K-first twin built from the same parameter tree
        import flax.linen as fnn
        from samble_tpu.nn.common import ConvBNLeaky, PointBatchNorm, leaky_relu

        class KFirst(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                kern = self.param("conv1_kernel", fnn.initializers.zeros,
                                  (6, 16))
                w_c, w_d = kern[:3], kern[3:]
                u = x @ (w_c - w_d)
                w = x @ w_d
                idx = sops.neighbors.knn_indices(x, 8)
                g = u[:, None] + gather_neighbors_kfirst(w, idx, True)
                g = PointBatchNorm(use_running_average=False)(g)
                g = leaky_relu(g)
                g = ConvBNLeaky(16, train=True)(g)
                return jnp.max(g, axis=1)

        kmod = KFirst()

        def loss_k(p):
            out, mut = kmod.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2) * 1e-3

        l_ref, g_ref = jax.value_and_grad(loss_ref)(vs["params"])
        l_k, g_k = jax.value_and_grad(loss_k)(vs["params"])
        np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            g_k, g_ref,
        )

    def test_gather_knn_fused_matches_split(self):
        """gather_knn_kfirst == knn_pallas + gather_neighbors_kfirst
        (bit-identical neighbor sets via packed keys) + VJP equivalence."""
        from samble_tpu.kernels.gather import (
            gather_knn_kfirst, gather_neighbors_kfirst,
        )
        from samble_tpu.ops import neighbors as nbr

        rng = np.random.default_rng(35)
        b, n, k, c = 2, 128, 8, 16
        x = jnp.asarray(rng.normal(size=(b, n, 5)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        xn = nbr.knn_normalized(x)
        _, idx_ref = knn_pallas(xn, xn, k, interpret=True)

        got, idx = gather_knn_kfirst(w, xn, k, True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        want = gather_neighbors_kfirst(w, idx_ref, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        def loss_fused(w):
            g, _ = gather_knn_kfirst(w, xn, k, True)
            return jnp.sum(jnp.sin(g))

        def loss_split(w):
            g = gather_neighbors_kfirst(w, idx_ref, interpret=True)
            return jnp.sum(jnp.sin(g))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fused)(w)),
            np.asarray(jax.grad(loss_split)(w)),
            rtol=1e-5, atol=1e-6,
        )


def test_attn_rows_pallas_matches_xla():
    from samble_tpu.kernels.attn_rows import attn_rows_pallas

    rng = np.random.default_rng(3)
    b, m, nt, d, c = 2, 64, 70, 16, 24  # NT not 128-aligned → pad path
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, nt, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, nt, c)).astype(np.float32))

    ref = jnp.einsum(
        "bmt,btc->bmc",
        jax.nn.softmax(jnp.einsum("bmd,btd->bmt", q, k) * scale, axis=-1),
        v,
    )
    out = attn_rows_pallas(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # bf16 payload path (the production eval dtype)
    out16 = attn_rows_pallas(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16), scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out16.astype(jnp.float32)), np.asarray(ref),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_attn_rows_vjp_matches_xla(dtype):
    """The differentiable fused row attention (train path): forward AND all
    three gradients must match the XLA chain it replaced — softmax in f32,
    attn cast to compute dtype, @V (nn/downsample.py train branch)."""
    from samble_tpu.kernels.attn_rows import attn_rows

    rng = np.random.default_rng(11)
    b, m, nt, d, c = 2, 64, 70, 16, 24
    q = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.normal(size=(b, nt, d)).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.normal(size=(b, nt, c)).astype(np.float32)).astype(dtype)
    scale = 1.0 / np.sqrt(d)

    def xla_ref(q_, k_, v_):
        attn = jax.nn.softmax(
            jnp.einsum("bmd,btd->bmt", q_, k_).astype(jnp.float32) * scale,
            axis=-1,
        ).astype(v_.dtype)
        return jnp.einsum("bmt,btc->bmc", attn, v_)

    def loss_ref(q_, k_, v_):
        return jnp.sum(xla_ref(q_, k_, v_).astype(jnp.float32) ** 2)

    def loss_ker(q_, k_, v_):
        return jnp.sum(
            attn_rows(q_, k_, v_, float(scale), True).astype(jnp.float32) ** 2
        )

    out_ref = xla_ref(q, k, v)
    out_ker = attn_rows(q, k, v, float(scale), True)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(
        rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out_ker, np.float32), np.asarray(out_ref, np.float32), **tol
    )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("qkv", g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(bb, np.float32), np.asarray(a, np.float32),
            err_msg=f"d{name}", **tol
        )


@pytest.mark.parametrize("energy_asm", ["l2", "l2+"])
def test_score_kernel_l2_energy_matches_xla(energy_asm):
    """The l2 energies via coefficient + column bias (kernels/score.py) must
    reproduce the dense -/+||q-k||^2 softmax column sums exactly (the
    dropped ||q||^2 row term cancels in softmax)."""
    from samble_tpu.kernels.score import sparse_attention_score_pallas
    from samble_tpu.ops import attention as att_ops
    from samble_tpu.ops import neighbors as nbr

    rng = np.random.default_rng(11)
    b, n, nt, d, kk = 2, 128, 134, 16, 8
    q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, nt, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, n, 12)).astype(np.float32))
    nb_idx = nbr.knn_indices(x, kk)
    scale = 0.25

    cm, cf, cc = sparse_attention_score_pallas(
        q, keys, nb_idx, scale, interpret=True, energy_asm=energy_asm
    )
    # dense reference: full +-l2 energy incl. the row term
    l2 = att_ops.l2_global(q[:, None], keys[:, None])[:, 0]  # (B, N, NT)
    energy = (-l2 if energy_asm == "l2" else l2) * scale
    attn = jax.nn.softmax(energy, axis=-1)
    mask = nbr.mask_from_idx(nb_idx, n)  # (B, N, N)
    want_m = jnp.sum(attn[..., :n] * mask, axis=1)
    want_f = jnp.sum(attn, axis=1)[..., :n]
    np.testing.assert_allclose(np.asarray(cm), np.asarray(want_m),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(want_f),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("energy_asm", ["l2", "l2+"])
def test_attn_rows_l2_energy_matches_xla(energy_asm):
    """attn_rows with the l2 energies: forward + custom-VJP gradients vs the
    dense composition."""
    from samble_tpu.kernels.attn_rows import attn_rows
    from samble_tpu.ops import attention as att_ops

    rng = np.random.default_rng(12)
    b, m, nt, d, c = 2, 64, 130, 16, 16
    q = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, nt, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, nt, c)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))
    scale = 0.25

    def loss_k(q, keys, v):
        return jnp.sum(attn_rows(q, keys, v, scale, True, energy_asm) * wt)

    def loss_r(q, keys, v):
        l2 = att_ops.l2_global(q[:, None], keys[:, None])[:, 0]
        e = (-l2 if energy_asm == "l2" else l2) * scale
        a = jax.nn.softmax(e, axis=-1)
        return jnp.sum(jnp.einsum("bmn,bnc->bmc", a, v) * wt)

    np.testing.assert_allclose(
        np.asarray(loss_k(q, keys, v)), np.asarray(loss_r(q, keys, v)),
        rtol=2e-5,
    )
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, keys, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, keys, v)
    for a, b_, name in zip(gk, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5,
            atol=5e-5 * max(1.0, float(jnp.abs(b_).max())), err_msg=name,
        )
