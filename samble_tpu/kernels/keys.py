"""Packed distance|index keys — the shared selection currency of the kernels.

The kNN kernel (kernels/knn.py) selects neighbors on *packed keys*:
non-negative f32 squared distances bitcast to int32 are order-preserving,
so the low ``idx_bits`` mantissa bits can carry the column index.  Every
key is then unique (distinct columns → distinct low bits), which makes
"the K nearest neighbors of row i" exactly the set

    { j : key[i, j] <= kth_key[i] }

where ``kth_key[i]`` is the K-th smallest packed key of row i.  Kernels
that only need the kNN *adjacency mask* (the fused N2P attention and the
SAMBLE score kernel) therefore never have to rebuild the mask from an
index list with K full-width lane compares — they recompute the key tile
(one MXU matmul + a few VPU passes) and compare against the row threshold
(one pass).  Bit-exactness across kernels holds because every kernel
computes keys through this module's helpers: same op order, same f32
arithmetic, same HIGHEST-precision matmul, same packing.

Reference semantics covered: utils/ops.py:17-44 (kNN built from pairwise
distances with topk); the threshold-mask is exactly the mask of
utils/ops.py:125-133 for the same neighbor set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INTMAX = 0x7FFFFFFF  # int32 max as a Python int (safe to close over in kernels)


def packing_bits(m: int) -> int:
    """Low mantissa bits used for the column index, for ``m`` padded columns.

    Must be computed from the SAME padded column count in every kernel that
    wants bit-identical keys (kernels pad reference columns to a multiple
    of 128, so ``packing_bits(round_up(m, 128))``).
    """
    return max(1, (m - 1).bit_length())


def packed_key_tile(xa, xb, idx_bits: int, m_valid: int):
    """(TILE, M) packed distance|column keys between row tile ``xa`` and ``xb``.

    In-kernel helper (traced inside a Pallas kernel body).

    :param xa: (TILE, C) f32 query rows (pre-normalized)
    :param xb: (M, C) f32 reference rows (pre-normalized, padded)
    :param idx_bits: from :func:`packing_bits` of the padded column count
    :param m_valid: real reference rows; padded columns get INTMAX keys
    """
    inner = jax.lax.dot_general(
        xa, xb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE, M)
    aa = jnp.sum(xa * xa, axis=1, keepdims=True)  # (TILE, 1)
    bb = jnp.sum(xb * xb, axis=1, keepdims=True)  # (M, 1)
    sq = jnp.maximum(aa - 2.0 * inner + bb.T, 0.0)  # (TILE, M)

    col = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
    low_mask = (1 << idx_bits) - 1
    key = (jax.lax.bitcast_convert_type(sq, jnp.int32) & ~low_mask) | col
    if m_valid < sq.shape[1]:
        key = jnp.where(col < m_valid, key, INTMAX)
    return key


def kth_smallest_key(key, k: int):
    """Per-row K-th smallest packed key, (TILE, 1) int32.

    In-kernel helper.  K rounds of min-extraction; keys are unique so each
    round eliminates exactly one column — identical selection semantics to
    the kNN kernel's extraction loop.
    """

    def body(_, carry):
        pool, _ = carry
        kmin = jnp.min(pool, axis=1, keepdims=True)  # (TILE, 1)
        pool = jnp.where(pool == kmin, INTMAX, pool)
        return pool, kmin

    _, kth = jax.lax.fori_loop(
        0, k, body, (key, jnp.zeros((key.shape[0], 1), jnp.int32))
    )
    return kth


def kth_smallest_key_fast(key, k: int, bisect_rounds: int = 16):
    """Per-row K-th smallest packed key via bisection + adaptive tail.

    K-round min-extraction costs ~3 full-width VPU passes per round — at
    K=32 that dominates the whole kNN/attention kernel family.  This
    variant bisects the *value* range instead (count-below per round, also
    ~3 passes, but only ``bisect_rounds`` of them) and finishes with a
    data-adaptive extraction loop over the surviving bracket, whose trip
    count is the number of keys left in the bracket (expected ≈1 after 16
    rounds on a ~2²¹-wide distance-key range; worst case — heavily
    duplicated points — it degrades toward the plain K-round loop but never
    past it).  Exact for unique keys, like :func:`kth_smallest_key`.
    """
    tile = key.shape[0]
    # bracket invariant: count(<= lo) < k <= count(<= hi)
    rmin = jnp.min(key, axis=1, keepdims=True)
    rmax = jnp.max(key, axis=1, keepdims=True)
    lo = rmin - 1
    hi = rmax
    clo = jnp.zeros((tile, 1), jnp.int32)

    def bis(_, carry):
        lo, hi, clo = carry
        # overflow-safe midpoint (hi - lo can exceed int32 when the row
        # contains INTMAX padding keys)
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        le = (key <= mid).astype(jnp.int32)
        cnt = jnp.sum(le, axis=1, keepdims=True)
        take = cnt >= k
        hi = jnp.where(take, mid, hi)
        lo = jnp.where(take, lo, mid)
        clo = jnp.where(take, clo, cnt)
        return lo, hi, clo

    lo, hi, clo = jax.lax.fori_loop(0, bisect_rounds, bis, (lo, hi, clo))

    # (k - clo)-th smallest inside the bracket (lo, hi]; ``key`` stays
    # read-only and the loop carries only (TILE, 1) scalars — each trip
    # advances the exclusive lower threshold t to the next key above it
    need = k - clo  # >= 1 per the invariant

    def nxt(t):
        return jnp.min(jnp.where((key > t) & (key <= hi), key, INTMAX),
                       axis=1, keepdims=True)

    def cond(carry):
        t, need = carry
        return jnp.max(need) > 1

    def step(carry):
        t, need = carry
        live = need > 1
        t = jnp.where(live, nxt(t), t)
        need = jnp.where(live, need - 1, need)
        return t, need

    t, _ = jax.lax.while_loop(cond, step, (lo, need))
    return nxt(t)
