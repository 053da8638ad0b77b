"""Static-shape point sampling: the SAMBLE per-bin sampler and FPS.

The reference implements per-bin sampling with ``torch.multinomial`` plus a
Python loop over (batch × bin) slicing ragged counts (utils/ops.py:467-619)
— a host-synchronizing, shape-dynamic pattern that cannot run under XLA.
Here it is re-expressed as **masked dense Gumbel-top-k**:

  * sampling k items without replacement from a categorical distribution
    with logits ℓ_i is equivalent to taking the top-k of ℓ_i + G_i with
    i.i.d. Gumbel noise G_i (Gumbel-top-k theorem);
  * each point belongs to exactly one bin, so a single (B, N) Gumbel draw
    serves all bins at once;
  * per-bin ranks are computed with one sort + a cumulative per-bin counter,
    and a point is selected iff ``rank_within_bin < k_counts[bin]``;
  * the output (B, M) index list is ordered (bin 0 samples first, then bin 1,
    …) exactly like the reference's concatenation order, via one more sort
    on a composite (bin, rank) key.

Everything is fixed-shape, fully on-device, vmap/jit-safe.
"""

from __future__ import annotations

import numbers

import jax
import jax.numpy as jnp

from samble_tpu.ops.attention import zscore


def sort_chunk(scores: jax.Array, num_bins: int, descending: bool = False):
    """Sort scores and split into ``num_bins`` chunks (utils/ops.py:239-259).

    :param scores: (B, H, N)
    :returns: when N is divisible by num_bins, ``(x_chunks, idx_chunks)``
        each stacked (num_bins, B, H, N // num_bins); otherwise a ragged
        pair of chunk LISTS with ``torch.chunk`` semantics — every chunk
        ``ceil(N / num_bins)`` long except a shorter tail (chunk sizes are
        Python ints, so the ragged form is still jit-compatible).
    """
    n = scores.shape[-1]
    order = jnp.argsort(-scores if descending else scores, axis=-1)
    x_sorted = jnp.take_along_axis(scores, order, axis=-1)
    if n % num_bins == 0:
        chunk = n // num_bins
        x_chunks = jnp.stack(
            [x_sorted[..., i * chunk : (i + 1) * chunk] for i in range(num_bins)]
        )
        idx_chunks = jnp.stack(
            [order[..., i * chunk : (i + 1) * chunk] for i in range(num_bins)]
        )
        return x_chunks, idx_chunks
    chunk = -(-n // num_bins)  # ceil — torch.chunk's split rule
    bounds = [(i * chunk, min((i + 1) * chunk, n)) for i in range(num_bins)
              if i * chunk < n]
    x_chunks = [x_sorted[..., a:b] for a, b in bounds]
    idx_chunks = [order[..., a:b] for a, b in bounds]
    return x_chunks, idx_chunks


def _inverse_permutation(order: jax.Array) -> jax.Array:
    """For each row, the inverse of the permutation ``order`` (B, N)."""
    n = order.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), order.shape)
    inv = jnp.zeros_like(order)
    return jax.vmap(lambda o, p: jnp.zeros((n,), jnp.int32).at[o].set(p))(order, pos)


def _ordered_bin_select(pert, bin_id, budgets, num_bins: int, m: int):
    """(B, M) indices: per bin j, the ``budgets[b, j]`` best-``pert`` points,
    ordered bin 0 first and by descending ``pert`` within each bin; any
    budget deficit (a bin smaller than its budget) is filled with the
    best-``pert`` unselected points.

    Shared tail of :func:`generate_downsampled_index` and the legacy bin
    samplers.  Runs entirely in *sorted space*: one descending sort carries
    the original indices along, the within-bin rank is a per-bin cumulative
    count over the sorted rows, and a second sort by a composite
    (bin, rank | fallback) key — unique by construction, so stability is
    irrelevant — brings the selection into output order.  No scatters and
    no (B, N, num_bins) cumsum tensor (the previous formulation's vmapped
    ``.at[].set`` permutation inversions dominated the DownSampleToken
    stage budget, tools/probe_ds_token.py).
    """
    b, n = pert.shape
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    # One stable sort carries BOTH payloads — take_along_axis gathers of
    # (B, N) permutations lower to serial TPU gathers (~2.4 ms each at
    # (256, 1024), tools/probe_ds_token.py micro-probes) while extra sort
    # payload lanes are nearly free.
    _, order, sorted_bins = jax.lax.sort(
        (-pert, pos, bin_id), num_keys=1, is_stable=True
    )

    # within-bin rank: per-bin running count via associative_scan
    # (jnp.cumsum and any take_along on the small budget table are the
    # slow paths here, not the sorts)
    oh = sorted_bins[:, :, None] == jnp.arange(num_bins, dtype=jnp.int32)
    cum = jax.lax.associative_scan(jnp.add, oh.astype(jnp.int32), axis=1)
    rank_sorted = jnp.sum(jnp.where(oh, cum - 1, 0), axis=2)

    budget_sorted = jnp.zeros((b, n), jnp.int32)
    for j in range(num_bins):
        budget_sorted = jnp.where(
            sorted_bins == j, budgets[:, j:j + 1], budget_sorted
        )
    selected = rank_sorted < budget_sorted
    sel_key = sorted_bins * (n + 1) + rank_sorted
    fallback_key = num_bins * (n + 1) + pos  # pos == global rank here
    order_key = jnp.where(selected, sel_key, fallback_key)
    _, idx = jax.lax.sort((order_key, order), num_keys=1)
    return idx[:, :m].astype(jnp.int32)


def rank_within_bins(pert: jax.Array, bin_id: jax.Array, num_bins: int):
    """Rank of each point within its own bin, ordering by ``pert`` descending.

    :param pert: (B, N) (perturbed) scores — larger ranks earlier
    :param bin_id: (B, N) int32 bin membership
    :returns: ``(rank (B, N) int32, global_rank (B, N) int32)`` where
        ``global_rank`` is the rank ignoring bins (used as a fallback key).

    One argsort + a per-bin running counter (cumsum over a one-hot of the
    sorted bin ids) — O(N log N + N·num_bins) instead of the reference's
    per-(batch, bin) Python loops.
    """
    order = jnp.argsort(-pert, axis=1).astype(jnp.int32)  # (B, N) desc
    sorted_bins = jnp.take_along_axis(bin_id, order, axis=1)  # (B, N)
    onehot = jax.nn.one_hot(sorted_bins, num_bins, dtype=jnp.int32)
    cum = jnp.cumsum(onehot, axis=1)  # (B, N, nb)
    rank_sorted = (
        jnp.take_along_axis(cum, sorted_bins[..., None], axis=2)[..., 0] - 1
    )  # (B, N)
    # scatter ranks back to point order
    def scatter(o, r):
        return jnp.zeros_like(r).at[o].set(r)

    n = pert.shape[1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), pert.shape)
    rank = jax.vmap(scatter)(order, rank_sorted)
    global_rank = jax.vmap(scatter)(order, pos)
    return rank, global_rank


def _boltzmann_inverse_t(
    boltzmann_t, bin_mask: jax.Array, n: int, num_bins: int
) -> jax.Array:
    """Per-(batch, bin) inverse temperature (utils/ops.py:524-550).

    :param bin_mask: (B, H, N, num_bins) bool
    :returns: (B, num_bins) float32
    """
    count = jnp.sum(bin_mask[:, 0], axis=1).astype(jnp.float32)  # (B, nb)
    if boltzmann_t == "mode_1":
        return count / 100.0
    if boltzmann_t == "mode_2":
        return jnp.full_like(count, n / (100.0 * num_bins))
    if boltzmann_t == "mode_3":
        return count / 200.0
    if boltzmann_t == "mode_4":
        return jnp.full_like(count, n / (200.0 * num_bins))
    if isinstance(boltzmann_t, numbers.Number):
        return jnp.full_like(count, 1.0 / boltzmann_t)
    raise NotImplementedError(f"boltzmann_t: {boltzmann_t}")


def generate_downsampled_index(
    key: jax.Array,
    m: int,
    scores: jax.Array,
    bin_mask: jax.Array,
    k_counts: jax.Array,
    sample_mode: str,
    boltzmann_t,
) -> jax.Array:
    """Select M point indices, ``k_counts[b, j]`` of them from bin j.

    :param key: PRNG key (unused for 'topk')
    :param m: number of points to select
    :param scores: (B, H, N) raw attention point scores (H == 1)
    :param bin_mask: (B, H, N, num_bins) bool membership
    :param k_counts: (B, num_bins) int32 per-bin budgets (sum == M)
    :param sample_mode: 'topk' | 'uniform' | 'random'
    :param boltzmann_t: temperature spec for 'random'
        (mode_1..mode_4 or a number; utils/ops.py:524-550)
    :returns: (B, M) int32 indices, ordered bin 0 first (reference
        concatenation order, utils/ops.py:600-612)

    Statistical parity: 'random' matches ``torch.multinomial(replacement=False)``
    over probs ∝ exp(tanh(zscore(score)) · T⁻¹_bin) within each bin
    (utils/ops.py:516-598) by the Gumbel-top-k construction; 'uniform' is a
    uniform without-replacement draw; 'topk' is deterministic score order.
    If a bin's budget exceeds its population (possible in the reference's
    water-filling residue edge case, where it would silently emit garbage
    indices), the deficit is filled with the best-ranked unselected points —
    output indices are always valid and distinct (documented improvement).
    """
    b, h, n = scores.shape
    num_bins = bin_mask.shape[-1]
    s = scores[:, 0, :]  # (B, N)
    mask2 = bin_mask[:, 0]  # (B, N, nb)
    # membership is one-hot, so the bin id is a masked sum (argmax lowers
    # to a slower multi-pass reduce on TPU)
    bin_id = jnp.sum(
        jnp.where(mask2, jnp.arange(num_bins, dtype=jnp.int32), 0), axis=-1
    )

    if sample_mode == "topk":
        pert = s
    elif sample_mode == "uniform":
        pert = jax.random.gumbel(key, (b, n), dtype=jnp.float32)
    elif sample_mode == "random":
        t = jnp.tanh(zscore(s, axis=-1))  # (B, N)
        inv_t = _boltzmann_inverse_t(boltzmann_t, bin_mask, n, num_bins)  # (B, nb)
        # row-wise table lookup as a masked sum (take_along_axis on a
        # (B, nb) table lowers to a serial TPU gather)
        inv_t_pt = jnp.sum(jnp.where(mask2, inv_t[:, None, :], 0.0), axis=-1)
        pert = t * inv_t_pt + jax.random.gumbel(key, (b, n), dtype=jnp.float32)
    else:
        raise ValueError(
            "sample_mode must be topk, uniform or random, got " f"{sample_mode}"
        )

    return _ordered_bin_select(pert, bin_id, k_counts, num_bins, m)


def _sorted_chunk_bins(scores: jax.Array, num_bins: int):
    """Descending-sort score chunks with ``torch.chunk`` semantics: chunk
    size ``ceil(N / num_bins)``, ragged (possibly smaller/empty) last chunk
    — so the shipped defaults (num_bins=6 at N=1024/2048) work, unlike the
    reference's bin2 path which asserts divisibility.

    :param scores: (B, N)
    :returns: ``(bin_id (B, N) int32, hi (B, nb), lo (B, nb), mean (B, nb),
        counts (nb,) int32)`` — per-chunk max/min/mean of the sorted scores
        and each chunk's population.
    """
    b, n = scores.shape
    assert n >= num_bins, "need at least one point per bin"
    cs = -(-n // num_bins)  # ceil
    order = jnp.argsort(-scores, axis=-1).astype(jnp.int32)  # (B, N) desc
    chunk_of_pos = jnp.minimum(
        jnp.arange(n, dtype=jnp.int32) // cs, num_bins - 1
    )[None]  # (1, N)
    bin_id = jax.vmap(lambda o, c: jnp.zeros((n,), jnp.int32).at[o].set(c))(
        order, jnp.broadcast_to(chunk_of_pos, (b, n))
    )
    svals = jnp.take_along_axis(scores, order, axis=-1)  # (B, N) desc
    pad = num_bins * cs - n
    svp = jnp.pad(svals, ((0, 0), (0, pad))).reshape(b, num_bins, cs)
    valid = (jnp.arange(num_bins * cs) < n).reshape(num_bins, cs)
    counts = valid.sum(axis=1).astype(jnp.int32)  # (nb,)
    hi = svp[:, :, 0]  # first of a descending chunk = its max
    last = jnp.maximum(counts - 1, 0)  # last valid element = its min
    lo = jnp.take_along_axis(svp, last[None, :, None], axis=2)[..., 0]
    mean = jnp.sum(svp * valid[None], axis=2) / jnp.maximum(counts, 1)[None]
    return bin_id, hi, lo, mean, counts


def _balance_budgets(budgets: jax.Array, counts: jax.Array, m: int):
    """Force ``Σ budgets == M`` (requires M ≤ N): a deficit is poured into
    the first bins with spare population; a surplus (saturated bin_prob
    making the reference's last-bin remainder negative) is trimmed from the
    last bins."""
    num_bins = budgets.shape[1]
    total = jnp.sum(budgets, axis=1)  # (B,)
    deficit = jnp.maximum(m - total, 0)
    surplus = jnp.maximum(total - m, 0)
    cols = list(jnp.moveaxis(budgets, 1, 0))
    for j in range(num_bins):
        space = counts[j] - cols[j]
        add = jnp.clip(deficit, 0, space)
        cols[j] = cols[j] + add
        deficit = deficit - add
    for j in reversed(range(num_bins)):
        sub = jnp.clip(surplus, 0, cols[j])
        cols[j] = cols[j] - sub
        surplus = surplus - sub
    return jnp.stack(cols, axis=1)


def _select_by_bin_budget(pert, bin_id, budgets, num_bins, m):
    """(B, M) indices: per bin, the ``budgets[b, j]`` best-``pert`` points,
    ordered bin 0 first.  Shared tail of the legacy bin samplers."""
    return _ordered_bin_select(pert, bin_id, budgets, num_bins, m)


def bin_idx_selection(
    key: jax.Array,
    scores: jax.Array,
    num_bins: int,
    bin_prob: jax.Array,
    m: int,
    sample_mode: str,
    boltzmann_t: float,
):
    """Legacy APES bin sampler (reference models/downsample.py:662-718).

    Scores are sorted descending and split into ``num_bins`` equal chunks;
    bin j's budget is ``int(2M/num_bins · bin_prob[:, j])`` (last bin takes
    the remainder), and points are drawn within each chunk by top-k /
    uniform / Boltzmann-multinomial.  The reference loops over (batch × bin)
    on the host; here one Gumbel-top-k over composite (bin, rank) keys keeps
    everything static-shape.  NOTE: the method is dead code in the shipped
    reference (no forward calls it — DownSampleCarve.forward:494-512 uses
    idx_selection/boltzmann only); it is reproduced for capability parity
    with older configs.

    :param scores: (B, N)
    :param bin_prob: (B, num_bins) in [0.5, 1] (from the bin_conv head)
    :returns: ``(idx (B, M) int32, k_counts (B, num_bins) int32)`` — the
        counts always describe the actual selection: budgets that exceed a
        chunk's population (or a negative last-bin remainder) are
        redistributed to earlier bins with space, keeping Σ == M (the
        reference would emit fewer/garbage indices there).
    """
    b, n = scores.shape
    bin_id, hi_c, lo_c, _, counts = _sorted_chunk_bins(scores, num_bins)

    per_bin = jnp.floor(2.0 * m / num_bins * bin_prob).astype(jnp.int32)
    head = per_bin[:, : num_bins - 1]
    last = m - jnp.sum(head, axis=1, keepdims=True)  # (B, 1) remainder
    budgets = jnp.concatenate([head, last], axis=1)  # (B, nb)
    budgets = jnp.clip(budgets, 0, counts[None])
    budgets = _balance_budgets(budgets, counts, m)

    if sample_mode == "topk":
        pert = scores
    elif sample_mode == "uniform":
        pert = jax.random.gumbel(key, (b, n), dtype=jnp.float32)
    elif sample_mode == "random":
        # per-chunk minmax normalization, then Boltzmann softmax ≡
        # Gumbel-top-k on the logits
        hi = jnp.take_along_axis(hi_c, bin_id, axis=1)
        lo = jnp.take_along_axis(lo_c, bin_id, axis=1)
        normed = (scores - lo) / (hi - lo + 1e-8)
        logit = normed / (boltzmann_t + 1e-8)
        pert = logit + jax.random.gumbel(key, (b, n), dtype=jnp.float32)
    else:
        raise ValueError(
            f"sample_mode must be topk, uniform or random, got {sample_mode}"
        )
    idx = _select_by_bin_budget(pert, bin_id, budgets, num_bins, m)
    return idx, budgets


def bin2_idx_selection(
    key: jax.Array,
    scores: jax.Array,
    num_bins: int,
    m: int,
    boltzmann_t: float,
):
    """Legacy APES bin2 sampler (reference models/downsample.py:720-793).

    Bin-level Boltzmann probabilities from each equal sort-chunk's mean
    score; M bin assignments drawn WITH replacement; overflow beyond a
    chunk's population cascades to the next bin, any final leftover goes to
    the first bins with space (the reference's second pass drops the
    leftover when the first non-overflowing bin absorbs it —
    models/downsample.py:764-771 never writes ``count_list[k]`` on the
    break path — which would emit fewer than M indices; fixed here to keep
    the static (B, M) contract).  Points within each bin are drawn uniformly
    without replacement.  Dead code in the shipped reference (see
    bin_idx_selection); reproduced for capability parity.

    :returns: ``(idx (B, M) int32, k_counts (B, num_bins) int32,
        bin_prob (B, num_bins))``
    """
    b, n = scores.shape
    bin_id, _, _, mean_bin, caps = _sorted_chunk_bins(scores, num_bins)

    # empty trailing chunks (possible with ceil-chunking when N < nb·cs −
    # cs + 1) must not join the min/max normalization or receive draws —
    # their padded mean of 0 would otherwise skew the distribution
    nonempty = (caps > 0)[None]  # (1, nb)
    big = jnp.finfo(jnp.float32).max
    lo = jnp.min(jnp.where(nonempty, mean_bin, big), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(nonempty, mean_bin, -big), axis=1, keepdims=True)
    normed = (mean_bin - lo) / (hi - lo + 1e-8)
    logits = jnp.where(nonempty, normed / (boltzmann_t + 1e-8), -jnp.inf)

    key_cat, key_sel = jax.random.split(key)
    draws = jax.random.categorical(key_cat, logits[:, None, :], axis=-1,
                                   shape=(b, m))  # (B, M) with replacement
    counts = jnp.sum(jax.nn.one_hot(draws, num_bins, dtype=jnp.int32), axis=1)

    # first pass: cascade per-bin overflow into the next bin
    rest = jnp.zeros((b,), jnp.int32)
    cols = []
    for j in range(num_bins):
        c = counts[:, j] + rest
        rest = jnp.maximum(c - caps[j], 0)
        cols.append(jnp.minimum(c, caps[j]))
    # second pass: pour any leftover into the first bins with space
    for j in range(num_bins):
        space = caps[j] - cols[j]
        add = jnp.minimum(rest, space)
        cols[j] = cols[j] + add
        rest = rest - add
    counts = jnp.stack(cols, axis=1)  # (B, nb), sums to M (M <= N)

    pert = jax.random.gumbel(key_sel, (b, n), dtype=jnp.float32)
    idx = _select_by_bin_budget(pert, bin_id, counts, num_bins, m)
    return idx, counts, counts.astype(jnp.float32) / m


def farthest_point_sample(key: jax.Array, xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest-point sampling (utils/ops.py:622-643).

    :param xyz: (B, N, 3)
    :returns: (B, npoint) int32 indices
    """
    b, n, _ = xyz.shape
    farthest0 = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
    centroids0 = jnp.zeros((b, npoint), jnp.int32)
    distance0 = jnp.full((b, n), 1e10, jnp.float32)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids0, distance0, farthest0)
    )
    return centroids


def fps(key: jax.Array, x: jax.Array, xyz: jax.Array, npoint: int):
    """FPS wrapper returning sampled features + indices (utils/ops.py:670-692).

    :param x: (B, N, C) features
    :param xyz: (B, N, 3) coordinates
    :returns: ``(x_ds (B, npoint, C), idx (B, npoint))``
    """
    idx = farthest_point_sample(key, xyz, npoint)
    x_ds = jnp.take_along_axis(x, idx[..., None], axis=1)
    return x_ds, idx
