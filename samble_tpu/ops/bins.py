"""SAMBLE bin machinery: boundary estimation, partitioning, water-filling.

Reference parity targets:
  * ``update_sampling_score_bin_boundary`` — utils/ops.py:174-236
  * ``bin_partition``                      — utils/ops.py:435-464
  * ``bin_weghts_calculation``             — models/downsample.py:264-284
  * ``calculate_num_points_to_choose``     — utils/ops.py:385-432

State model: the reference keeps the boundaries as two (1,1,1,num_bins)
buffers (upper/lower, padded with ±inf) mutated inside ``forward`` and
synced across GPUs with an all_reduce mid-forward (utils/ops.py:196-199).
Here the state is a single ``(num_bins - 1,)`` array of *inner* boundaries
threaded explicitly through the step function.  Under ``jit`` over a sharded
batch, the sort below sees the **global** batch, so the cross-device sync is
exact global quantiles — a deliberate improvement over the reference's
"mean of per-rank quantiles" approximation (documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samble_tpu.ops.attention import zscore


def compute_bin_boundaries_from_scores(
    scores_z: jax.Array, num_bins: int
) -> jax.Array:
    """Inner bin boundaries = descending quantiles of the z-scored scores.

    :param scores_z: (B, H, N) z-scored attention point scores
    :param num_bins: number of bins
    :returns: (num_bins - 1,) boundaries, descending

    Matches utils/ops.py:180-189: sort all scores descending, pick values at
    indices ``i/num_bins * numel`` for i in 1..num_bins-1.
    """
    flat = jnp.sort(scores_z.reshape(-1))[::-1]
    n = flat.shape[0]
    idx = (jnp.arange(1, num_bins) / num_bins * n).astype(jnp.int32)
    return flat[idx]


def update_bin_boundaries(
    old_boundaries: jax.Array,
    scores_z: jax.Array,
    num_bins: int,
    momentum: float,
) -> jax.Array:
    """EMA update of the inner boundaries (utils/ops.py:201-213).

    new = momentum * old + (1 - momentum) * batch_quantiles
    """
    batch_b = compute_bin_boundaries_from_scores(scores_z, num_bins)
    return old_boundaries * momentum + (1.0 - momentum) * batch_b


def boundaries_to_upper_lower(boundaries: jax.Array, num_bins: int):
    """(num_bins-1,) inner boundaries → (upper (nb,), lower (nb,)) with ±inf.

    upper = [inf, b1, ..., b_{nb-1}], lower = [b1, ..., b_{nb-1}, -inf]
    (utils/ops.py:216-233).  Bin i holds scores in [lower_i, upper_i).
    """
    inf = jnp.array([jnp.inf], dtype=boundaries.dtype)
    upper = jnp.concatenate([inf, boundaries])
    lower = jnp.concatenate([boundaries, -inf])
    return upper, lower


def bin_partition(
    scores: jax.Array,
    boundaries: jax.Array,
    num_bins: int,
    *,
    dynamic: bool,
    momentum: float,
    update: bool,
):
    """Z-score the scores, (optionally) update boundaries, build the bin mask.

    :param scores: (B, H, N) raw attention point scores
    :param boundaries: (num_bins - 1,) inner boundaries (current state)
    :param dynamic: whether boundaries are EMA-updated from data
    :param update: whether to apply the EMA update this call (training mode);
        evaluation uses the frozen state, mirroring the reference converting
        dynamic→static boundaries at test time (test_modelnet.py:161-175)
    :returns: ``(new_boundaries (num_bins-1,), bin_mask (B, H, N, num_bins) bool)``

    Reference: utils/ops.py:435-464.
    """
    scores_z = zscore(scores, axis=2)  # (B, H, N), biased std
    if dynamic and update:
        boundaries = update_bin_boundaries(
            boundaries, jax.lax.stop_gradient(scores_z), num_bins, momentum
        )
    upper, lower = boundaries_to_upper_lower(boundaries, num_bins)
    s = scores_z[..., None]  # (B, H, N, 1)
    bin_mask = (s < upper) & (s >= lower)  # (B, H, N, num_bins)
    return boundaries, bin_mask


def bin_weights_calculation(
    attention_bins_presoftmax: jax.Array,
    bin_mask: jax.Array,
    relu_mean_order: str,
):
    """Per-bin sampling weight = masked mean of the bin-token logits.

    :param attention_bins_presoftmax: (B, H, N, num_bins) pre-softmax
        attention of each point to each bin token
    :param bin_mask: (B, H, N, num_bins) bool
    :param relu_mean_order: 'mean_relu' (mean then ReLU) or 'relu_mean'
    :returns: ``(bin_weights (B, num_bins), bin_weights_beforerelu (B, num_bins))``

    Reference: models/downsample.py:264-284.  H is always 1 for downsample
    modules (check_config.py:158).
    """
    maskf = bin_mask.astype(attention_bins_presoftmax.dtype)
    count = jnp.sum(maskf, axis=2) + 1e-8  # (B, H, num_bins)
    if relu_mean_order == "mean_relu":
        before = jnp.sum(attention_bins_presoftmax * maskf, axis=2) / count
        before = before[:, 0, :]  # squeeze H
        weights = jax.nn.relu(before)
    elif relu_mean_order == "relu_mean":
        masked = jax.nn.relu(attention_bins_presoftmax * maskf)
        before = jnp.sum(masked, axis=2) / count
        before = before[:, 0, :]
        weights = before
    else:
        raise NotImplementedError(f"relu_mean_order: {relu_mean_order}")
    return weights, before


def calculate_num_points_to_choose(
    bin_prob: jax.Array, max_num_points: jax.Array, total: int
) -> jax.Array:
    """Iterative water-filling of the per-bin sample budget.

    :param bin_prob: (B, num_bins) nonnegative bin weights
    :param max_num_points: (B, num_bins) number of points in each bin
    :param total: M, total points to choose per cloud
    :returns: (B, num_bins) int32 counts summing to M (when feasible)

    Reference: utils/ops.py:385-432.  Rewritten as a fixed ``fori_loop`` of
    ``num_bins`` iterations (data-independent trip count → static under jit);
    the reference's early ``break`` is a no-op numerically because once the
    residual budget is 0 every later iteration adds 0.
    """
    num_bins = bin_prob.shape[1]
    max_f = max_num_points.astype(jnp.float32)
    prob0 = bin_prob * max_f + 1e-10
    chosen0 = jnp.zeros_like(prob0)

    def body(_, carry):
        prob, chosen = carry
        prob = prob / (jnp.sum(prob, axis=1, keepdims=True) + 1e-30)
        num_to_choose = total - jnp.sum(chosen, axis=1, keepdims=True)
        chosen = chosen + prob * num_to_choose
        full = chosen >= max_f
        chosen = jnp.where(full, max_f, chosen)
        prob = prob * jnp.where(full, 0.0, 1.0)
        return prob, chosen

    _, chosen = jax.lax.fori_loop(0, num_bins, body, (prob0, chosen0))
    chosen = chosen.astype(jnp.int32)

    # Dump the rounding residue into the bin with the most slack
    # (utils/ops.py:427-430).
    residue = total - jnp.sum(chosen, axis=1)  # (B,)
    slack_argmax = jnp.argmax(max_num_points - chosen, axis=1)  # (B,)
    bump = jax.nn.one_hot(slack_argmax, num_bins, dtype=jnp.int32) * residue[:, None]
    return chosen + bump
