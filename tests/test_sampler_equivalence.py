"""Statistical equivalence: Gumbel-top-k per-bin sampler vs the reference's
``torch.multinomial(replacement=False)`` semantics (SURVEY.md §7 hard part 1).

The reference samples k items per bin without replacement with probabilities
∝ exp(tanh(zscore(score)) · T⁻¹) (utils/ops.py:516-598).  By the Gumbel-top-k
theorem our sampler draws from exactly the same distribution; these tests
check it empirically against torch's sampler on identical inputs — both the
single-draw marginals and the without-replacement *sequence* behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from samble_tpu import ops


def _marginals_from_sampler(scores, mask, k_counts, trials, boltzmann_t):
    n = scores.shape[-1]
    hits = np.zeros(n)
    m = int(np.asarray(k_counts).sum())
    sample = jax.jit(
        lambda key: ops.generate_downsampled_index(
            key, m, scores, mask, k_counts, "random", boltzmann_t
        )
    )
    for t in range(trials):
        idx = np.asarray(sample(jax.random.key(t)))[0]
        hits[idx] += 1
    return hits / trials


def _marginals_from_torch(probs_by_bin, k_by_bin, trials, seed=0):
    """Torch oracle: multinomial without replacement per bin, take k each."""
    g = torch.Generator().manual_seed(seed)
    n = probs_by_bin.shape[1]
    hits = np.zeros(n)
    for _ in range(trials):
        for j in range(probs_by_bin.shape[0]):
            k = int(k_by_bin[j])
            if k == 0:
                continue
            idx = torch.multinomial(
                probs_by_bin[j], num_samples=k, replacement=False, generator=g
            )
            hits[idx.numpy()] += 1
    return hits / trials


def test_gumbel_matches_torch_multinomial_marginals():
    rng = np.random.default_rng(0)
    n, nb = 24, 2
    trials = 3000
    boltzmann_t = 0.5
    raw = rng.normal(size=(1, 1, n)).astype(np.float32)
    bin_id = rng.integers(0, nb, n)
    mask = np.zeros((1, 1, n, nb), bool)
    mask[0, 0, np.arange(n), bin_id] = True
    k_counts = np.zeros((1, nb), np.int32)
    for j in range(nb):
        k_counts[0, j] = max(1, (bin_id == j).sum() // 3)

    # the reference's sampling probabilities (utils/ops.py:517-560)
    z = (raw[0, 0] - raw[0, 0].mean()) / raw[0, 0].std()
    logit = np.tanh(z) / boltzmann_t
    probs_by_bin = np.zeros((nb, n))
    for j in range(nb):
        p = np.exp(logit) * (bin_id == j)
        probs_by_bin[j] = p / p.sum()

    ours = _marginals_from_sampler(
        jnp.asarray(raw), jnp.asarray(mask), jnp.asarray(k_counts),
        trials, boltzmann_t,
    )
    theirs = _marginals_from_torch(
        torch.tensor(probs_by_bin), k_counts[0], trials
    )
    # inclusion probabilities agree within Monte-Carlo noise
    # (binomial std ≈ sqrt(p(1-p)/trials) ≤ 0.009; use 5σ)
    np.testing.assert_allclose(ours, theirs, atol=0.05)


def test_gumbel_without_replacement_sequence_order():
    """First-selected-element distribution must match the categorical
    distribution itself (property of sequential sampling w/o replacement)."""
    rng = np.random.default_rng(1)
    n, trials = 12, 4000
    raw = rng.normal(size=(1, 1, n)).astype(np.float32)
    mask = jnp.ones((1, 1, n, 1), bool)
    k = jnp.full((1, 1), 3, jnp.int32)
    z = (raw[0, 0] - raw[0, 0].mean()) / raw[0, 0].std()
    logit = np.tanh(z) / 0.5
    p_ref = np.exp(logit) / np.exp(logit).sum()

    sample = jax.jit(
        lambda key: ops.generate_downsampled_index(
            key, 3, jnp.asarray(raw), mask, k, "random", 0.5
        )
    )
    first_hits = np.zeros(n)
    for t in range(trials):
        idx = np.asarray(sample(jax.random.key(t)))[0]
        first_hits[idx[0]] += 1
    np.testing.assert_allclose(first_hits / trials, p_ref, atol=0.04)
