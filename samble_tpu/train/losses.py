"""Loss functions.

Reference: torch ``CrossEntropyLoss`` with optional label smoothing
(train_modelnet.py:299-304), STN orthogonality (utils/loss.py:4-14), and
SAMBLE bin-token orthogonality (utils/loss.py:17-27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array,
    target_onehot: jax.Array,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean cross entropy with (soft) one-hot targets.

    Matches ``torch.nn.CrossEntropyLoss(reduction='mean',
    label_smoothing=eps)`` fed with probability targets.  For segmentation
    ``logits``/targets may carry extra leading axes — every axis except the
    last (classes) is averaged.
    """
    num_classes = logits.shape[-1]
    if label_smoothing > 0.0:
        target_onehot = (
            target_onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
        )
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_onehot * logp, axis=-1))


def stn_regularization_loss(trans: jax.Array) -> jax.Array:
    """mean_B ‖T·Tᵀ − I‖_F for the (B, 3, 3) STN transform
    (utils/loss.py:4-14)."""
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    delta = jnp.einsum("bij,bkj->bik", trans, trans) - eye
    return jnp.mean(jnp.sqrt(jnp.sum(delta * delta, axis=(1, 2)) + 1e-12))


def token_orthogonality_loss(bins_presoftmax: jax.Array) -> jax.Array:
    """Σ off-diagonal entries of TᵀT over the per-point bin-token logits.

    :param bins_presoftmax: (B, N, num_bins) — the reference passes the
        module's ``attention_bins_beforesoftmax`` (train_shapenet.py:401-413,
        utils/loss.py:17-27) and sums over the whole batch.
    """
    gram = jnp.einsum("bnc,bnd->bcd", bins_presoftmax, bins_presoftmax)
    diag = jnp.eye(gram.shape[-1], dtype=gram.dtype)
    return jnp.sum(gram * (1.0 - diag))
