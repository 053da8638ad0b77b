"""Jitted train / eval steps for both tasks.

One function replaces the reference's per-rank hot loop
(train_modelnet.py:321-386): on-device augmentation, forward, loss (+aux
losses), backward, optimizer update — all inside a single ``jax.jit`` over a
batch-sharded mesh.  What the reference does with explicit NCCL calls falls
out of XLA global-view semantics here:

  * DDP gradient all-reduce            → mean over the global (sharded) batch
  * ``all_reduce`` of the loss         → the loss is already global
  * SyncBatchNorm                      → BN moments are global
  * bin-boundary all_reduce in forward → the quantile sort sees the global
    score tensor (utils/ops.py:191-199 → exact global quantiles)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from samble_tpu.train.losses import (
    cross_entropy,
    stn_regularization_loss,
    token_orthogonality_loss,
)
from samble_tpu.train.state import TrainState


def _aux_losses(aux: dict, stn_factor: float, token_factor: float) -> jax.Array:
    """STN orthogonality + bin-token orthogonality (train_shapenet.py:390-413)."""
    extra = jnp.zeros((), jnp.float32)
    if stn_factor > 0 and aux.get("trans") is not None:
        extra = extra + stn_factor * stn_regularization_loss(aux["trans"])
    if token_factor > 0:
        for layer_aux in aux.get("downsample", []):
            bins_pre = layer_aux.get("attention_bins_beforesoftmax")
            if bins_pre is not None:
                extra = extra + token_factor * token_orthogonality_loss(bins_pre)
    return extra


def make_train_step(
    model,
    cfg: Any,
    task: str,  # 'cls' | 'seg'
    num_classes: int,
    augment_fn: Optional[Callable] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    Batch layout (all int labels; one-hots are built on device):
      * cls: ``(points (B,N,3), label (B,))``
      * seg: ``(points (B,N,3), seg (B,N), category (B,))``
    Returns ``(new_state, {'loss', 'preds', ['ds_idx']})``.
    """
    label_smoothing = (
        float(cfg.select("train.epsilon", 0.2))
        if cfg.select("train.label_smoothing", False)
        else 0.0
    )
    stn_factor = float(cfg.select("train.stn_regularization_loss_factor", 0) or 0)
    token_factor = float(
        cfg.select(
            "feature_learning_block.downsample.bin.token_orthognonal_loss_factor", 0
        )
        or 0
    )

    def train_step(state: TrainState, batch: tuple, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng, sampling_rng = jax.random.split(step_rng, 3)
        # dropout masks are the step's largest RNG consumers (two
        # (B, N, 1024)-scale bernoulli draws in the seg head); draw them
        # from the TPU-native RBG bit generator instead of threefry
        # (measured ~1 ms/step at B=32, N=2048 — docs/kernels.md round 5).
        # Deterministically derived from the threefry stream, so resume
        # and repro semantics are unchanged.
        dropout_rng = jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(dropout_rng, 2)).reshape(-1),
            impl="rbg",
        )
        points = batch[0]
        if augment_fn is not None:
            points = augment_fn(aug_rng, points)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if state.bin_stats is not None:
                variables["bin_stats"] = state.bin_stats
            mutable = [k for k in ("batch_stats", "bin_stats") if k in variables]
            rngs = {"dropout": dropout_rng, "sampling": sampling_rng}
            if task == "cls":
                label = batch[1]
                (logits, aux), updates = model.apply(
                    variables, points, rngs=rngs, mutable=mutable
                )
                target = jax.nn.one_hot(label, num_classes, dtype=logits.dtype)
            else:
                seg, cat = batch[1], batch[2]
                cat_oh = jax.nn.one_hot(cat, 16, dtype=points.dtype)
                (logits, aux), updates = model.apply(
                    variables, points, cat_oh, rngs=rngs, mutable=mutable
                )
                target = jax.nn.one_hot(seg, num_classes, dtype=logits.dtype)
            loss = cross_entropy(logits, target, label_smoothing)
            loss = loss + _aux_losses(aux, stn_factor, token_factor)
            return loss, (logits, aux, updates)

        (loss, (logits, aux, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, updates)
        out = {"loss": loss, "preds": jnp.argmax(logits, axis=-1)}
        if task == "seg":
            out["ds_idx"] = [a["idx"] for a in aux["downsample"]]
            if aux.get("trans") is not None:
                # ‖I − AᵀA‖_F guard for the shared STN/EdgeConv#0 front:
                # the shared kNN graph is built on PRE-transform xyz, which
                # is exact only while the STN stays near-orthogonal
                # (models/seg_model.py share_stn_front).  Logged per epoch
                # so drift out of that regime is visible, not silent.
                t = aux["trans"].astype(jnp.float32)
                eye = jnp.eye(t.shape[-1], dtype=jnp.float32)
                res = eye[None] - jnp.einsum("bij,bkj->bik", t, t)
                out["stn_ortho_residual"] = jnp.mean(
                    jnp.sqrt(jnp.sum(res * res, axis=(1, 2)))
                )
        return new_state, out

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model_eval, task: str) -> Callable:
    """Jitted eval step: forward in eval mode (frozen BN and bin boundaries,
    no dropout; downsampling still follows the configured sample_mode, so a
    'random' sampler stays stochastic at eval exactly like the reference)."""

    def eval_step(state: TrainState, points: jax.Array, cat: Optional[jax.Array],
                  rng: jax.Array):
        variables = state.variables()
        if task == "cls":
            logits, aux = model_eval.apply(
                variables, points, rngs={"sampling": rng}
            )
        else:
            cat_oh = jax.nn.one_hot(cat, 16, dtype=points.dtype)
            logits, aux = model_eval.apply(
                variables, points, cat_oh, rngs={"sampling": rng}
            )
        out = {
            "logits": logits,
            "preds": jnp.argmax(logits, axis=-1),
            "ds_idx": [a["idx"] for a in aux["downsample"]],
        }
        return out

    return jax.jit(eval_step)


def make_vote_eval_step(
    model_eval, task: str, num_vote: int, vote_augment_fn: Callable
) -> Callable:
    """TTA/voting eval: average logits over ``num_vote`` forward passes, the
    first on the raw points and the rest on anisotropic-scaled copies
    (train_modelnet.py:431-441, utils/dataloader.py:106-114,482-496).

    The first (non-augmented) pass runs outside the scan and keeps its full
    aux, so per-ds-layer downsample indices stay available during voted
    validation — the reference computes per-layer downsampled mIoU from
    exactly this pass (train_shapenet.py:550-602).  The remaining
    ``num_vote - 1`` augmented passes run as a ``lax.scan`` over per-vote
    RNG keys."""

    def one_forward(state, points, cat, rng, with_aux=False):
        variables = state.variables()
        if task == "cls":
            logits, aux = model_eval.apply(variables, points, rngs={"sampling": rng})
        else:
            cat_oh = jax.nn.one_hot(cat, 16, dtype=points.dtype)
            logits, aux = model_eval.apply(
                variables, points, cat_oh, rngs={"sampling": rng}
            )
        return (logits, aux) if with_aux else logits

    def vote_step_wrapped(state, points, cat, rng):
        keys = jax.random.split(rng, num_vote)
        # first pass on the raw points; its downsample indices feed the
        # per-ds-layer mIoU metric just like the plain eval step's
        logits0, aux0 = one_forward(state, points, cat, keys[0], with_aux=True)

        def body(carry, key):
            aug_key, samp_key = jax.random.split(key)
            logits = one_forward(state, vote_augment_fn(aug_key, points), cat,
                                 samp_key)
            return carry + logits, None

        total, _ = jax.lax.scan(body, logits0, keys[1:])
        logits = total / num_vote
        return {
            "logits": logits,
            "preds": jnp.argmax(logits, axis=-1),
            "ds_idx": [a["idx"] for a in aux0["downsample"]],
        }

    return jax.jit(vote_step_wrapped)
