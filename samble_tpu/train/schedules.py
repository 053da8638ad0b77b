"""Learning-rate schedules and optimizer construction (optax).

Reference dispatch: train_modelnet.py:253-296 (AdamW/SGD + four schedulers)
and utils/lr_scheduler.py:5-27 (warmup-cosine).  Schedules are per-epoch in
the reference (``scheduler.step()`` once per epoch); here they are expressed
as functions of the global step with ``steps_per_epoch`` granularity so the
whole optimizer lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import optax


def make_lr_schedule(train_cfg: Any, steps_per_epoch: int) -> Callable:
    """Schedule(step) → lr, matching the reference's per-epoch schedulers."""
    base_lr = float(train_cfg.lr)
    sch = train_cfg.lr_scheduler
    if not sch.enable:
        return lambda step: base_lr

    which = sch.which

    if which == "stepLR":
        gamma = float(sch.stepLR.gamma)
        decay = int(sch.stepLR.decay_step)

        def fn(step):
            epoch = step // steps_per_epoch
            return base_lr * gamma ** (epoch // decay)

    elif which == "expLR":
        gamma = float(sch.expLR.gamma)

        def fn(step):
            epoch = step // steps_per_epoch
            return base_lr * gamma**epoch

    elif which == "cosLR":
        t_max = int(sch.cosLR.T_max)
        eta_min = float(sch.cosLR.eta_min)

        def fn(step):
            # freeze at eta_min once past T_max (train_modelnet.py:391-398)
            epoch = jnp.minimum(step // steps_per_epoch, t_max)
            return eta_min + 0.5 * (base_lr - eta_min) * (
                1.0 + jnp.cos(jnp.pi * epoch / t_max)
            )

    elif which == "cos_warmupLR":
        warm = int(sch.cos_warmupLR.warmup_epochs)
        w_init = float(sch.cos_warmupLR.warmup_init_lr)
        t_max = int(sch.cos_warmupLR.T_max)
        eta_min = float(sch.cos_warmupLR.eta_min)

        def fn(step):
            # utils/lr_scheduler.py:9-23
            epoch = step // steps_per_epoch
            warm_lr = w_init + (base_lr - w_init) / max(warm - 1, 1) * epoch
            cos_lr = eta_min + 0.5 * (base_lr - eta_min) * (
                1.0 + jnp.cos((epoch - warm + 1) / t_max * jnp.pi)
            )
            return jnp.where(epoch < warm, warm_lr, cos_lr)

    else:
        raise ValueError(f"unknown lr scheduler: {which}")

    return fn


def make_optimizer(train_cfg: Any, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW or SGD(momentum 0.9) with optional gradient clipping.

    Torch-parity notes: weight decay applies to *all* parameters (the
    reference does not mask BN/bias, train_modelnet.py:253-258); AdamW betas
    (0.9, 0.999), eps 1e-8.
    """
    schedule = make_lr_schedule(train_cfg, steps_per_epoch)
    which = train_cfg.optimizer.which.lower()
    wd = float(train_cfg.optimizer.weight_decay)
    if which == "adamw":
        tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    elif which == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        raise ValueError(f"optimizer must be adamw or sgd, got {which}")

    clip = train_cfg.get("grad_clip")
    if clip is not None and clip.get("enable", False):
        if clip.mode == "value":
            tx = optax.chain(optax.clip(float(clip.value)), tx)
        elif clip.mode == "norm":
            tx = optax.chain(optax.clip_by_global_norm(float(clip.max_norm)), tx)
        else:
            raise ValueError("grad_clip.mode must be value or norm")
    return tx
