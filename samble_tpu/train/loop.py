"""Full training orchestration for both workloads.

Replaces the reference's per-rank training scripts
(train_modelnet.py:78-546, train_shapenet.py:81-737): one host process, one
mesh, batch-sharded jitted steps.  Validation (with optional TTA voting),
best-checkpoint tracking, per-ds-layer segmentation mIoU with cross-layer
index remapping, CSV/JSONL metric logging, and optional wandb are all here.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu.config import check_config
from samble_tpu.ops.sampling import fps as ops_fps
from samble_tpu.data import (
    BatchLoader,
    ModelNetDataset,
    ShapeNetDataset,
    download_modelnet,
    download_shapenet,
    make_batch_augment,
    synthetic_modelnet,
    synthetic_shapenet,
)
from samble_tpu.data.augmentation import make_vote_augment
from samble_tpu.models import ClsModel, SegModel
from samble_tpu.parallel import (
    BarrierOnFirstCall,
    fetch,
    make_mesh,
    maybe_init_distributed,
    replicate_state,
    shard_batch,
)
from samble_tpu.train import metrics as metrics_mod
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state
from samble_tpu.train.step import make_eval_step, make_train_step, make_vote_eval_step
from samble_tpu.utils.logging import MetricLogger, ProgressBar


def _host_ce(logits: np.ndarray, labels: np.ndarray) -> float:
    """Plain CE from eval logits on host (reference logs val loss,
    train_modelnet.py:447,477).  No smoothing: matches the reference's
    validation loss which uses the raw criterion on logits."""
    logits = np.asarray(logits, np.float32)
    logits = logits - logits.max(axis=-1, keepdims=True)
    logz = np.log(np.exp(logits).sum(axis=-1))
    picked = np.take_along_axis(logits, labels[..., None].astype(np.int64), -1)
    return float((logz - picked[..., 0]).mean())


def _seed_from_config(cfg) -> int:
    seed = int(cfg.select("train.ddp.random_seed", 0) or 0)
    if seed == 0:
        seed = int(time.time()) % (2**31)
        if jax.process_count() > 1:
            # the wall-clock fallback must agree across processes: loaders
            # are seeded with it, and shard_batch assumes every process
            # holds the SAME global batch
            from jax.experimental import multihost_utils

            seed = int(
                multihost_utils.broadcast_one_to_all(np.int32(seed))
            )
    # always surface the effective value: with the reference's seed-0 →
    # wall-clock convention, reproducing a run depends on this line
    print(f"[run] effective random seed: {seed}", flush=True)
    return seed


def _normal_channel(cfg) -> bool:
    return bool(
        cfg.select("feature_learning_block.embedding.normal_channel", False)
    )


def _load_modelnet(cfg, synthetic: bool):
    dl = cfg.train.dataloader
    if synthetic:
        nc = _normal_channel(cfg)
        return (
            synthetic_modelnet(256, num_points=2048, with_normals=nc),
            synthetic_modelnet(64, num_points=2048, seed=1, with_normals=nc),
        )
    saved = cfg.datasets.saved_path
    try:
        download_modelnet(cfg.datasets.url, saved)
    except Exception as e:  # zero-egress environments
        print(f"[data] download skipped ({e}); expecting files under {saved}")
    return (
        ModelNetDataset.from_hdf5(saved, "trainval"),
        ModelNetDataset.from_hdf5(saved, "test"),
    )


def _load_shapenet(cfg, synthetic: bool):
    dl = cfg.train.dataloader
    if synthetic:
        nc = _normal_channel(cfg)
        return (
            synthetic_shapenet(256, num_points=2048, with_normals=nc),
            synthetic_shapenet(64, num_points=2048, seed=1, with_normals=nc),
        )
    saved = cfg.datasets.saved_path
    try:
        download_shapenet(cfg.datasets.url, saved)
    except Exception as e:
        print(f"[data] download skipped ({e}); expecting files under {saved}")
    part = "trainval" if cfg.train.dataloader.combine_trainval else "train"
    return (
        ShapeNetDataset.from_hdf5(saved, part),
        ShapeNetDataset.from_hdf5(saved, "test"),
    )


def train_modelnet(
    cfg, workdir: str, synthetic_data: bool = False, resume: bool = False
) -> Dict[str, Any]:
    """ModelNet40 classification training (reference train_modelnet.py).

    ``resume=True`` restores the latest checkpoint under
    ``workdir/checkpoints`` (full state: params, BN stats, bin boundaries,
    optimizer, step) and continues from the next epoch — a capability the
    reference lacks (it saves state_dict only, train_modelnet.py:491-509).
    """
    check_config(cfg)
    # must run before ANY backend-initializing jax call (device_count,
    # random.key, ...) — jax.distributed.initialize raises otherwise
    maybe_init_distributed(cfg)
    os.makedirs(workdir, exist_ok=True)
    seed = _seed_from_config(cfg)
    # persist the EFFECTIVE seed into the saved run config: the
    # eval-determinism convention derives every eval sampling/vote
    # key from it (fold_in(key(seed+2), batch)), so a resurrected
    # test CLI must see the same value, not the wall-clock fallback
    cfg.set_dotted("train.ddp.random_seed", seed)
    rng = jax.random.key(seed)

    train_set, test_set = _load_modelnet(cfg, synthetic_data)
    dl = cfg.train.dataloader
    bs = int(dl.batch_size_per_gpu) * jax.device_count()
    n_sel = int(dl.selected_points)
    # FPS subsampling (utils/dataloader.py:159-169): select the per-cloud
    # point budget by farthest-point sampling on device instead of the
    # host-side random choice.
    use_fps = bool(dl.get("fps", False))
    loader_sel = train_set.pcd.shape[1] if use_fps else n_sel
    fps_select = (
        jax.jit(lambda key, pts: ops_fps(key, pts, pts[..., :3], n_sel)[0])
        if use_fps
        else None
    )
    # training batches come from the native C++ producer when buildable
    # (samble_tpu/native: shuffling + subsampling off the Python thread,
    # double-buffered); numpy BatchLoader otherwise.  Validation stays on
    # the deterministic numpy loader.
    from samble_tpu.native import make_train_loader

    train_loader = make_train_loader(
        train_set.pcd, train_set.label, batch_size=bs,
        selected_points=loader_sel, shuffle=True, drop_last=True, seed=seed,
        native=str(cfg.select("train.dataloader.native", "auto")),
    )
    val_loader = BatchLoader(
        test_set.pcd, test_set.label, batch_size=bs,
        selected_points=loader_sel, shuffle=False,
        drop_last=False, seed=seed + 1, per_item_seed=0,
    )

    mesh = make_mesh()
    # train.amp → bfloat16 compute (params/BN stats stay f32), the TPU
    # analog of the reference's torch.cuda.amp path (train_modelnet.py:324)
    dtype = jnp.bfloat16 if bool(cfg.select("train.amp", False)) else jnp.float32
    model = ClsModel(cfg=cfg, num_classes=40, train=True, dtype=dtype)
    model_eval = ClsModel(cfg=cfg, num_classes=40, train=False, dtype=dtype)
    tx = make_optimizer(cfg.train, steps_per_epoch=len(train_loader))
    in_ch = 6 if _normal_channel(cfg) else 3
    example = (np.zeros((bs, int(dl.selected_points), in_ch), np.float32),)
    state = create_train_state(model, example, tx, rng)
    state = replicate_state(mesh, state)

    aug_cfg = dl.data_augmentation
    augment = make_batch_augment(aug_cfg) if aug_cfg.enable else None
    train_step = BarrierOnFirstCall(
        make_train_step(model, cfg, "cls", 40, augment_fn=augment), "cls_train"
    )
    eval_step = BarrierOnFirstCall(make_eval_step(model_eval, "cls"), "cls_eval")
    vote_cfg = dl.get("vote")
    vote_enable = bool(vote_cfg.enable) if vote_cfg is not None else False
    if vote_enable:
        vote_step = BarrierOnFirstCall(
            make_vote_eval_step(
                model_eval, "cls", int(vote_cfg.num_vote), make_vote_augment(aug_cfg)
            ),
            "cls_vote",
        )

    # record run-level flags in run_config.json so resume/eval with
    # ckpt=/workdir= alone reconstructs them (synthetic_data is a CLI
    # special, not a model-config key)
    cfg.set_dotted("run.synthetic_data", bool(synthetic_data))
    logger = MetricLogger(workdir, cfg)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    if not resume:
        ckpt.reset_best()  # a stale sidecar from a reused dir would
        # otherwise suppress saves after a later resume
    best_acc = 0.0
    epochs = int(cfg.train.epochs)
    val_freq = int(cfg.train.validation_freq)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state = replicate_state(mesh, ckpt.restore(state))
        start_epoch = int(state.step) // max(len(train_loader), 1)
        best_acc = ckpt.best_metric or 0.0
        print(f"[resume] restored step {int(state.step)} → epoch {start_epoch} "
              f"(best metric {best_acc:.4f})")

    debug_nan = bool(cfg.select("train.debug.enable", False)) and bool(
        cfg.select("train.debug.nan_check", True)
    )

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses, preds_all, labels_all = [], [], []
        bar = ProgressBar(len(train_loader), f"epoch {epoch + 1}/{epochs}")
        for bi, batch in enumerate(train_loader):
            points, label, _ = batch
            points, label = shard_batch(mesh, (points, label))
            if use_fps:
                points = fps_select(
                    jax.random.fold_in(jax.random.key(seed + 3), epoch * 65536 + bi),
                    points,
                )
            state, out = train_step(state, (points, label), rng)
            if debug_nan and not np.isfinite(float(out["loss"])):
                raise FloatingPointError(
                    f"non-finite train loss at epoch {epoch} step {bi}: "
                    f"{float(out['loss'])}"
                )
            losses.append(out["loss"])
            # fetch (not np.asarray): batch-sharded outputs are not
            # process-addressable under multi-host; fetch all-gathers first
            preds_all.append(fetch(out["preds"]))
            labels_all.append(fetch(label))
            # display the PREVIOUS step's loss: it is materialized by now,
            # so the bar never forces a sync on the in-flight step
            bar.update(
                bi + 1,
                loss=float(losses[-2]) if len(losses) > 1 else None,
            )
        bar.finish()
        train_loss = float(np.mean([float(l) for l in losses]))
        train_acc = metrics_mod.accuracy(
            np.concatenate(preds_all), np.concatenate(labels_all)
        )
        epoch_metrics = {
            "epoch": epoch,
            "train/loss": train_loss,
            "train/acc": train_acc,
            "train/epoch_time_s": time.time() - t0,
        }

        if (epoch + 1) % val_freq == 0:
            preds_all, labels_all, logits_all = [], [], []
            use_vote = vote_enable and (epoch + 1) >= int(vote_cfg.vote_start_epoch)
            for i, batch in enumerate(val_loader):
                points, label, valid = batch
                points_d = shard_batch(mesh, points)
                key = jax.random.fold_in(jax.random.key(seed + 2), i)
                if use_fps:
                    points_d = fps_select(jax.random.fold_in(key, 1), points_d)
                if use_vote:
                    out = vote_step(state, points_d, None, key)
                else:
                    out = eval_step(state, points_d, None, key)
                preds_all.append(fetch(out["preds"])[valid])
                labels_all.append(label[valid])
                logits_all.append(fetch(out["logits"])[valid])
            labels_cat = np.concatenate(labels_all)
            val_acc = metrics_mod.accuracy(np.concatenate(preds_all), labels_cat)
            val_loss = _host_ce(np.concatenate(logits_all), labels_cat)
            is_best = val_acc >= best_acc
            best_acc = max(best_acc, val_acc)
            epoch_metrics.update(
                {"val/loss": val_loss, "val/acc": val_acc, "val/best_acc": best_acc}
            )
            if is_best:
                ckpt.save(epoch, state, metric=val_acc)
                logger.publish_checkpoint(ckpt.directory, epoch, val_acc)
        logger.log(epoch_metrics)

    logger.close()
    ckpt.close()
    return {"best_acc": best_acc, "state": state}


def train_shapenet(
    cfg, workdir: str, synthetic_data: bool = False, resume: bool = False
) -> Dict[str, Any]:
    """ShapeNet part-seg training with per-ds-layer mIoU
    (reference train_shapenet.py incl. :550-637 index remapping)."""
    check_config(cfg)
    maybe_init_distributed(cfg)  # before any backend-initializing jax call
    os.makedirs(workdir, exist_ok=True)
    seed = _seed_from_config(cfg)
    # persist the EFFECTIVE seed into the saved run config: the
    # eval-determinism convention derives every eval sampling/vote
    # key from it (fold_in(key(seed+2), batch)), so a resurrected
    # test CLI must see the same value, not the wall-clock fallback
    cfg.set_dotted("train.ddp.random_seed", seed)
    rng = jax.random.key(seed)

    train_set, test_set = _load_shapenet(cfg, synthetic_data)
    dl = cfg.train.dataloader
    bs = int(dl.batch_size_per_gpu) * jax.device_count()
    n_sel = int(dl.selected_points)
    use_fps = bool(dl.get("fps", False))
    loader_sel = train_set.pcd.shape[1] if use_fps else n_sel
    fps_idx_fn = (
        jax.jit(lambda key, pts: ops_fps(key, pts, pts[..., :3], n_sel)[1])
        if use_fps
        else None
    )
    from samble_tpu.native import make_train_loader

    train_loader = make_train_loader(
        train_set.pcd, train_set.label, train_set.seg, batch_size=bs,
        selected_points=loader_sel, shuffle=True, drop_last=True, seed=seed,
        native=str(cfg.select("train.dataloader.native", "auto")),
    )
    val_loader = BatchLoader(
        test_set.pcd, test_set.label, test_set.seg, batch_size=bs,
        selected_points=loader_sel, shuffle=False, drop_last=False,
        seed=seed + 1, per_item_seed=0,
    )

    def _fps_batch(key, points, seg):
        idx = fps_idx_fn(key, points)
        pts = np.take_along_axis(np.asarray(points), np.asarray(idx)[..., None], 1)
        sg = np.take_along_axis(np.asarray(seg), np.asarray(idx), 1)
        return pts, sg

    mesh = make_mesh()
    dtype = jnp.bfloat16 if bool(cfg.select("train.amp", False)) else jnp.float32
    model = SegModel(cfg=cfg, num_parts=50, train=True, dtype=dtype)
    model_eval = SegModel(cfg=cfg, num_parts=50, train=False, dtype=dtype)
    tx = make_optimizer(cfg.train, steps_per_epoch=len(train_loader))
    example = (
        np.zeros((bs, n_sel, 6 if _normal_channel(cfg) else 3), np.float32),
        np.zeros((bs, 16), np.float32),
    )
    state = create_train_state(model, example, tx, rng)
    state = replicate_state(mesh, state)

    aug_cfg = dl.data_augmentation
    augment = make_batch_augment(aug_cfg) if aug_cfg.enable else None
    train_step = BarrierOnFirstCall(
        make_train_step(model, cfg, "seg", 50, augment_fn=augment), "seg_train"
    )
    eval_step = BarrierOnFirstCall(make_eval_step(model_eval, "seg"), "seg_eval")
    vote_cfg = dl.get("vote")
    vote_enable = bool(vote_cfg.enable) if vote_cfg is not None else False
    if vote_enable:
        vote_step = BarrierOnFirstCall(
            make_vote_eval_step(
                model_eval, "seg", int(vote_cfg.num_vote), make_vote_augment(aug_cfg)
            ),
            "seg_vote",
        )

    parts_mask = metrics_mod.parts_matrix(cfg.datasets.mapping)
    shape_iou_fn = jax.jit(
        lambda p, l, c: metrics_mod.shape_iou(p, l, c, parts_mask)
    )

    # record run-level flags in run_config.json so resume/eval with
    # ckpt=/workdir= alone reconstructs them (synthetic_data is a CLI
    # special, not a model-config key)
    cfg.set_dotted("run.synthetic_data", bool(synthetic_data))
    logger = MetricLogger(workdir, cfg)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    if not resume:
        ckpt.reset_best()
    best_miou = 0.0
    epochs = int(cfg.train.epochs)
    val_freq = int(cfg.train.validation_freq)
    num_ds = len(cfg.feature_learning_block.downsample.M)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state = replicate_state(mesh, ckpt.restore(state))
        start_epoch = int(state.step) // max(len(train_loader), 1)
        best_miou = ckpt.best_metric or 0.0
        print(f"[resume] restored step {int(state.step)} → epoch {start_epoch} "
              f"(best metric {best_miou:.4f})")

    debug_nan = bool(cfg.select("train.debug.enable", False)) and bool(
        cfg.select("train.debug.nan_check", True)
    )

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses, ious, cats = [], [], []
        bar = ProgressBar(len(train_loader), f"epoch {epoch + 1}/{epochs}")
        for bi, batch in enumerate(train_loader):
            points, label, seg, _ = batch
            if use_fps:
                points, seg = _fps_batch(
                    jax.random.fold_in(jax.random.key(seed + 3), epoch * 65536 + bi),
                    points, seg,
                )
            points, label, seg = shard_batch(mesh, (points, label, seg))
            state, out = train_step(state, (points, seg, label), rng)
            if debug_nan and not np.isfinite(float(out["loss"])):
                raise FloatingPointError(
                    f"non-finite train loss at epoch {epoch} step {bi}"
                )
            losses.append(float(out["loss"]))
            ious.append(fetch(shape_iou_fn(out["preds"], seg, label)))
            cats.append(fetch(label))
            bar.update(bi + 1, loss=losses[-1])
        bar.finish()
        train_loss = float(np.mean(losses))
        train_miou = float(np.concatenate(ious).mean())
        epoch_metrics = {
            "epoch": epoch,
            "train/loss": train_loss,
            "train/mIoU": train_miou,
            "train/epoch_time_s": time.time() - t0,
        }
        if "stn_ortho_residual" in out:
            # shared-STN-front guard (train/step.py): drift away from
            # orthogonality would invalidate the shared pre-transform
            # kNN graph — keep it visible in every epoch record
            epoch_metrics["train/stn_ortho_residual"] = float(
                out["stn_ortho_residual"]
            )

        if (epoch + 1) % val_freq == 0:
            use_vote = vote_enable and (epoch + 1) >= int(vote_cfg.vote_start_epoch)
            all_iou, all_cat, val_losses = [], [], []
            ds_preds = [[] for _ in range(num_ds)]
            ds_labels = [[] for _ in range(num_ds)]
            for i, batch in enumerate(val_loader):
                points, label, seg, valid = batch
                key = jax.random.fold_in(jax.random.key(seed + 2), i)
                if use_fps:
                    points, seg = _fps_batch(jax.random.fold_in(key, 1), points, seg)
                points_d, label_d = shard_batch(mesh, (points, label))
                if use_vote:
                    out = vote_step(state, points_d, label_d, key)
                else:
                    out = eval_step(state, points_d, label_d, key)
                preds = fetch(out["preds"])
                iou = fetch(shape_iou_fn(out["preds"], seg, label))
                all_iou.append(iou[valid])
                all_cat.append(label[valid])
                val_losses.append(
                    _host_ce(fetch(out["logits"])[valid], seg[valid])
                )
                if "ds_idx" in out:
                    # per-ds-layer mIoU with index remapping through layers
                    remapped = metrics_mod.downsampled_iou_labels(
                        preds, seg, [fetch(ix) for ix in out["ds_idx"]]
                    )
                    for l, (p_l, s_l) in enumerate(remapped):
                        ds_preds[l].append(p_l[valid])
                        ds_labels[l].append(s_l[valid])
            all_iou = np.concatenate(all_iou)
            all_cat = np.concatenate(all_cat)
            val_miou = float(all_iou.mean())
            cat_miou = metrics_mod.category_miou(all_iou, all_cat, cfg.datasets.mapping)
            val_cat_miou = float(np.nanmean(list(cat_miou.values())))
            is_best = val_miou >= best_miou
            best_miou = max(best_miou, val_miou)
            epoch_metrics.update(
                {
                    "val/loss": float(np.mean(val_losses)),
                    "val/mIoU": val_miou,
                    "val/category_mIoU": val_cat_miou,
                    "val/best_mIoU": best_miou,
                }
            )
            for l in range(num_ds):
                if ds_preds[l]:
                    p_l = np.concatenate(ds_preds[l])
                    s_l = np.concatenate(ds_labels[l])
                    iou_l = fetch(
                        shape_iou_fn(jnp.asarray(p_l), jnp.asarray(s_l), jnp.asarray(all_cat))
                    )
                    epoch_metrics[f"val/dsLayer{l + 1}_mIoU"] = float(iou_l.mean())
            if is_best:
                ckpt.save(epoch, state, metric=val_miou)
                logger.publish_checkpoint(ckpt.directory, epoch, val_miou)
        logger.log(epoch_metrics)

    logger.close()
    ckpt.close()
    return {"best_miou": best_miou, "state": state}
