"""Standalone evaluation harnesses (reference test_modelnet.py /
test_shapenet.py): checkpoint restore, TTA voting, per-layer introspection.

The reference gathers ragged per-bin index lists across GPUs for
visualization with a hand-rolled size-table gather
(utils/ops.py:289-382, test_shapenet.py:278-334); here every introspection
tensor is fixed-shape (scores, indices, bin masks, bin probabilities), so a
plain host transfer replaces the whole machinery — ragged per-bin chunks
can be derived on host from ``bin_points_mask`` when needed.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from samble_tpu.data import BatchLoader
from samble_tpu.data.augmentation import make_vote_augment
from samble_tpu.models import ClsModel, SegModel
from samble_tpu.parallel import (BarrierOnFirstCall, fetch, make_mesh,
                                 replicate_state, shard_batch)
from samble_tpu.train import metrics as metrics_mod
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.loop import (_load_modelnet, _load_shapenet,
                                   _seed_from_config)
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state
from samble_tpu.train.step import make_eval_step, make_vote_eval_step


def _make_introspect_step(model_eval, task: str):
    """Eval step that also returns the downsample aux (fixed-shape)."""

    def step(state, points, cat, rng):
        variables = state.variables()
        if task == "cls":
            logits, aux = model_eval.apply(variables, points, rngs={"sampling": rng})
        else:
            cat_oh = jax.nn.one_hot(cat, 16, dtype=points.dtype)
            logits, aux = model_eval.apply(
                variables, points, cat_oh, rngs={"sampling": rng}
            )
        keep = {}
        for l, a in enumerate(aux["downsample"]):
            for k in ("attention_point_score", "idx", "bin_prob",
                      "k_point_to_choose", "bin_points_mask"):
                if a.get(k) is not None:
                    keep[f"layer{l}/{k}"] = a[k]
        return {"logits": logits, "preds": jnp.argmax(logits, -1), **keep}

    return jax.jit(step)


def _restore(cfg, model, example, ckpt_dir: str, rng, task: str):
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    template = create_train_state(model, example, tx, rng)
    if os.path.isfile(ckpt_dir) and ckpt_dir.endswith(".pt"):
        # a reference torch checkpoint (train_modelnet.py:491-509 format):
        # import weights + bin boundaries in place of the Orbax restore
        return _graft_torch_checkpoint(template, cfg, ckpt_dir, task)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(template)
    mgr.close()
    return state


def _graft_torch_checkpoint(template, cfg, path: str, task: str):
    """Replace the template's model variables with a converted reference
    torch checkpoint (samble_tpu.interop); optimizer state stays fresh —
    the reference saves none (SURVEY.md §5 checkpointing)."""
    from samble_tpu import interop

    imported = interop.load_torch_checkpoint(path, cfg, task)

    def _check(name, tmpl, got):
        t_paths = {
            tuple(str(k.key) for k in p): np.shape(l)
            for p, l in jax.tree_util.tree_flatten_with_path(tmpl)[0]
        }
        g_paths = {
            tuple(str(k.key) for k in p): np.shape(l)
            for p, l in jax.tree_util.tree_flatten_with_path(got)[0]
        }
        if t_paths != g_paths:
            missing = set(t_paths) - set(g_paths)
            extra = set(g_paths) - set(t_paths)
            shapes = {
                k for k in set(t_paths) & set(g_paths)
                if t_paths[k] != g_paths[k]
            }
            raise ValueError(
                f"torch checkpoint does not match this config's {name} tree: "
                f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
                f"shape-mismatch={sorted(shapes)[:5]}"
            )

    as_f32 = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    _check("params", template.params, imported["params"])
    kwargs = {"params": as_f32(imported["params"])}
    if template.batch_stats is not None:
        _check("batch_stats", template.batch_stats, imported["batch_stats"])
        kwargs["batch_stats"] = as_f32(imported["batch_stats"])
    if template.bin_stats is not None and "bin_stats" in imported:
        _check("bin_stats", template.bin_stats, imported["bin_stats"])
        kwargs["bin_stats"] = jax.tree_util.tree_map(
            lambda t, g: jnp.asarray(g, jnp.asarray(t).dtype),
            template.bin_stats, imported["bin_stats"],
        )
    return template.replace(**kwargs)


def evaluate_modelnet(
    cfg, ckpt_dir: str, workdir: str, synthetic_data: bool = False,
    introspect: bool = False,
) -> Dict[str, Any]:
    """Reference test_modelnet.py: accuracy (+voting, +introspection dumps)."""
    os.makedirs(workdir, exist_ok=True)
    _, test_set = _load_modelnet(cfg, synthetic_data)
    dl = cfg.test.dataloader
    bs = int(dl.batch_size_per_gpu) * jax.device_count()
    n_sel = int(cfg.train.dataloader.selected_points)
    loader = BatchLoader(
        test_set.pcd, test_set.label, batch_size=bs, selected_points=n_sel,
        shuffle=False, drop_last=False, seed=0, per_item_seed=0,
    )
    mesh = make_mesh()
    model_train = ClsModel(cfg=cfg, num_classes=40, train=True)
    model_eval = ClsModel(cfg=cfg, num_classes=40, train=False)
    in_ch = 6 if cfg.select(
        "feature_learning_block.embedding.normal_channel", False) else 3
    example = (np.zeros((bs, n_sel, in_ch), np.float32),)
    state = _restore(cfg, model_train, example, ckpt_dir, jax.random.key(0),
                     "cls")
    state = replicate_state(mesh, state)

    vote_cfg = dl.get("vote")
    use_vote = vote_cfg is not None and bool(vote_cfg.enable)
    if use_vote:
        step = make_vote_eval_step(
            model_eval, "cls", int(vote_cfg.num_vote),
            make_vote_augment(cfg.train.dataloader.data_augmentation),
        )
        # introspection + voting: the voted step averages logits over TTA
        # copies and has no single per-layer aux, so dumps come from one
        # additional NON-voted pass per batch (predictions stay voted)
        intro_step = _make_introspect_step(model_eval, "cls") if introspect else None
    else:
        intro_step = None
        step = (
            _make_introspect_step(model_eval, "cls")
            if introspect
            else make_eval_step(model_eval, "cls")
        )
    step = BarrierOnFirstCall(step, "cls_eval_main")
    if intro_step is not None:
        intro_step = BarrierOnFirstCall(intro_step, "cls_eval_intro")

    preds_all, labels_all = [], []
    dumps: Dict[str, list] = {}
    for i, batch in enumerate(loader):
        points, label, valid = batch
        points_d = shard_batch(mesh, points)
        # same sampling-key convention as the train loop's validation pass
        # (loop.py: fold_in(key(seed+2), batch_idx)) so restored-
        # checkpoint eval reproduces in-train val bitwise
        key = jax.random.fold_in(jax.random.key(_seed_from_config(cfg) + 2), i)
        out = step(state, points_d, None, key)
        preds_all.append(fetch(out["preds"])[valid])
        labels_all.append(label[valid])
        if introspect:
            intro_out = out if intro_step is None else intro_step(
                state, points_d, None, key
            )
            dumps.setdefault("points", []).append(np.asarray(points)[valid])
            # final decisions ride along so on/off-gates can compare at the
            # prediction level (tools/pallas_parity_gate.py)
            dumps.setdefault("preds", []).append(preds_all[-1])
            for k, v in intro_out.items():
                if "/" in k:
                    dumps.setdefault(k, []).append(fetch(v)[valid])
    preds = np.concatenate(preds_all)
    labels = np.concatenate(labels_all)
    acc = metrics_mod.accuracy(preds, labels)
    cat_acc = metrics_mod.category_accuracy(preds, labels, cfg.datasets.mapping)
    result = {"acc": acc, "category_acc": cat_acc}
    if dumps:
        np.savez_compressed(
            os.path.join(workdir, "introspection.npz"),
            **{k.replace("/", "_"): np.concatenate(v) for k, v in dumps.items()},
        )
        result["introspection_path"] = os.path.join(workdir, "introspection.npz")
    return result


def evaluate_shapenet(
    cfg, ckpt_dir: str, workdir: str, synthetic_data: bool = False,
    introspect: bool = False,
) -> Dict[str, Any]:
    """Reference test_shapenet.py: mIoU / category mIoU (+voting,
    +per-ds-layer mIoU, +introspection dumps)."""
    os.makedirs(workdir, exist_ok=True)
    _, test_set = _load_shapenet(cfg, synthetic_data)
    dl = cfg.test.dataloader
    bs = int(dl.batch_size_per_gpu) * jax.device_count()
    n_sel = int(cfg.train.dataloader.selected_points)
    loader = BatchLoader(
        test_set.pcd, test_set.label, test_set.seg, batch_size=bs,
        selected_points=n_sel, shuffle=False, drop_last=False, seed=0,
        per_item_seed=0,
    )
    mesh = make_mesh()
    model_train = SegModel(cfg=cfg, num_parts=50, train=True)
    model_eval = SegModel(cfg=cfg, num_parts=50, train=False)
    example = (
        np.zeros((bs, n_sel, 6 if cfg.select(
            "feature_learning_block.embedding.normal_channel", False) else 3),
            np.float32),
        np.zeros((bs, 16), np.float32),
    )
    state = _restore(cfg, model_train, example, ckpt_dir, jax.random.key(0),
                     "seg")
    state = replicate_state(mesh, state)

    parts_mask = metrics_mod.parts_matrix(cfg.datasets.mapping)
    shape_iou_fn = jax.jit(lambda p, l, c: metrics_mod.shape_iou(p, l, c, parts_mask))

    vote_cfg = dl.get("vote")
    use_vote = vote_cfg is not None and bool(vote_cfg.enable)
    if use_vote:
        step = make_vote_eval_step(
            model_eval, "seg", int(vote_cfg.num_vote),
            make_vote_augment(cfg.train.dataloader.data_augmentation),
        )
        # dumps from one additional non-voted pass (see evaluate_modelnet)
        intro_step = _make_introspect_step(model_eval, "seg") if introspect else None
    else:
        intro_step = None
        step = (
            _make_introspect_step(model_eval, "seg")
            if introspect
            else make_eval_step(model_eval, "seg")
        )
    step = BarrierOnFirstCall(step, "seg_eval_main")
    if intro_step is not None:
        intro_step = BarrierOnFirstCall(intro_step, "seg_eval_intro")

    num_ds = len(cfg.feature_learning_block.downsample.M)
    all_iou, all_cat = [], []
    ds_preds = [[] for _ in range(num_ds)]
    ds_labels = [[] for _ in range(num_ds)]
    dumps: Dict[str, list] = {}
    for i, batch in enumerate(loader):
        points, label, seg, valid = batch
        points_d, label_d = shard_batch(mesh, (points, label))
        # same sampling-key convention as the train loop's validation pass
        # (loop.py: fold_in(key(seed+2), batch_idx)) so restored-
        # checkpoint eval reproduces in-train val bitwise
        key = jax.random.fold_in(jax.random.key(_seed_from_config(cfg) + 2), i)
        out = step(state, points_d, label_d, key)
        preds = fetch(out["preds"])
        iou = fetch(shape_iou_fn(out["preds"], jnp.asarray(seg), jnp.asarray(label)))
        all_iou.append(iou[valid])
        all_cat.append(label[valid])
        if introspect:
            intro_out = out if intro_step is None else intro_step(
                state, points_d, label_d, key
            )
            idx_list = [
                fetch(intro_out[f"layer{l}/idx"]) for l in range(num_ds)
                if f"layer{l}/idx" in intro_out
            ]
            if len(idx_list) == num_ds:
                # per-ds-layer mIoU follows the introspection pass's indices
                # (under voting they describe that pass, not the voted preds)
                intro_preds = fetch(intro_out["preds"])
                remapped = metrics_mod.downsampled_iou_labels(
                    intro_preds, seg, idx_list
                )
                for l, (p_l, s_l) in enumerate(remapped):
                    ds_preds[l].append(p_l[valid])
                    ds_labels[l].append(s_l[valid])
            dumps.setdefault("points", []).append(np.asarray(points)[valid])
            # final decisions for prediction-level on/off gating
            dumps.setdefault("preds", []).append(preds[valid])
            for k, v in intro_out.items():
                if "/" in k:
                    dumps.setdefault(k, []).append(fetch(v)[valid])
    all_iou = np.concatenate(all_iou)
    all_cat = np.concatenate(all_cat)
    cat_miou = metrics_mod.category_miou(all_iou, all_cat, cfg.datasets.mapping)
    result = {
        "mIoU": float(all_iou.mean()),
        "category_mIoU": float(np.nanmean(list(cat_miou.values()))),
        "per_category": cat_miou,
    }
    for l in range(num_ds):
        if ds_preds[l]:
            p_l = np.concatenate(ds_preds[l])
            s_l = np.concatenate(ds_labels[l])
            iou_l = fetch(
                shape_iou_fn(jnp.asarray(p_l), jnp.asarray(s_l), jnp.asarray(all_cat))
            )
            result[f"dsLayer{l + 1}_mIoU"] = float(iou_l.mean())
    if dumps:
        np.savez_compressed(
            os.path.join(workdir, "introspection.npz"),
            **{k.replace("/", "_"): np.concatenate(v) for k, v in dumps.items()},
        )
        result["introspection_path"] = os.path.join(workdir, "introspection.npz")
    return result
