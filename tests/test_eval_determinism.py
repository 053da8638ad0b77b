"""Eval-subsample determinism convention + restored-eval guard.

The reference draws a fresh random point subsample per dataset access
(utils/dataloader.py:479), which makes its eval metric a lottery across
runs of the same checkpoint.  This framework pins a convention instead:
every validation/eval loader passes ``per_item_seed=0`` to BatchLoader, so
item ``i`` always gets the subsample ``default_rng((0, i))`` — independent
of epoch, batch size, and which CLI constructs the loader — and eval
sampling keys are ``fold_in(key(seed+2), batch_idx)`` in BOTH the in-train
validation pass and the test CLIs.  Consequence (guarded here): restored-
checkpoint eval reproduces the in-train validation metric exactly; the
r4 0.984-vs-0.953 spread is impossible to produce silently.
"""

import glob
import json
import os

import numpy as np
import pytest

from samble_tpu.data.pipeline import BatchLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

TINY = [
    "train.dataloader.selected_points=128",
    "feature_learning_block.downsample.M=[64,32]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
    "train.epochs=2",
    "train.validation_freq=1",
    "train.dataloader.batch_size_per_gpu=4",
    "test.dataloader.batch_size_per_gpu=4",
]


def _data(s=24, n0=64):
    rng = np.random.default_rng(0)
    pcd = rng.normal(size=(s, n0, 3)).astype(np.float32)
    label = rng.integers(0, 5, s).astype(np.int32)
    return pcd, label


def test_per_item_subsample_is_loader_invariant():
    """Same item → same point subsample, regardless of batch size, epoch,
    or loader instance (the convention every eval loader relies on)."""
    pcd, label = _data()

    def collect(bs, seed):
        ld = BatchLoader(pcd, label, batch_size=bs, selected_points=16,
                         shuffle=False, drop_last=False, seed=seed,
                         per_item_seed=0)
        items = {}
        pos = 0
        for batch in ld:
            points, lab, valid = batch
            for j in range(points.shape[0]):
                if valid[j]:
                    items[pos] = points[j]
                    pos += 1
        return items

    a = collect(bs=4, seed=123)
    b = collect(bs=7, seed=999)  # different batch size AND shuffle seed
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    # a second epoch of the same loader repeats the subsample exactly
    ld = BatchLoader(pcd, label, batch_size=4, selected_points=16,
                     shuffle=False, drop_last=False, per_item_seed=0)
    e1 = [p.copy() for p, _, _ in ld]
    e2 = [p for p, _, _ in ld]
    for x, y in zip(e1, e2):
        np.testing.assert_array_equal(x, y)


def test_without_convention_subsample_drifts():
    """Sanity: the legacy mutable-rng path (per_item_seed=None) does NOT
    repeat across epochs — i.e. the convention is load-bearing."""
    pcd, label = _data()
    ld = BatchLoader(pcd, label, batch_size=4, selected_points=16,
                     shuffle=False, drop_last=False, seed=0)
    e1 = [p.copy() for p, _, _ in ld]
    e2 = [p for p, _, _ in ld]
    assert any(not np.array_equal(x, y) for x, y in zip(e1, e2))


def test_restored_eval_matches_in_train_val(tmp_path):
    """Train 2 tiny epochs → evaluate the saved (best) checkpoint via the
    test-CLI path → the metric must equal the in-train validation metric
    of the best epoch EXACTLY (same subsample, same sampling keys, same
    eval step)."""
    from samble_tpu.config import load_config
    from samble_tpu.train.eval import evaluate_modelnet
    from samble_tpu.train.loop import train_modelnet

    cfg = load_config(
        os.path.join(CONFIG_DIR, "default.yaml"),
        dataset_path=os.path.join(CONFIG_DIR, "datasets", "modelnet.yaml"),
        usr_config_path=os.path.join(CONFIG_DIR, "cls.yaml"),
        cli_overrides=TINY,
    )
    workdir = str(tmp_path / "run")
    result = train_modelnet(cfg, workdir, synthetic_data=True)
    recs = [
        json.loads(l)
        for l in open(os.path.join(workdir, "metrics.jsonl"))
        if l.strip()
    ]
    val_accs = [r["val/acc"] for r in recs if "val/acc" in r]
    assert val_accs
    best_in_train = max(val_accs)
    assert best_in_train == pytest.approx(result["best_acc"])

    # the saved run config must carry the EFFECTIVE seed (the cls.yaml
    # default is the reference's wall-clock fallback, seed 0): every eval
    # sampling/vote key derives from it, so a resurrected test CLI in a
    # fresh process depends on this persisted value
    run_cfg = json.load(open(os.path.join(workdir, "run_config.json")))
    assert int(run_cfg["train"]["ddp"]["random_seed"]) != 0

    ckpt_dir = os.path.join(workdir, "checkpoints")
    ev = evaluate_modelnet(cfg, ckpt_dir, str(tmp_path / "eval"),
                           synthetic_data=True)
    assert ev["acc"] == pytest.approx(best_in_train, abs=1e-9), (
        f"restored-checkpoint eval {ev['acc']} != in-train best val "
        f"{best_in_train} — the determinism convention is broken"
    )
