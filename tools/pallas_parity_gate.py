"""Pallas-on/off equivalence gate (VERDICT round-1, item 4; round-2, item 5).

Evaluates one trained checkpoint twice on the current backend — fused
Pallas kernels enabled and disabled — and asserts the *decisions* agree:
matching accuracy / mIoU and a bounded per-cloud prediction-flip rate.
The fused kNN quantizes packed-key distances at 2^-(23-idx_bits) relative
resolution (kernels/keys.py), so near-tie neighbor indices can differ from
the XLA path (idx_match≈0.996 at bench shapes); this gate checks that the
divergence stays below the decision level.

Decision level means the model's OUTPUT, not the sampler's internals: with
``sample_mode=random`` the selection is Gumbel-perturbed, so an epsilon
score perturbation legitimately re-draws near-tie picks (measured on
runs/r4_cls_1024: mean selected-index overlap 0.92 with bitwise-identical
accuracy and predictions).  The selected-index overlap is therefore
*reported* as a diagnostic, while the gate asserts on predictions and the
task metric.

Works on both tasks — the task is inferred from the run's saved config
(``datasets.dataset_name``): cls gates per-cloud class predictions +
accuracy, seg gates per-point part predictions + mIoU.  Exercised in
CI-on-TPU by ``tests/test_pallas_parity_gate.py`` over both committed
checkpoints (runs/r4_cls_1024, runs/r4_seg_2048).

Usage (TPU box):
    python tools/pallas_parity_gate.py [run_dir] [--max-flip-rate 0.02]

Exits 1 if the metric differs or the prediction-flip rate exceeds the bound.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(run_dir: str, disable_pallas: bool, tmp: str):
    os.environ["SAMBLE_DISABLE_PALLAS"] = "1" if disable_pallas else "0"
    from samble_tpu import kernels

    kernels.use_pallas.cache_clear()

    import numpy as np
    from samble_tpu.cli.common import (
        build_config_from_run,
        normalize_ckpt_dir,
        resurrect_run_config,
    )
    from samble_tpu.train.eval import evaluate_modelnet, evaluate_shapenet

    cfg_path, _ = resurrect_run_config(run_dir)
    if cfg_path is None:
        raise SystemExit(f"no run_config.json under {run_dir}")
    cfg = build_config_from_run(cfg_path, [])
    task = (
        "seg"
        if "shapenet" in str(cfg.select("datasets.dataset_name", "")).lower()
        else "cls"
    )
    # deterministic decisions: no vote (sampling keys are already fixed by
    # the eval loop)
    cfg.set_dotted("test.dataloader.vote.enable", False)
    eval_fn = evaluate_shapenet if task == "seg" else evaluate_modelnet
    res = eval_fn(
        cfg, normalize_ckpt_dir(run_dir), tmp, synthetic_data=True,
        introspect=True,
    )
    metric = res["mIoU"] if task == "seg" else res["acc"]
    data = np.load(res["introspection_path"])
    return (
        task,
        metric,
        data["preds"],
        data["layer0_idx"],
        data["layer0_attention_point_score"],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default="runs/r4_cls_1024")
    ap.add_argument("--max-flip-rate", type=float, default=0.02,
                    help="max fraction of predictions (per cloud for cls, "
                         "per point for seg) allowed to differ")
    ap.add_argument("--max-metric-delta", type=float, default=None,
                    help="max |metric_on - metric_off| (default: exact for "
                         "cls accuracy, 2e-3 for seg mIoU)")
    args = ap.parse_args()

    import jax
    import numpy as np

    print(f"backend: {jax.default_backend()}")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        task, m_on, p_on, idx_on, score_on = evaluate(
            args.run_dir, False, tmp + "/on"
        )
        _, m_off, p_off, idx_off, score_off = evaluate(
            args.run_dir, True, tmp + "/off"
        )

    name = "mIoU" if task == "seg" else "acc"
    print(f"{name}  pallas-on:  {m_on:.4f}")
    print(f"{name}  pallas-off: {m_off:.4f}")
    # the decision: final predictions (per cloud / per point)
    pred_flip = float((p_on != p_off).mean())
    # diagnostics: sampler internals
    overlap = np.asarray([
        len(set(a.tolist()) & set(b.tolist())) / len(a)
        for a, b in zip(idx_on, idx_off)
    ])
    rel = np.abs(score_on - score_off) / (np.abs(score_off).max() + 1e-12)
    print(f"prediction flip rate:            {pred_flip:.4f}")
    print(f"layer0 selected-index overlap:   mean {overlap.mean():.4f} "
          f"min {overlap.min():.4f}  (diagnostic)")
    print(f"layer0 score max rel err:        {rel.max():.2e}  (diagnostic)")

    # The metric shift must be EXPLAINED by the counted flips: accuracy is
    # linear in per-cloud flips (|Δacc| ≤ flip_rate exactly), and seg mIoU
    # moves by at most the per-point flip rate plus the usual 1e-3-level
    # near-tie noise.  A fixed "exact" bound for cls was self-contradictory
    # with the flip tolerance on small eval sets (one allowed flip on the
    # 64-cloud synthetic test set moves accuracy by 1.56%).
    delta = args.max_metric_delta
    if delta is None:
        delta = 2e-3 if task == "seg" else 1e-9
    ok = (abs(m_on - m_off) <= max(delta, pred_flip + 1e-9)) and (
        pred_flip <= args.max_flip_rate
    )
    print("PARITY GATE:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
