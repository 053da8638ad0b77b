"""Pallas-on/off equivalence gate (VERDICT round-1, item 4).

Evaluates one trained checkpoint twice on the current backend — fused
Pallas kernels enabled and disabled — and asserts the *decisions* agree:
identical accuracy and a bounded prediction-flip rate.  The fused kNN
quantizes packed-key distances at 2^-(23-idx_bits) relative resolution
(kernels/keys.py), so a small fraction of near-tie neighbor indices can
differ from the XLA path (idx_match≈0.996 at bench shapes); this gate
checks that the divergence stays below the decision level.

Usage (TPU box):
    python tools/pallas_parity_gate.py [run_dir] [--max-flip-rate 0.02]

Exits 1 if accuracy differs or the flip rate exceeds the bound.
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
    from samble_tpu.train.eval import evaluate_modelnet

    cfg_path, _ = resurrect_run_config(run_dir)
    if cfg_path is None:
        raise SystemExit(f"no run_config.json under {run_dir}")
    cfg = build_config_from_run(cfg_path, [])
    # deterministic decisions: no vote, deterministic sampler
    cfg.set_dotted("test.dataloader.vote.enable", False)
    res = evaluate_modelnet(
        cfg, normalize_ckpt_dir(run_dir), tmp, synthetic_data=True,
        introspect=True,
    )
    data = np.load(res["introspection_path"])
    return res["acc"], data["layer0_idx"], data["layer0_attention_point_score"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default="runs/r3_cls_1024_full")
    ap.add_argument("--max-flip-rate", type=float, default=0.02,
                    help="max fraction of per-cloud selected-index sets "
                         "allowed to differ")
    args = ap.parse_args()

    import jax
    import numpy as np

    print(f"backend: {jax.default_backend()}")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        acc_on, idx_on, score_on = evaluate(args.run_dir, False, tmp + "/on")
        acc_off, idx_off, score_off = evaluate(args.run_dir, True, tmp + "/off")

    print(f"acc  pallas-on:  {acc_on:.4f}")
    print(f"acc  pallas-off: {acc_off:.4f}")
    # downsample decisions: selected index sets per cloud
    same_set = np.asarray([
        set(a.tolist()) == set(b.tolist()) for a, b in zip(idx_on, idx_off)
    ])
    flip = 1.0 - same_set.mean()
    # score agreement on the (stop-grad) attention point score
    rel = np.abs(score_on - score_off) / (np.abs(score_off).max() + 1e-12)
    print(f"layer0 selected-set flip rate: {flip:.4f}")
    print(f"layer0 score max rel err:      {rel.max():.2e}")

    ok = (abs(acc_on - acc_off) < 1e-9) and (flip <= args.max_flip_rate)
    print("PARITY GATE:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
