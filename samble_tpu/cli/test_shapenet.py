"""ShapeNet part-seg evaluation CLI (reference test_shapenet.py).

    python -m samble_tpu.cli.test_shapenet ckpt=<run_workdir or its
        checkpoints dir> [usr_config=...] [introspect=true] [key=value ...]

Without an explicit ``usr_config``, the run's saved ``run_config.json`` is
resurrected (reference test_shapenet.py:53-61) with CLI overrides applied.
"""

from __future__ import annotations

import json

from samble_tpu.cli.common import build_test_config


def main(argv=None):
    cfg, ckpt, workdir, synthetic, introspect, visualize = build_test_config(
        argv, "shapenet", "seg.yaml"
    )
    cfg.mode = "test"
    from samble_tpu.train.eval import evaluate_shapenet

    result = evaluate_shapenet(
        cfg, ckpt, workdir, synthetic_data=synthetic, introspect=introspect
    )
    print(json.dumps({k: v for k, v in result.items() if k != "per_category"}))
    if cfg.select("test.print_results", True):
        for name, iou in sorted(result["per_category"].items()):
            print(f"  {name:>12s}: {iou:.4f}")
    if visualize and "introspection_path" in result:
        from samble_tpu.utils.visualization import visualize_introspection

        written = visualize_introspection(
            result["introspection_path"],
            outdir=result["introspection_path"].rsplit("/", 1)[0] + "/viz",
        )
        print(f"wrote {len(written)} visualization PNGs")
    return result


if __name__ == "__main__":
    main()
