"""ShapeNet part-seg evaluation CLI (reference test_shapenet.py).

    python -m samble_tpu.cli.test_shapenet ckpt=<run_workdir/checkpoints> \\
        [usr_config=...] [introspect=true] [key=value ...]
"""

from __future__ import annotations

import json
import sys

from samble_tpu.cli.common import (
    build_config,
    build_config_from_run,
    normalize_ckpt_dir,
    resurrect_run_config,
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ckpt = None
    introspect = False
    rest = []
    for a in argv:
        if a.startswith("ckpt="):
            ckpt = a.split("=", 1)[1]
        elif a.startswith("introspect="):
            introspect = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        else:
            rest.append(a)
    if ckpt is None:
        raise SystemExit("usage: test_shapenet ckpt=<checkpoints dir> [overrides]")
    # config resurrection from the run dir (reference test_shapenet.py:53-61)
    run_cfg_path, _ = resurrect_run_config(ckpt)
    ckpt = normalize_ckpt_dir(ckpt)
    explicit_usr = any(a.startswith("usr_config=") for a in rest)
    if run_cfg_path is not None and not explicit_usr:
        specials = [a for a in rest if a.split("=", 1)[0] in
                    ("workdir", "synthetic_data")]
        overrides = [a for a in rest if a not in specials]
        cfg = build_config_from_run(run_cfg_path, overrides)
        _, workdir, synthetic, _ = build_config(specials, "shapenet", "seg.yaml")
    else:
        cfg, workdir, synthetic, _ = build_config(rest, "shapenet", "seg.yaml")
    cfg.mode = "test"
    from samble_tpu.train.eval import evaluate_shapenet

    result = evaluate_shapenet(
        cfg, ckpt, workdir, synthetic_data=synthetic, introspect=introspect
    )
    print(json.dumps({k: v for k, v in result.items() if k != "per_category"}))
    if cfg.select("test.print_results", True):
        for name, iou in sorted(result["per_category"].items()):
            print(f"  {name:>12s}: {iou:.4f}")
    return result


if __name__ == "__main__":
    main()
