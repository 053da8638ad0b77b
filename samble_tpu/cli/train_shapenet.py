"""ShapeNet part-segmentation training CLI (reference train_shapenet.py).

    python -m samble_tpu.cli.train_shapenet [usr_config=...] [key=value ...]
"""

from __future__ import annotations

from samble_tpu.cli.common import build_config
from samble_tpu.train.loop import train_shapenet


def main(argv=None):
    cfg, workdir, synthetic, resume = build_config(argv, "shapenet", "seg.yaml")
    cfg.mode = "train"
    result = train_shapenet(cfg, workdir, synthetic_data=synthetic, resume=resume)
    print(f"best val mIoU: {result['best_miou']:.4f}  (workdir: {workdir})")
    return result


if __name__ == "__main__":
    main()
