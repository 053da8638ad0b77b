"""ModelNet40 classification training CLI (reference train_modelnet.py).

    python -m samble_tpu.cli.train_modelnet [usr_config=...] [key=value ...]
"""

from __future__ import annotations

from samble_tpu.cli.common import build_config
from samble_tpu.train.loop import train_modelnet


def main(argv=None):
    cfg, workdir, synthetic, resume = build_config(argv, "modelnet", "cls.yaml")
    cfg.mode = "train"
    result = train_modelnet(cfg, workdir, synthetic_data=synthetic, resume=resume)
    print(f"best val acc: {result['best_acc']:.4f}  (workdir: {workdir})")
    return result


if __name__ == "__main__":
    main()
