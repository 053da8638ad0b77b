"""Shared CLI plumbing: config assembly from argv, workdir selection.

Usage mirrors the reference's hydra surface (README.md:39-53):

    python -m samble_tpu.cli.train_modelnet usr_config=my.yaml \\
        train.epochs=200 train.dataloader.batch_size_per_gpu=8

Special keys consumed by the CLI (not part of the model config):
  * ``usr_config=<path>`` — user config merged over defaults
  * ``workdir=<path>``    — run directory (default runs/<ts>_<task>)
  * ``synthetic_data=true`` — use generated clouds (no-network envs)
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional, Tuple

from samble_tpu.config import Config, load_config

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CONFIG_DIR = os.path.join(REPO_ROOT, "configs")


def build_config(argv: Optional[List[str]], dataset: str, default_usr: str):
    argv = list(sys.argv[1:] if argv is None else argv)
    specials = {}
    overrides = []
    for a in argv:
        key = a.split("=", 1)[0]
        if key in ("usr_config", "workdir", "synthetic_data"):
            specials[key] = a.split("=", 1)[1]
        else:
            overrides.append(a)
    usr = specials.get("usr_config", os.path.join(CONFIG_DIR, default_usr))
    cfg = load_config(
        os.path.join(CONFIG_DIR, "default.yaml"),
        dataset_path=os.path.join(CONFIG_DIR, "datasets", f"{dataset}.yaml"),
        usr_config_path=usr,
        cli_overrides=overrides,
    )
    workdir = specials.get(
        "workdir",
        os.path.join(REPO_ROOT, "runs", f"{time.strftime('%Y%m%d_%H%M%S')}_{dataset}"),
    )
    synthetic = str(specials.get("synthetic_data", "false")).lower() in (
        "1", "true", "yes",
    )
    return cfg, workdir, synthetic
