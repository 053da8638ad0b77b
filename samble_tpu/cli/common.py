"""Shared CLI plumbing: config assembly from argv, workdir selection.

Usage mirrors the reference's hydra surface (README.md:39-53):

    python -m samble_tpu.cli.train_modelnet usr_config=my.yaml \\
        train.epochs=200 train.dataloader.batch_size_per_gpu=8

Special keys consumed by the CLI (not part of the model config):
  * ``usr_config=<path>`` — user config merged over defaults
  * ``workdir=<path>``    — run directory (default runs/<ts>_<task>)
  * ``synthetic_data=true`` — use generated clouds (no-network envs)
  * ``resume=true``       — restore the latest checkpoint under
                            ``<workdir>/checkpoints`` and continue training
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

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
        if key in ("usr_config", "workdir", "synthetic_data", "resume"):
            specials[key] = a.split("=", 1)[1]
        else:
            overrides.append(a)
    workdir = specials.get(
        "workdir",
        os.path.join(REPO_ROOT, "runs", f"{time.strftime('%Y%m%d_%H%M%S')}_{dataset}"),
    )
    synthetic = str(specials.get("synthetic_data", "false")).lower() in (
        "1", "true", "yes",
    )
    resume = str(specials.get("resume", "false")).lower() in ("1", "true", "yes")

    # resume resurrects the run's own saved config (run_config.json) so
    # ``workdir=<run> resume=true`` alone continues with identical shapes
    # and schedules; explicit usr_config= or dotted overrides still win
    # (mirrors the test CLIs' resurrection, reference test_modelnet.py:51-59)
    if resume and "usr_config" not in specials:
        run_cfg_path, _ = resurrect_run_config(workdir)
        if run_cfg_path is None:
            # a typo'd workdir must not silently restart with default
            # shapes and overwrite the run it failed to find
            raise FileNotFoundError(
                f"resume=true but no run_config.json found under {workdir!r}; "
                "check the workdir= path (or pass usr_config= explicitly to "
                "resume with a fresh config)"
            )
        cfg = build_config_from_run(run_cfg_path, overrides)
        # run-level flags saved by the training loop ride along on resume
        synthetic = synthetic or bool(cfg.select("run.synthetic_data", False))
        return cfg, workdir, synthetic, resume

    usr = specials.get("usr_config", os.path.join(CONFIG_DIR, default_usr))
    cfg = load_config(
        os.path.join(CONFIG_DIR, "default.yaml"),
        dataset_path=os.path.join(CONFIG_DIR, "datasets", f"{dataset}.yaml"),
        usr_config_path=usr,
        cli_overrides=overrides,
    )
    return cfg, workdir, synthetic, resume


def resolve_ckpt_uri(ckpt: str) -> str:
    """Resolve a checkpoint URI to a local path (reference parity: the eval
    scripts fetch checkpoints from wandb artifacts, test_modelnet.py:37-49).

    Supported:
      * plain local path                  → unchanged
      * ``file://<path>``                 → local path (``.zip`` → extracted)
      * ``http(s)://...``                 → downloaded into runs/_fetched/
                                            (``.zip`` → extracted)
      * ``wandb://entity/project/name:v`` → artifact download (needs wandb
                                            login; import-gated)

    Archives extract once into a content-addressed directory; repeated
    resolutions reuse it.
    """
    import hashlib
    import urllib.parse
    import urllib.request
    import zipfile

    if ckpt.startswith("wandb://"):
        try:
            import wandb
        except ImportError as e:  # pragma: no cover - env without wandb
            raise RuntimeError(
                "ckpt=wandb:// requires the wandb package (not installed)"
            ) from e
        return wandb.Api().artifact(ckpt[len("wandb://"):]).download()

    scheme = urllib.parse.urlparse(ckpt).scheme
    if scheme not in ("file", "http", "https"):
        return ckpt

    if scheme == "file":
        local = urllib.request.url2pathname(urllib.parse.urlparse(ckpt).path)
    else:
        cache = os.path.join(REPO_ROOT, "runs", "_fetched")
        os.makedirs(cache, exist_ok=True)
        digest = hashlib.sha1(ckpt.encode()).hexdigest()[:16]
        local = os.path.join(cache, digest + os.path.basename(
            urllib.parse.urlparse(ckpt).path))
        if not os.path.exists(local):
            urllib.request.urlretrieve(ckpt, local)

    if local.endswith(".zip"):
        target = local[:-4] + "_extracted"
        if not os.path.isdir(target):
            with zipfile.ZipFile(local) as zf:
                zf.extractall(target)
        # a zip holding exactly one top-level directory unwraps to it
        entries = os.listdir(target)
        if len(entries) == 1 and os.path.isdir(os.path.join(target, entries[0])):
            return os.path.join(target, entries[0])
        return target
    return local


def normalize_ckpt_dir(ckpt_path: str) -> str:
    """Accept either a run workdir or its ``checkpoints`` subdir."""
    sub = os.path.join(ckpt_path, "checkpoints")
    if os.path.isdir(sub):
        return sub
    return ckpt_path


def resurrect_run_config(ckpt_path: str):
    """Locate the ``run_config.json`` a training run saved next to its
    checkpoints (utils/logging.py) and return ``(config_path, run_dir)`` or
    ``(None, None)``.  Mirrors the reference's config resurrection from the
    run's saved usr_config (test_modelnet.py:51-59): ``ckpt=<dir>`` alone is
    enough to evaluate a run."""
    import json

    cand_dirs = [ckpt_path, os.path.dirname(os.path.abspath(ckpt_path))]
    for d in cand_dirs:
        p = os.path.join(d, "run_config.json")
        if os.path.isfile(p):
            return p, d
    return None, None


def build_config_from_run(run_config_path: str, overrides):
    """Config from a saved ``run_config.json`` + CLI dotted overrides."""
    import json

    from samble_tpu.config.loader import Config, merge, parse_cli_overrides

    with open(run_config_path) as f:
        data = json.load(f)
    if overrides:
        data = merge(data, parse_cli_overrides(list(overrides)))
    return Config(data)


def build_test_config(argv, dataset: str, default_usr: str):
    """Shared test-CLI plumbing: parse ``ckpt=``/``introspect=``, resurrect
    the run's saved config when no explicit usr_config is given, normalize
    the checkpoint dir.  Returns ``(cfg, ckpt_dir, workdir, synthetic,
    introspect, visualize)``."""
    argv = list(sys.argv[1:] if argv is None else argv)
    ckpt = None
    introspect = False
    visualize = False
    rest = []
    for a in argv:
        if a.startswith("ckpt="):
            ckpt = a.split("=", 1)[1]
        elif a.startswith("introspect="):
            introspect = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        elif a.startswith("visualize="):
            visualize = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        else:
            rest.append(a)
    introspect = introspect or visualize
    if ckpt is None:
        raise SystemExit(
            f"usage: test_{dataset} ckpt=<run or checkpoints dir, file://, "
            "http(s)://, wandb:// URI, or a reference checkpoint.pt> "
            "[overrides]"
        )
    ckpt = resolve_ckpt_uri(ckpt)
    run_cfg_path, _ = resurrect_run_config(ckpt)
    ckpt = normalize_ckpt_dir(ckpt)
    explicit_usr = any(a.startswith("usr_config=") for a in rest)
    if run_cfg_path is not None and not explicit_usr:
        specials = [a for a in rest if a.split("=", 1)[0] in
                    ("workdir", "synthetic_data")]
        overrides = [a for a in rest if a not in specials]
        cfg = build_config_from_run(run_cfg_path, overrides)
        _, workdir, synthetic, _ = build_config(specials, dataset, default_usr)
        synthetic = synthetic or bool(cfg.select("run.synthetic_data", False))
    else:
        cfg, workdir, synthetic, _ = build_config(rest, dataset, default_usr)
    return cfg, ckpt, workdir, synthetic, introspect, visualize
