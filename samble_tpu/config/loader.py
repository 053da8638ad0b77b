"""Layered YAML configuration with the reference's merge semantics.

The reference uses hydra + OmegaConf with the chain
``default.yaml → datasets/<name>.yaml → usr_config → CLI dotted overrides``
(train_modelnet.py:22-39).  This module reimplements exactly that surface —
attribute access, deep merge, ``${a.b.c}`` interpolation, ``???`` mandatory
markers, dotted CLI overrides — with no external dependency.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Iterable, Mapping, Optional, Sequence, Union

import yaml

MISSING = "???"
_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")


class Config:
    """Attribute-accessible nested configuration node."""

    def __init__(self, data: Optional[Mapping[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[str(k)] = Config(v) if isinstance(v, Mapping) else v

    # -- mapping protocol ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            v = self._data[name]
        except KeyError as e:
            raise AttributeError(f"config has no key '{name}'") from e
        if v == MISSING:
            raise ValueError(f"mandatory config key '{name}' was not provided (???)")
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = Config(value) if isinstance(value, Mapping) else value

    def __getitem__(self, name: str) -> Any:
        return self.__getattr__(name)

    def __setitem__(self, name: str, value: Any) -> None:
        self.__setattr__(name, value)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def get(self, name: str, default: Any = None) -> Any:
        v = self._data.get(name, default)
        return default if v == MISSING else v

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def to_dict(self) -> dict:
        return {
            k: v.to_dict() if isinstance(v, Config) else v
            for k, v in self._data.items()
        }

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Config) or part not in node:
                return default
            node = node._data[part]
        return node

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node._data[part], Config):
                node._data[part] = Config()
            node = node._data[part]
        node._data[parts[-1]] = Config(value) if isinstance(value, Mapping) else value

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"


def load_yaml(path: Union[str, Path]) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> dict:
    """Deep merge ``override`` on top of ``base`` (OmegaConf.merge semantics:
    dicts merge recursively, everything else — including lists — replaces)."""
    out = dict(copy.deepcopy(base) if not isinstance(base, dict) else base)
    out = {k: copy.deepcopy(v) for k, v in base.items()}
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_interpolations(node: Any, root: Config) -> None:
    if not isinstance(node, Config):
        return
    for k, v in list(node.items()):
        if isinstance(v, Config):
            _resolve_interpolations(v, root)
        elif isinstance(v, str):
            m = _INTERP_RE.match(v)
            if m:
                resolved = root.select(m.group(1), default=None)
                if resolved is None:
                    raise KeyError(f"interpolation target not found: {v}")
                node._data[k] = resolved


def parse_cli_overrides(overrides: Iterable[str]) -> dict:
    """Parse ``a.b.c=value`` dotted overrides; values go through YAML parsing
    so ``[0,1]``, ``true``, ``1e-4`` etc. get their natural types."""
    out: dict = {}
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must look like key=value, got: {item}")
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = out
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def load_config(
    default_path: Union[str, Path],
    dataset_path: Optional[Union[str, Path]] = None,
    usr_config_path: Optional[Union[str, Path]] = None,
    cli_overrides: Sequence[str] = (),
) -> Config:
    """Build the merged config: default → dataset (under ``datasets:``) →
    user config → CLI overrides, then resolve ``${...}`` interpolations."""
    data = load_yaml(default_path)
    data.pop("hydra", None)
    data.pop("defaults", None)
    if dataset_path is not None:
        data = merge(data, {"datasets": load_yaml(dataset_path)})
    if usr_config_path is not None:
        data = merge(data, load_yaml(usr_config_path))
    if cli_overrides:
        data = merge(data, parse_cli_overrides(cli_overrides))
    cfg = Config(data)
    _resolve_interpolations(cfg, cfg)
    return cfg
