"""Dataclass config system with YAML presets and CLI overrides.

Replaces the reference's three coexisting config systems (argparse
training flags train.py:357-485, hydra/omegaconf eval dataclasses
evaluation/evaluate.py:30-58, and the vendored pytorch3d Configurable
registry models/core/utils/config.py) with one: nested dataclasses,
loadable from YAML, overridable with dotted KEY=VALUE strings
(`MODEL.model_name=PPMStereoModel` — same syntax the reference README
documents for its hydra CLI).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import fields, is_dataclass
from typing import Any


def _coerce(value: str, typ) -> Any:
    if typ is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ in (tuple, list) or str(typ).startswith(("tuple", "list", "typing.Tuple", "typing.List")):
        return type(typ if isinstance(typ, (list, tuple)) else [])(
            json.loads(value) if value.startswith("[") else value.split(",")
        )
    return value


def apply_overrides(cfg: Any, overrides: list[str]) -> Any:
    """In-place dotted-path overrides: ["MODEL.iters=20", ...]."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be KEY=VALUE: {ov}")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = getattr(node, p)
        leaf = parts[-1]
        if is_dataclass(node):
            ftypes = {f.name: f.type for f in fields(node)}
            if leaf not in ftypes:
                raise AttributeError(f"{type(node).__name__} has no field {leaf}")
            current = getattr(node, leaf)
            typ = type(current) if current is not None else str
            object.__setattr__(node, leaf, _coerce(value, typ))
        else:
            setattr(node, leaf, value)
    return cfg


def from_dict(cls, data: dict):
    """Build a (possibly nested) dataclass from a plain dict."""
    kwargs = {}
    ftypes = {f.name: f for f in fields(cls)}
    for k, v in data.items():
        if k not in ftypes:
            raise KeyError(f"{cls.__name__} has no field {k}")
        f = ftypes[k]
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default
        if is_dataclass(default) and isinstance(v, dict):
            kwargs[k] = dataclasses.replace(default, **v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def load_yaml(cls, path: str, overrides: list[str] | None = None):
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    cfg = from_dict(cls, data)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
