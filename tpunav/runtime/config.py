"""Typed config dataclasses + YAML loading.

Replaces the reference's three-level rosparam system (SURVEY.md §5):
YAML files → parameter server → per-node getParam reads. Here YAML maps
directly onto the frozen config dataclasses each subsystem defines, so the
reference's config files port verbatim (same key names).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type, TypeVar

import yaml

T = TypeVar("T")


# Key aliases: reference yaml name → our dataclass field.
_ALIASES = {
    "lambda": "lambda_",
    "str": "str_",
}


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build a (frozen) dataclass from a dict, tolerating extra keys —
    like nh.getParam reads that ignore unrelated parameters."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, val in data.items():
        key = _ALIASES.get(key, key)
        if key in fields:
            f = fields[key]
            if isinstance(val, list):
                val = tuple(val)
            kwargs[key] = val
    return cls(**kwargs)


def load_yaml_config(cls: Type[T], path: str, **overrides) -> T:
    """Load a YAML file into a config dataclass (overrides win, like
    per-node <param> tags over <rosparam> files)."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    data.update(overrides)
    return from_dict(cls, data)


def save_yaml_config(cfg, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
