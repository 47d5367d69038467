"""YAML experiment-config I/O with strict merging.

Re-design of the reference `utils/config_io.py:17-145`: load YAML, merge a
custom config over defaults with an **intersection check** (a key present in
the custom file but absent from the defaults raises — catches typos), and
save an annotated backup copy next to the run directory.

The reference's third layer — a process-global yacs singleton for
cross-cutting constants (`config/default.py:41-86`) — is deliberately gone:
those constants (render sizes, LM damping) are explicit dataclass fields
(`RefinerConfig`, `LMConfig`) plumbed through constructors, which jit/vmap
can see and tests can vary.
"""
from __future__ import annotations

import copy
import os
import time
from typing import Any, Dict, List, Sequence, Union

import yaml

__all__ = ["read_yaml", "update_dict", "merge_cfg", "save_cfg", "AttrDict"]


class AttrDict(dict):
    """dict with attribute access (the reference uses EasyDict)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def read_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def update_dict(base: Dict, custom: Dict, path: str = "") -> Dict:
    """Recursive merge of `custom` into `base`; unknown keys raise
    (reference `update_dict`, `config_io.py:40-66`)."""
    out = copy.deepcopy(base)
    for k, v in custom.items():
        here = f"{path}.{k}" if path else str(k)
        if k not in base:
            raise KeyError(
                f"config key '{here}' not present in the defaults — typo?"
            )
        if isinstance(v, dict) and isinstance(base[k], dict):
            out[k] = update_dict(base[k], v, here)
        else:
            out[k] = copy.deepcopy(v)
    return out


def merge_cfg(
    paths: Union[str, Sequence[str]], defaults: Dict[str, Any] | None = None
) -> AttrDict:
    """Load one or more YAMLs; later files merge over earlier ones.

    With `defaults` given, every file must be a subset of the default schema
    (reference `merge_cfg`, `config_io.py:68-85`).
    """
    if isinstance(paths, str):
        paths = [paths]
    cfg = copy.deepcopy(defaults) if defaults is not None else {}
    for p in paths:
        custom = read_yaml(p)
        if defaults is None and not cfg:
            cfg = custom
        else:
            cfg = update_dict(cfg, custom)
    return AttrDict.wrap(cfg)


def save_cfg(cfg: Dict[str, Any], out_path: str, source: str = ""):
    """Save an annotated backup of the resolved config
    (reference `save_cfg`, `config_io.py:123-145`)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    header = (
        f"# resolved config, saved {time.strftime('%Y-%m-%d %H:%M:%S')}\n"
        + (f"# source: {source}\n" if source else "")
    )

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        return o

    with open(out_path, "w") as f:
        f.write(header)
        yaml.safe_dump(plain(cfg), f, default_flow_style=False, sort_keys=False)
