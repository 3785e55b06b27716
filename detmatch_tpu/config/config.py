"""Plain-Python config files with ``_base_`` inheritance and dotted CLI
overrides — the user-facing config idiom of the reference (mmcv
``Config.fromfile`` + ``--cfg-options``, ``tools/train.py:59-68``),
reimplemented standalone.

A config file is a python module; its module-level variables become the
config dict. ``_base_`` (str or list) merges parent files first (dicts merge
recursively; everything else overrides).
"""
from __future__ import annotations

import copy
import os
import runpy
from typing import Any, Dict, List


def _deep_merge(base: Dict, new: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in new.items():
        if (k in out and isinstance(out[k], dict) and isinstance(v, dict)
                and not v.pop("_delete_", False)):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_refs(obj, root):
    """Replace "${key}" strings with the top-level value of that key
    (lets child configs reference base-file fragments)."""
    if isinstance(obj, str) and obj.startswith("${") and obj.endswith("}"):
        return copy.deepcopy(root[obj[2:-1]])
    if isinstance(obj, dict):
        return {k: _resolve_refs(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_refs(v, root) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_resolve_refs(v, root) for v in obj)
    return obj


class _SafeMap(dict):
    def __missing__(self, k):
        return "{" + k + "}"


def _format_strings(obj, root):
    """Late-bind "{key}" placeholders in strings against top-level scalar
    config values, so child configs overriding e.g. ``split`` reflow into
    paths defined in a base file."""
    scalars = _SafeMap({k: v for k, v in root.items()
                        if isinstance(v, (str, int, float))})
    def fmt(o):
        if isinstance(o, str) and "{" in o:
            try:
                return o.format_map(scalars)
            except (ValueError, KeyError, IndexError):
                return o
        if isinstance(o, dict):
            return {k: fmt(v) for k, v in o.items()}
        if isinstance(o, list):
            return [fmt(v) for v in o]
        if isinstance(o, tuple):
            return tuple(fmt(v) for v in o)
        return o
    return fmt(obj)


class Config(dict):
    """dict with attribute access."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(
            v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def fromfile(path: str, _top: bool = True) -> "Config":
        path = os.path.abspath(path)
        ns = runpy.run_path(path)
        cfg = {k: v for k, v in ns.items()
               if not k.startswith("_") and not callable(v)
               and not isinstance(v, type(os))}
        bases = ns.get("_base_", [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            parent = Config.fromfile(
                os.path.join(os.path.dirname(path), b), _top=False)
            merged = _deep_merge(merged, parent)
        merged = _deep_merge(merged, cfg)
        if _top:
            # resolve ${refs} and {placeholders} only once, at the top, so
            # child overrides (e.g. split/frac) reflow into inherited paths
            merged = _resolve_refs(merged, merged)
            merged = _format_strings(merged, merged)
        return Config(merged)

    def merge_from_options(self, options: Dict[str, Any]):
        """Dotted-path overrides: {'a.b.c': v}."""
        for key, val in options.items():
            parts = key.split(".")
            d = self
            for p in parts[:-1]:
                if p not in d or not isinstance(d[p], dict):
                    d[p] = {}
                d = d[p]
            d[parts[-1]] = val
        return self

    def dump(self) -> str:
        import pprint
        return pprint.pformat(dict(self), width=100)
