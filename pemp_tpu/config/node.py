"""Minimal yacs-compatible config tree.

The reference uses yacs CfgNode (reference: src/config/default_config.py:3).
yacs is not available in this environment, so this is a small, dependency-free
re-implementation of the subset the framework needs:

  * attribute + item access to nested nodes
  * ``merge_from_file`` (YAML) and ``merge_from_list`` (dotted CLI overrides)
  * ``new_allowed`` subtrees (experiment YAMLs add keys like ``NODE_STEPS``
    that are not in the defaults — reference: src/config/default_config.py:116)
  * value type coercion mirroring yacs (so ``"3e-4"`` from CLI becomes float)
  * freeze/defrost/clone API surface kept for source compatibility
"""

from __future__ import annotations

import ast
import copy
from typing import Any

import yaml


class ConfigNode(dict):
    """A dict with attribute access and yacs-style merging."""

    _NEW_ALLOWED = "__new_allowed__"
    _FROZEN = "__frozen__"

    def __init__(self, init: dict | None = None, new_allowed: bool = False):
        super().__init__()
        object.__setattr__(self, self._NEW_ALLOWED, new_allowed)
        object.__setattr__(self, self._FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = self._convert(v)

    @classmethod
    def _convert(cls, v: Any) -> Any:
        if isinstance(v, ConfigNode):
            return v
        if isinstance(v, dict):
            return ConfigNode(v)
        return v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, self._FROZEN):
            raise AttributeError(f"config is frozen; cannot set {name!r}")
        super().__setitem__(name, self._convert(value))

    # -- yacs API ----------------------------------------------------------
    def is_new_allowed(self) -> bool:
        return object.__getattribute__(self, self._NEW_ALLOWED)

    def clone(self) -> "ConfigNode":
        node = ConfigNode(new_allowed=self.is_new_allowed())
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return node

    def freeze(self) -> None:
        object.__setattr__(self, self._FROZEN, True)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, self._FROZEN, False)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()

    def merge_from_other(self, other: dict) -> None:
        for k, v in other.items():
            if k in self:
                cur = self[k]
                if isinstance(cur, ConfigNode) and isinstance(v, dict):
                    cur.merge_from_other(v)
                else:
                    self[k] = _coerce(v, cur, k)
            elif self.is_new_allowed():
                self[k] = self._convert(v)
            else:
                raise KeyError(f"Non-existent config key: {k}")

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f)
        if loaded:
            self.merge_from_other(loaded)

    def merge_from_list(self, opts: list[str]) -> None:
        assert len(opts) % 2 == 0, f"override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf in node:
                node[leaf] = _coerce(_parse_literal(value), node[leaf], key)
            elif node.is_new_allowed():
                node[leaf] = _parse_literal(value)
            else:
                raise KeyError(f"Non-existent config key: {key}")

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, ConfigNode) else v)
            for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _parse_literal(value: Any) -> Any:
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(new: Any, old: Any, key: str) -> Any:
    """Mirror yacs value coercion: allow compatible replacements, coerce
    int->float and list<->tuple, otherwise require matching types."""
    if old is None or new is None:
        return new
    if isinstance(new, str) and isinstance(old, (int, float)) and not isinstance(old, bool):
        parsed = _parse_literal(new)
        if isinstance(parsed, (int, float)):
            new = parsed
    if type(new) is type(old):
        return new
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    if isinstance(old, bool) or isinstance(new, bool):
        if isinstance(new, (bool, int)) and isinstance(old, (bool, int)):
            return bool(new)
    if isinstance(old, (int, float)) and isinstance(new, (int, float)):
        return type(old)(new)
    # the reference's EDGE_INPUT_DIM default is the expression "17 + 2" in
    # YAML which loads as a string; accept strings with arithmetic
    if isinstance(new, str) and isinstance(old, int):
        try:
            return int(eval(new, {"__builtins__": {}}, {}))  # noqa: S307
        except Exception:
            pass
    if isinstance(new, str) and isinstance(old, (tuple, list)):
        # yacs literal-evals strings: experiment YAMLs write GPUS: '(0,)'
        import ast

        try:
            parsed = ast.literal_eval(new)
            if isinstance(parsed, (tuple, list)):
                return type(old)(parsed)
        except (ValueError, SyntaxError):
            pass
        # the reference's experiment YAMLs set MODEL.LOSS.NAME (list default)
        # to plain strings like 'node_edge_loss'; its consumers use substring
        # semantics on them, so the string is carried through as-is — but only
        # for that key: any other string for a list-typed key is a config error
        if key.split(".")[-1] == "NAME":
            return new
    raise ValueError(
        f"type mismatch for key {key}: cannot replace {type(old).__name__} "
        f"with {type(new).__name__} ({new!r})"
    )
