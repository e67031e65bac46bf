"""Operation-string mini-grammar (user-extension surface).

Mirrors the reference's exactextract op strings with keyword params and
config-level aliases: ``weighted_mean(coverage_weight=area_spherical_km2,
default_weight=0)``, ``area_weighted_sum(default_value=0,default_weight=0)``
(``cli.py:268-278``; alias remap ``gcfg.operation.get(op, op)``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_OP_RE = re.compile(r"^(?P<name>[a-zA-Z_][\w]*)(?:\((?P<params>[^)]*)\))?$")

KNOWN_OPS = {
    "mean",
    "sum",
    "count",
    "min",
    "max",
    "weighted_mean",
    "weighted_sum",
    "area_weighted_sum",
}


@dataclass(frozen=True)
class OpSpec:
    name: str
    params: tuple[tuple[str, str], ...] = ()

    @property
    def param_dict(self) -> dict[str, str]:
        return dict(self.params)

    @property
    def needs_weight(self) -> bool:
        return self.name.startswith("weighted_") or self.name == "area_weighted_sum"


def parse_op(op: str, aliases: dict[str, str] | None = None) -> OpSpec:
    """Parse one op string, applying config aliases first (``cli.py:278``)."""
    if aliases:
        op = aliases.get(op, op)
    m = _OP_RE.match(op.strip())
    if not m:
        raise ValueError(f"invalid operation string: {op!r}")
    name = m.group("name")
    if name not in KNOWN_OPS:
        raise ValueError(f"unknown operation {name!r} (known: {sorted(KNOWN_OPS)})")
    params: list[tuple[str, str]] = []
    if m.group("params"):
        for kv in m.group("params").split(","):
            if not kv.strip():
                continue
            if "=" not in kv:
                raise ValueError(f"malformed param {kv!r} in {op!r}")
            k, v = kv.split("=", 1)
            params.append((k.strip(), v.strip()))
    return OpSpec(name=name, params=tuple(params))


def parse_ops(ops: list[str], aliases: dict[str, str] | None = None) -> list[OpSpec]:
    return [parse_op(o, aliases) for o in ops]
