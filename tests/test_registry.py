"""Registry integrity guards (the round-4 'grep the registry first'
hazard, hardened): every query has an oracle twin, no orphans on either
side, and the driver-sample head stays at 50 verified entries."""

from __future__ import annotations

import ast
from pathlib import Path

import __ray_entry__ as entrymod


def test_every_query_has_an_oracle_twin():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (
        f"rows-only queries (no twin): {sorted(q - o)}; "
        f"orphan oracles (dead SQL): {sorted(o - q)}"
    )
    assert len(q) >= 280


def test_no_duplicate_literal_keys():
    """A duplicate key in the dict LITERAL silently resolves to the later
    value while keeping the earlier position — the exact failure that
    twice shipped dead engine code in round 4.  Parse the AST: every
    dict literal in __ray_entry__ must have unique constant keys."""
    tree = ast.parse(Path(entrymod.__file__).read_text())
    checked = 0
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            assert len(keys) == len(set(keys)), (
                f"duplicate registry keys: "
                f"{sorted(k for k in keys if keys.count(k) > 1)}"
            )
            checked += 1
    assert checked >= 2  # queries() and oracle_sql()


def test_driver_sample_head_is_stable():
    """The driver checks the FIRST 50 queries() entries: they must all
    have oracle twins (a rows-only head entry weakens the sample)."""
    names = list(entrymod.queries())[:50]
    o = set(entrymod.oracle_sql())
    missing = [n for n in names if n not in o]
    assert not missing, missing
