"""Per-stage runtime metrics: row/byte counters as a named Ray actor.

SURVEY.md §4's "explicit per-stage counters" — the reference only logs
wall-clock lines (``cli.py:296-305``); at scale you also want rows-in/out
per stage.  :func:`instrument` wraps any point of a Dataset with a
zero-copy pass-through ``map_batches`` that increments a detached named
counter actor; :func:`read_counters` snapshots them (driver side), and
:func:`emit_logfmt` renders the snapshot as logfmt lines.

The counter actor is the one legitimate raw-``@ray.remote`` use in the
engine: shared mutable state the Dataset API cannot express.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

_ACTOR_NAME = "geoglue_ray_counters"


@ray.remote(num_cpus=0)
class _Counters:
    def __init__(self):
        self._rows: dict[str, int] = {}
        self._bytes: dict[str, int] = {}
        self._batches: dict[str, int] = {}

    def add(self, label: str, rows: int, nbytes: int) -> None:
        self._rows[label] = self._rows.get(label, 0) + rows
        self._bytes[label] = self._bytes.get(label, 0) + nbytes
        self._batches[label] = self._batches.get(label, 0) + 1

    def snapshot(self) -> dict:
        return {
            label: {
                "rows": self._rows[label],
                "bytes": self._bytes[label],
                "batches": self._batches[label],
            }
            for label in sorted(self._rows)
        }

    def reset(self) -> None:
        self._rows.clear()
        self._bytes.clear()
        self._batches.clear()


_HANDLE_CACHE: dict = {}


def _get_actor():
    """Job-scoped named actor (NOT detached: a detached actor in an
    anonymous namespace outlives the job unreachably — a leak); handle
    cached per process so the hot path never repeats the GCS lookup."""
    h = _HANDLE_CACHE.get(_ACTOR_NAME)
    if h is None:
        h = _Counters.options(name=_ACTOR_NAME, get_if_exists=True).remote()
        _HANDLE_CACHE[_ACTOR_NAME] = h
    return h


def instrument(ds: rd.Dataset, label: str) -> rd.Dataset:
    """Pass-through stage counting rows/bytes/batches under ``label``.

    Fire-and-forget increments (no await in the data path); the batch is
    returned untouched — zero copy, zero reordering.
    """
    _get_actor()  # ensure it exists before workers look it up

    def count(b: pa.Table) -> pa.Table:
        _get_actor().add.remote(label, len(b), b.nbytes)
        return b

    return ds.map_batches(count, batch_format="pyarrow")


def bump(label: str, rows: int, nbytes: int = 0) -> None:
    """Fire-and-forget increment from inside any worker task — for stages
    that need to account for capped/dropped work (no silent truncation)."""
    _get_actor().add.remote(label, rows, nbytes)


def read_counters(reset: bool = False, settle_s: float = 0.5) -> dict:
    """Snapshot the counters.  Increments are fire-and-forget from many
    workers (no cross-caller ordering guarantee), so the snapshot polls
    until two consecutive reads agree (or ``settle_s`` elapses) — an
    eventual-consistency barrier good enough for metrics."""
    import time

    actor = _get_actor()
    snap = ray.get(actor.snapshot.remote())
    deadline = time.monotonic() + settle_s
    while time.monotonic() < deadline:
        time.sleep(0.05)
        nxt = ray.get(actor.snapshot.remote())
        if nxt == snap:
            break
        snap = nxt
    if reset:
        ray.get(actor.reset.remote())
    return snap


def emit_logfmt(snapshot: dict) -> list[str]:
    from geoglue_ray.functions.logfmt import logfmt_line

    return [
        logfmt_line(stage=label, **vals) for label, vals in snapshot.items()
    ]
