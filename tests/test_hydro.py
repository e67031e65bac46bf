"""D8 flow accumulation / basin labeling: brute-force equivalence and
band-contraction invariance (the oracle gate covers the fixture-scale
recursive-CTE twin; these pin the stage on adversarial small lattices)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geoglue_ray import fixtures as fx
from geoglue_ray.stages.hydro import flow_hydrology
from geoglue_ray.stages.stencil import flow_direction

DIRS = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def _lattice(nt: int, nr: int, nc: int, hole_frac: float, seed: int):
    rng = np.random.default_rng(seed)
    t, r, c = np.meshgrid(np.arange(nt), np.arange(nr), np.arange(nc), indexing="ij")
    t, r, c = t.ravel(), r.ravel(), c.ravel()
    v = rng.integers(0, 50, size=len(t)).astype(np.float64)
    v[rng.random(len(t)) < hole_frac] = np.nan
    return t, r, c, v


def _dataset(t, r, c, v):
    import ray.data as rd

    T0 = np.datetime64(fx.T0, "us")
    return rd.from_arrow(
        pa.table(
            {
                "valid_time": pa.array(
                    T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(r.astype(np.int32)),
                "cell_col": pa.array(c.astype(np.int32)),
                "variable": pa.array(np.repeat("t2m", len(t))),
                "value": pa.array(v),
            }
        )
    ).repartition(3)


def _brute(t, r, c, v, nt, nr, nc) -> pd.DataFrame:
    grid = np.full((nt, nr, nc), np.nan)
    grid[t, r, c] = v
    succ: dict[tuple, tuple | None] = {}
    for ti in range(nt):
        for ri in range(nr):
            for ci in range(nc):
                if not np.isfinite(grid[ti, ri, ci]):
                    continue
                best, bd = None, -np.inf
                seen = False
                for k, (dr, dc) in enumerate(DIRS):
                    rj, cj = ri + dr, ci + dc
                    if 0 <= rj < nr and 0 <= cj < nc and np.isfinite(grid[ti, rj, cj]):
                        seen = True
                        d = grid[ti, ri, ci] - grid[ti, rj, cj]
                        if d > bd:
                            bd, best = d, (rj, cj)
                if not seen:
                    continue
                succ[(ti, ri, ci)] = best if bd > 0.0 else None
    acc = {k: 0 for k in succ}
    basin = {}
    for k in succ:
        cur = k
        while True:
            acc[cur] += 1
            nx = succ[cur]
            if nx is None:
                basin[k] = cur[1:]
                break
            cur = (cur[0], *nx)
    rows = [
        (ti, ri, ci, acc[(ti, ri, ci)], *basin[(ti, ri, ci)])
        for (ti, ri, ci) in sorted(succ)
    ]
    return pd.DataFrame(
        rows,
        columns=["t", "cell_row", "cell_col", "flow_acc", "basin_row", "basin_col"],
    )


def test_flow_hydrology_matches_brute_force(ray_session):
    nt, nr, nc = 2, 11, 7
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.15, seed=7)
    got = (
        flow_hydrology(
            flow_direction(_dataset(t, r, c, v), band_rows=3, hour_chunk=1),
            band_rows=3,
            hour_chunk=1,
        )
        .to_pandas()
        .sort_values(["valid_time", "cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    want = _brute(t, r, c, v, nt, nr, nc)
    assert len(got) == len(want)
    for col in ("cell_row", "cell_col", "flow_acc", "basin_row", "basin_col"):
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())
    T0 = np.datetime64(fx.T0, "us")
    np.testing.assert_array_equal(
        got["valid_time"].to_numpy(),
        T0 + (want["t"].to_numpy() * 3_600_000_000).astype("timedelta64[us]"),
    )
    # conservation: every basin's accumulation at the pit equals its size
    pit = got[
        (got.cell_row == got.basin_row) & (got.cell_col == got.basin_col)
    ]
    sizes = got.groupby(["valid_time", "basin_row", "basin_col"]).size()
    for (_, row) in pit.iterrows():
        assert row.flow_acc == sizes[(row.valid_time, row.basin_row, row.basin_col)]


def test_flow_hydrology_band_invariance(ray_session):
    """Identical output for any band/chunk contraction geometry — the
    perimeter solve and pour exactly reconstruct the global walk."""
    nt, nr, nc = 3, 12, 6
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.25, seed=23)
    fd = flow_direction(
        _dataset(t, r, c, v), band_rows=4, hour_chunk=2
    ).materialize()
    outs = []
    for band_rows, hour_chunk in ((1, 1), (2, 3), (5, 2), (100, 24)):
        outs.append(
            flow_hydrology(fd, band_rows=band_rows, hour_chunk=hour_chunk)
            .to_pandas()
            .sort_values(["valid_time", "cell_row", "cell_col"])
            .reset_index(drop=True)
        )
    for other in outs[1:]:
        assert outs[0].equals(other)
