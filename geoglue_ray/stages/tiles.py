"""Multi-resolution tile pyramid — aggregate observations to GGrid cells
and roll the aggregates up through coarser resolutions.

This is the tiling half of the north_star ("spatial-join and tiling
engine"): the same hierarchical cells the spatial join uses as its
candidate index (``geoglue_ray.cells``, the H3/S2 stand-in) serve as map
tiles, and a zoom pyramid is built the way a tile server would — aggregate
once at the finest level, then reduce aggregates level by level via the
bit-shift ``parent()`` move, never re-reading the observations.  The
DuckDB oracle deliberately does the opposite (re-encodes every point at
every level), so the pyramid invariant ``parent(encode(p, r)) ==
encode(p, r - 1)`` is cross-checked by two independent implementations.

Scale shape:

- the observation pass is one stateless ``map_batches`` emitting
  per-batch partials (<= distinct-cells rows per batch, never row-scale);
- each level merge is a fixed-cardinality bucket shuffle
  (``hash(cell) % n_buckets``) with the per-bucket reduction vectorized
  over ALL of the bucket's cells in one ``np.unique`` + ``bincount`` pass
  (Ray's native per-key aggregate pays ~1 ms/group — CLAUDE.md);
- each coarser level reduces the PREVIOUS level's aggregate (cell
  cardinality shrinks 8x per level), so rollup cost is geometric, not
  N x levels.

Sums are over integer-valued measures (``floor(value)``) so distributed
addition is order-independent — bit-exact vs SQL (fixtures contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray import cells

_MUL = np.uint64(0x9E3779B185EBCA87)


def _partial_table(cell: np.ndarray, v: np.ndarray, n_buckets: int) -> pa.Table:
    uniq, inv = np.unique(cell, return_inverse=True)
    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    sums = np.bincount(inv, weights=v, minlength=len(uniq))
    bucket = ((uniq.view(np.uint64) * _MUL) % np.uint64(n_buckets)).astype(np.int64)
    return pa.table(
        {
            "_b": pa.array(bucket),
            "cell": pa.array(uniq),
            "n_obs": pa.array(cnt),
            "sum_val": pa.array(sums),
        }
    )


def _reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All cells of one bucket in one unique+bincount pass."""
    cell = g["cell"].to_numpy()
    uniq, inv = np.unique(cell, return_inverse=True)
    return pd.DataFrame(
        {
            "cell": uniq,
            "n_obs": np.bincount(inv, weights=g["n_obs"].to_numpy(), minlength=len(uniq)),
            "sum_val": np.bincount(
                inv, weights=g["sum_val"].to_numpy(), minlength=len(uniq)
            ),
        }
    )


def _merge_level(partials: rd.Dataset, n_buckets: int) -> rd.Dataset:
    out = partials.groupby("_b").map_groups(_reduce_bucket, batch_format="pandas")
    return out


def tile_pyramid(
    ds: rd.Dataset,
    res: int,
    n_levels: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str = "value",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Aggregate points to cells at ``res`` and roll up ``n_levels``
    resolutions (res, res-1, ...).  Returns one row per (level, cell)
    with ``n_obs`` (count) and ``sum_val`` (sum of floor(value)),
    cell exposed as decoded (cell_x, cell_y) for the SQL oracle."""
    if n_levels < 1 or res - (n_levels - 1) < 1:
        raise ValueError(f"invalid pyramid: res={res} n_levels={n_levels}")

    def observe(b: pa.Table) -> pa.Table:
        lon = b[lon_col].to_numpy()
        lat = b[lat_col].to_numpy()
        v = np.floor(b[value_col].to_numpy(zero_copy_only=False).astype(np.float64))
        return _partial_table(cells.encode(lon, lat, res), v, n_buckets)

    def decode_level(b: pa.Table) -> pa.Table:
        r, x, y = cells.decode(b["cell"].to_numpy())
        return pa.table(
            {
                "level": pa.array(r.astype(np.int64)),
                "cell_x": pa.array(x.astype(np.int64)),
                "cell_y": pa.array(y.astype(np.int64)),
                "n_obs": b["n_obs"],
                "sum_val": b["sum_val"],
            }
        )

    # each level is consumed twice (decoded into the output AND reduced
    # into the next level); materialize the tiny cell-cardinality
    # aggregate so the branch doesn't re-execute the shared lineage
    level = _merge_level(
        ds.map_batches(observe, batch_format="pyarrow"), n_buckets
    ).materialize()
    out = level.map_batches(decode_level, batch_format="pyarrow")
    for parent_res in range(res - 1, res - n_levels, -1):

        def to_parent(b: pa.Table, pr: int = parent_res) -> pa.Table:
            cell = cells.parent(b["cell"].to_numpy(), pr)
            uniq, inv = np.unique(cell, return_inverse=True)
            bucket = ((uniq.view(np.uint64) * _MUL) % np.uint64(n_buckets)).astype(
                np.int64
            )
            return pa.table(
                {
                    "_b": pa.array(bucket),
                    "cell": pa.array(uniq),
                    "n_obs": pa.array(
                        np.bincount(inv, weights=b["n_obs"].to_numpy(), minlength=len(uniq))
                    ),
                    "sum_val": pa.array(
                        np.bincount(
                            inv, weights=b["sum_val"].to_numpy(), minlength=len(uniq)
                        )
                    ),
                }
            )

        level = _merge_level(
            level.map_batches(to_parent, batch_format="pyarrow"), n_buckets
        ).materialize()
        out = out.union(level.map_batches(decode_level, batch_format="pyarrow"))
    return out
