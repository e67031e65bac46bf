"""Coverage-fraction zonal statistics — exactextract's defining semantic.

The reference's core zonal operator weights every raster cell by the
*fraction* of the cell covered by each polygon (optionally times a cell
area), via exactextract (``/root/reference/src/geoglue/zonalstats.py:44-62``;
op strings ``cli.py:269-274``; goldens ``tests/test_zonalstats.py:57-72``).
Round 1 shipped only the point/center-assignment half (a boundary cell
contributed 100% or 0%); this stage supplies the missing fraction semantic.

Ray-Data-first shape:

- **Coverage is time-invariant**, so the (cell, polygon, fraction) table is
  computed ONCE per (grid, admin) pair — exactly like exactextract reusing
  the polygon coverage across ``apply_ufunc`` slices — by a distributed
  actor-pool pass over grid rows (one task per row band, the polygon index
  broadcast via ``ray.put``), then broadcast to the join stage.
- The per-slice work is a pure vectorized lookup-explode inside
  ``map_batches`` (`AttachCoverage`): each raster row fans out to its
  overlapping (admin, fraction) pairs via CSR ``searchsorted`` + ``take``;
  no geometry in the hot path.
- Fractions come from an explicit Sutherland–Hodgman rectangle clip
  (``geom.rect_coverage_area``).  With the dyadic fixture geometry every
  intersection coordinate and area is exact rational arithmetic, so the
  distributed result matches the closed-form SQL oracle bit-for-bit.

At 10^12-document scale the coverage table for a global fine grid can reach
~10^8-10^9 rows — past any sane broadcast budget.  :func:`attach_coverage`
selects the topology by measured pair count: broadcast CSR lookup below
``broadcast_pairs_below``, a distributed hash join on the packed cell key
(``Dataset.join``) above it.  Both paths are bit-identical (tested); the
build path is distributed either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray import cells as gcells
from geoglue_ray.geom import Bbox, parse_wkb, rect_coverage_area
from geoglue_ray.grid import GridSpec
from geoglue_ray.sources.admin import AdminIndex

COVERAGE_WEIGHTS = ("none", "area_cartesian", "area_spherical_km2")


def _cell_edges(grid: GridSpec, rows: np.ndarray, cols: np.ndarray):
    """Rect edges of grid cells (centers are (xfirst + col*xinc, yfirst +
    row*yinc); yinc < 0 is the canonical north-first layout)."""
    hx, hy = grid.xinc / 2.0, abs(grid.yinc) / 2.0
    cx = grid.xfirst + cols * grid.xinc
    cy = grid.yfirst + rows * grid.yinc
    return cx - hx, cy - hy, cx + hx, cy + hy


def coverage_pairs(
    index: AdminIndex,
    grid: GridSpec,
    rows: np.ndarray,
    cols: np.ndarray,
    coverage_weight: str = "none",
) -> pa.Table:
    """(cell_row, cell_col, admin_idx, cov) for every (cell, polygon) pair
    with positive intersection area.  ``cov`` is the covered fraction of
    the cell, scaled by the requested coverage weight (planar deg² /
    spherical km² cell area) — exactextract's ``coverage_weight`` options.

    The loop is over grid cells and their bbox candidates — metadata
    scale, run once per grid inside a distributed stage — never over data
    rows."""
    if coverage_weight not in COVERAGE_WEIGHTS:
        raise ValueError(
            f"unknown coverage_weight {coverage_weight!r} (known: {COVERAGE_WEIGHTS})"
        )
    x0, y0, x1, y1 = _cell_edges(grid, rows, cols)
    cell_area = grid.xinc * abs(grid.yinc)
    ps = index.polyset
    # parse each feature's rings once per call (cells >> features per task)
    rings_cache: dict[int, list] = {}
    out_r, out_c, out_f, out_cov = [], [], [], []
    for i in range(len(rows)):
        cov_cells = gcells.cover_bbox(x0[i], y0[i], x1[i], y1[i], index.res)
        pos = np.searchsorted(index.cand_cells, cov_cells)
        pos = np.clip(pos, 0, len(index.cand_cells) - 1)
        hit = index.cand_cells[pos] == cov_cells
        if not hit.any():
            continue
        feats = np.unique(
            np.concatenate(
                [
                    index.cand_feat[index.cand_off[p] : index.cand_off[p + 1]]
                    for p in pos[hit]
                ]
            )
        )
        for f in feats:
            fb = ps.bbox[f]
            if fb[0] >= x1[i] or fb[2] <= x0[i] or fb[1] >= y1[i] or fb[3] <= y0[i]:
                continue
            polys = rings_cache.get(int(f))
            if polys is None:
                polys = _feature_rings(ps, int(f))
                rings_cache[int(f)] = polys
            area = rect_coverage_area(polys, x0[i], y0[i], x1[i], y1[i])
            if area <= 0.0:
                continue
            frac = area / cell_area
            if coverage_weight == "area_cartesian":
                frac *= cell_area
            elif coverage_weight == "area_spherical_km2":
                frac *= Bbox(x0[i], y0[i], x1[i], y1[i]).spherical_area_km2()
            out_r.append(rows[i])
            out_c.append(cols[i])
            out_f.append(int(f))
            out_cov.append(frac)
    return pa.table(
        {
            "cell_row": pa.array(np.asarray(out_r, dtype=np.int64)),
            "cell_col": pa.array(np.asarray(out_c, dtype=np.int64)),
            "admin_idx": pa.array(np.asarray(out_f, dtype=np.int64)),
            "cov": pa.array(np.asarray(out_cov, dtype=np.float64)),
        }
    )


def _feature_rings(ps, f: int) -> list[list[np.ndarray]]:
    """Reconstruct a feature's polygons (lists of closed rings) from the
    CSR PolygonSet layout.  Ring order within a feature is preserved, but
    polygon-part boundaries are not stored in CSR — treat the first ring
    as exterior and same-orientation subsequent rings as further parts,
    opposite-orientation rings as holes (valid for WKB sources encoded by
    ``geom.polygon_wkb``/``multipolygon_wkb``, which keep part exteriors
    and holes in consistent opposite orientations)."""
    from geoglue_ray.geom import ring_area

    ring_ids = ps.rings_of(f)
    rings = [ps.xy[ps.ring_off[r] : ps.ring_off[r + 1]] for r in ring_ids]
    if not rings:
        return []
    first_sign = np.sign(ring_area(rings[0])) or 1.0
    polys: list[list[np.ndarray]] = []
    for ring in rings:
        sign = np.sign(ring_area(ring)) or first_sign
        if sign == first_sign or not polys:
            polys.append([ring])  # new exterior part
        else:
            polys[-1].append(ring)  # hole of the current part
    return polys


class CoverageBuilder:
    """Actor-pool stage: batches of grid-row indices -> coverage pairs.
    Index loaded once per actor from the broadcast ref."""

    def __init__(self, index_ref, grid: GridSpec, coverage_weight: str = "none"):
        self.index: AdminIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.grid = grid
        self.coverage_weight = coverage_weight

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_ids = batch["id"].to_numpy()
        rows = np.repeat(row_ids, self.grid.xsize)
        cols = np.tile(np.arange(self.grid.xsize, dtype=np.int64), len(row_ids))
        return coverage_pairs(self.index, self.grid, rows, cols, self.coverage_weight)


def build_coverage_dataset(
    index_ref, grid: GridSpec, coverage_weight: str = "none", concurrency=(1, 4)
) -> rd.Dataset:
    """Distributed one-shot coverage build as a Dataset: one task band per
    grid row; nothing lands on the driver."""
    return rd.range(grid.ysize).map_batches(
        CoverageBuilder,
        fn_constructor_args=(index_ref, grid, coverage_weight),
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
    )


def build_coverage_table(
    index_ref, grid: GridSpec, coverage_weight: str = "none", concurrency=(1, 4)
) -> pa.Table:
    """Materializing wrapper over :func:`build_coverage_dataset` for the
    broadcast path (small grids only — see :func:`attach_coverage`)."""
    ds = build_coverage_dataset(index_ref, grid, coverage_weight, concurrency)
    return pa.concat_tables(ray.get(ds.to_arrow_refs())).combine_chunks()


def attach_coverage(
    cell: rd.Dataset,
    index_ref,
    grid: GridSpec,
    coverage_weight: str = "none",
    broadcast_pairs_below: int = 10_000_000,
    build_concurrency=(1, 4),
    attach_concurrency=(1, 4),
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Explode raster rows into their overlapping (admin_idx, cov) pairs,
    selecting the topology by coverage-table size:

    - **pair count <= broadcast_pairs_below** (regional grids, ~10^7
      pairs / hundreds of MB): the pairs table is broadcast once
      (``ray.put``) and every task runs the CSR searchsorted explode
      (:class:`AttachCoverage`) — the raster never shuffles.
    - **beyond the ceiling** (a global 1 km grid reaches 10^8-10^9
      pairs — over any sane broadcast budget): the pairs stay a Dataset
      and an inner HASH JOIN on the packed cell key co-partitions raster
      rows with their coverage pairs (``Dataset.join``); both sides
      shuffle once, nothing materializes on the driver.

    Both paths emit identical rows — same columns, same values (tested
    bit-exact; row order differs, downstream aggregation is order-free).
    """
    cov_ds = build_coverage_dataset(
        index_ref, grid, coverage_weight, build_concurrency
    ).materialize()
    n_pairs = cov_ds.count()
    if n_pairs <= broadcast_pairs_below:
        tab = pa.concat_tables(ray.get(cov_ds.to_arrow_refs())).combine_chunks()
        return cell.map_batches(
            AttachCoverage,
            fn_constructor_args=(ray.put(tab), grid.xsize),
            batch_format="pyarrow",
            concurrency=attach_concurrency,
        )
    xs = np.int64(grid.xsize)

    def key_pairs(b: pa.Table) -> pa.Table:
        k = b["cell_row"].to_numpy() * xs + b["cell_col"].to_numpy()
        return pa.table(
            {"cell_key": pa.array(k), "admin_idx": b["admin_idx"], "cov": b["cov"]}
        )

    def key_cells(b: pa.Table) -> pa.Table:
        k = b["cell_row"].to_numpy().astype(np.int64) * xs + b[
            "cell_col"
        ].to_numpy().astype(np.int64)
        return b.append_column("cell_key", pa.array(k))

    if num_partitions is None:
        # each join partition is a long-lived aggregator ACTOR holding a
        # CPU slot: more partitions than the session's CPUs (minus
        # headroom for the map tasks feeding them) never finishes
        # scheduling — the fixed-pool deadlock lesson (CLAUDE.md)
        from geoglue_ray.runtime import pool_size

        num_partitions = pool_size(32, reserve=2)
    pairs = cov_ds.map_batches(key_pairs, batch_format="pyarrow")
    keyed = cell.map_batches(key_cells, batch_format="pyarrow")
    joined = keyed.join(
        pairs, join_type="inner", num_partitions=num_partitions, on=("cell_key",)
    )
    return joined.drop_columns(["cell_key"])


class AttachCoverage:
    """Actor-pool stage: explode each raster row into its overlapping
    (admin_idx, cov) pairs via a broadcast CSR lookup (searchsorted +
    take); rows over cells with no positive-coverage polygon are dropped
    (inner semantics, matching the oracle's cov > 0 join)."""

    def __init__(self, cov_ref, xsize: int):
        t: pa.Table = ray.get(cov_ref) if isinstance(cov_ref, ray.ObjectRef) else cov_ref
        key = t["cell_row"].to_numpy() * np.int64(xsize) + t["cell_col"].to_numpy()
        order = np.argsort(key, kind="stable")
        self.keys = key[order]
        self.admin = t["admin_idx"].to_numpy()[order]
        self.cov = t["cov"].to_numpy()[order]
        self.uniq, start = np.unique(self.keys, return_index=True)
        self.off = np.concatenate([start, [len(self.keys)]]).astype(np.int64)
        self.xsize = np.int64(xsize)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(self.uniq) == 0:  # no polygon overlaps any cell: inner
            # semantics -> zero rows (np.where below would evaluate
            # off[pos + 1] on the empty CSR and raise)
            out = batch.slice(0, 0)
            out = out.append_column("admin_idx", pa.array([], pa.int64()))
            return out.append_column("cov", pa.array([], pa.float64()))
        k = (
            batch["cell_row"].to_numpy().astype(np.int64) * self.xsize
            + batch["cell_col"].to_numpy().astype(np.int64)
        )
        pos = np.searchsorted(self.uniq, k)
        pos = np.clip(pos, 0, len(self.uniq) - 1)
        hit = self.uniq[pos] == k
        n = np.where(hit, self.off[pos + 1] - self.off[pos], 0)
        rep = np.repeat(np.arange(len(k)), n)
        tot = int(n.sum())
        within = np.arange(tot) - np.repeat(np.cumsum(n) - n, n)
        src = np.repeat(self.off[pos], n) + within
        out = batch.take(pa.array(rep))
        out = out.append_column("admin_idx", pa.array(self.admin[src]))
        return out.append_column("cov", pa.array(self.cov[src]))
