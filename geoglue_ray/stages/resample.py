"""Grid resampling as pure Arrow/numpy math — no external ``cdo`` process.

Re-implements the reference's resampling operators (``resample.py:81-161``):

- ``remapnn``  — nearest source cell (CDO remapnn)
- ``remapbil`` — bilinear from the 4 surrounding source cell centers
- ``remapdis`` — inverse-distance weighted mean of the 4 nearest centers
- ``sremapbil`` — sparse bilinear (``resample.py:19-78``): bilinear of the
  zero-filled field divided by bilinear of the non-NaN mask, thresholded at
  ``eps`` — prevents NaN bleeding across land/ocean boundaries.

The source raster is a dense 2D array + :class:`GridSpec`, broadcast via
``ray.put`` once and interpolated per batch inside an actor pool; the
destination is any Dataset of points (or a generated target grid).  With
dyadic grid geometry every weight and product is exact, so distributed
output matches the serial SQL oracle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray.geom import Bbox
from geoglue_ray.grid import GridSpec

EPS = 1e-6  # sparse-mask threshold (resample.py:23 eps)
WARN_BELOW_COVERAGE = 0.8  # resample.py:16


def grid_to_dense(
    table: pa.Table, spec: GridSpec, value_col: str = "value"
) -> np.ndarray:
    """Long-form raster table -> dense (ysize, xsize) array (NaN-filled)."""
    out = np.full((spec.ysize, spec.xsize), np.nan)
    r = table["cell_row"].to_numpy()
    c = table["cell_col"].to_numpy()
    out[r, c] = table[value_col].to_numpy(zero_copy_only=False)
    return out


def check_coverage(src: GridSpec, dst_bbox: Bbox) -> bool:
    """Warn-level check that the source covers the target
    (``resample.py:118-128``)."""
    return Bbox(*src.bbox()) >= dst_bbox


def _index_space(
    x: np.ndarray, y: np.ndarray, spec: GridSpec
) -> tuple[np.ndarray, np.ndarray]:
    gx = (x - spec.xfirst) / spec.xinc
    gy = (y - spec.yfirst) / spec.yinc  # yinc<0: gy grows southward
    return gx, gy


def nearest(grid: np.ndarray, spec: GridSpec, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    # round-half-up via floor(g + 0.5): deterministic and identical to the
    # SQL oracle's floor arithmetic (np.rint's banker's rounding is not)
    gx, gy = _index_space(x, y, spec)
    i = np.clip(np.floor(gx + 0.5).astype(np.int64), 0, spec.xsize - 1)
    j = np.clip(np.floor(gy + 0.5).astype(np.int64), 0, spec.ysize - 1)
    return grid[j, i]


def bilinear(grid: np.ndarray, spec: GridSpec, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """4-corner bilinear; NaN outside the source interior or when any
    corner is NaN (dense semantics — use :func:`bilinear_sparse` for the
    mask-normalized variant)."""
    gx, gy = _index_space(x, y, spec)
    i0 = np.floor(gx).astype(np.int64)
    j0 = np.floor(gy).astype(np.int64)
    inside = (i0 >= 0) & (i0 < spec.xsize - 1) & (j0 >= 0) & (j0 < spec.ysize - 1)
    i0c = np.clip(i0, 0, spec.xsize - 2)
    j0c = np.clip(j0, 0, spec.ysize - 2)
    fx = gx - i0
    fy = gy - j0
    v00 = grid[j0c, i0c]
    v01 = grid[j0c, i0c + 1]
    v10 = grid[j0c + 1, i0c]
    v11 = grid[j0c + 1, i0c + 1]
    v = (
        (1.0 - fx) * (1.0 - fy) * v00
        + fx * (1.0 - fy) * v01
        + (1.0 - fx) * fy * v10
        + fx * fy * v11
    )
    return np.where(inside, v, np.nan)


def bilinear_sparse(
    grid: np.ndarray, spec: GridSpec, x: np.ndarray, y: np.ndarray, eps: float = EPS
) -> np.ndarray:
    """Sparse bilinear (``resample.py:19-78``): bilinear(fillna(0)) /
    bilinear(mask) where mask>eps, NaN elsewhere."""
    fill = np.where(np.isnan(grid), 0.0, grid)
    mask = np.where(np.isnan(grid), 0.0, 1.0)
    rf = bilinear(fill, spec, x, y)
    rm = bilinear(mask, spec, x, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(rm > eps, rf / rm, np.nan)
    return out


def inverse_distance(
    grid: np.ndarray, spec: GridSpec, x: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """Distance-weighted mean of the 4 surrounding cell centers (CDO
    remapdis with neighbors=4), weights 1/d, exact hit -> source value;
    NaN corners are skipped (weight 0)."""
    gx, gy = _index_space(x, y, spec)
    i0 = np.clip(np.floor(gx).astype(np.int64), 0, spec.xsize - 2)
    j0 = np.clip(np.floor(gy).astype(np.int64), 0, spec.ysize - 2)
    acc_w = np.zeros(len(x))
    acc_wv = np.zeros(len(x))
    exact = np.full(len(x), np.nan)
    for dj in (0, 1):
        for di in (0, 1):
            vi = grid[j0 + dj, i0 + di]
            dx = (gx - (i0 + di)) * spec.xinc
            dy = (gy - (j0 + dj)) * spec.yinc
            # sqrt(dx^2+dy^2), NOT np.hypot: hypot's overflow-safe scaling
            # can differ from the naive chain in the last ulp, while this
            # exact sequence of correctly-rounded IEEE ops is reproduced
            # bit-for-bit by the DuckDB oracle (oracles.resample_idw).
            # Grid spans are << sqrt(DBL_MAX), so overflow is impossible.
            d = np.sqrt(dx * dx + dy * dy)
            hit = d == 0
            exact = np.where(hit & ~np.isnan(vi), vi, exact)
            ok = ~np.isnan(vi) & (d > 0)
            w = np.where(ok, 1.0 / np.where(d > 0, d, 1.0), 0.0)
            acc_w += w
            acc_wv += w * np.where(ok, vi, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(acc_w > 0, acc_wv / acc_w, np.nan)
    return np.where(~np.isnan(exact), exact, out)


def kriging3(
    grid: np.ndarray, spec: GridSpec, x: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """ORDINARY KRIGING on the 3 nearest of the 4 surrounding cell
    centers under a LINEAR variogram ``gamma(h) = h`` — the exact-
    arithmetic member of the kriging family (spherical/exponential
    models need transcendentals, which never mirror bit-for-bit;
    the linear model's weights are scale-invariant so the unit slope
    loses nothing).  The 3-point bordered system

        [A  1][w]   [g]        A = pairwise corner distances,
        [1' 0][mu] = [1]       g = target-corner distances

    has the closed form ``w = A^-1 g - mu A^-1 1`` with
    ``A^-1 = adj/(2abc)`` for the zero-diagonal symmetric 3x3 — every
    step below is a FIXED chain of correctly-rounded IEEE ops mirrored
    verbatim by the DuckDB twin (oracles.resample_kriging), so results
    are bit-exact.  Kriging weights may be negative (screening) — that
    is correct behaviour, not an error.

    Corner selection: drop the farthest of the 4 corners (ties drop the
    LAST corner in (00, 01, 10, 11) order — the SQL CASE chain's
    first-match rule).  Exact hits (d == 0) return the source value in
    corner order, as in :func:`inverse_distance`."""
    gx, gy = _index_space(x, y, spec)
    i0 = np.clip(np.floor(gx).astype(np.int64), 0, spec.xsize - 2)
    j0 = np.clip(np.floor(gy).astype(np.int64), 0, spec.ysize - 2)
    d: dict[str, np.ndarray] = {}
    v: dict[str, np.ndarray] = {}
    for key, (dj, di) in (
        ("00", (0, 0)), ("01", (0, 1)), ("10", (1, 0)), ("11", (1, 1))
    ):
        vi = grid[j0 + dj, i0 + di]
        dx = (gx - (i0 + di)) * spec.xinc
        dy = (gy - (j0 + dj)) * spec.yinc
        d[key] = np.sqrt(dx * dx + dy * dy)  # NOT hypot (oracle mirror)
        v[key] = vi
    hd = np.sqrt(spec.xinc * spec.xinc)
    vd = np.sqrt(spec.yinc * spec.yinc)
    dg = np.sqrt(spec.xinc * spec.xinc + spec.yinc * spec.yinc)
    # drop the farthest corner; ties drop the LAST index (the SQL CASE
    # chain checks 11, 10, 01 in order, first match wins)
    m11 = (d["11"] >= d["10"]) & (d["11"] >= d["01"]) & (d["11"] >= d["00"])
    m10 = ~m11 & (d["10"] >= d["01"]) & (d["10"] >= d["00"])
    m01 = ~m11 & ~m10 & (d["01"] >= d["00"])

    def sel(c11, c10, c01, c00):
        return np.where(m11, c11, np.where(m10, c10, np.where(m01, c01, c00)))

    # kept triples per dropped corner, in ascending corner order:
    # drop11 -> (00,01,10)  a=hd b=vd c=dg
    # drop10 -> (00,01,11)  a=hd b=dg c=vd
    # drop01 -> (00,10,11)  a=vd b=dg c=hd
    # drop00 -> (01,10,11)  a=dg b=vd c=hd
    a = sel(hd, hd, vd, dg)
    b = sel(vd, dg, dg, vd)
    c = sel(dg, vd, hd, hd)
    g1 = sel(d["00"], d["00"], d["00"], d["01"])
    g2 = sel(d["01"], d["01"], d["10"], d["10"])
    g3 = sel(d["10"], d["11"], d["11"], d["11"])
    v1 = sel(v["00"], v["00"], v["00"], v["01"])
    v2 = sel(v["01"], v["01"], v["10"], v["10"])
    v3 = sel(v["10"], v["11"], v["11"], v["11"])
    den = ((2.0 * a) * b) * c
    u1 = ((-(c * c)) * g1 + (b * c) * g2 + (a * c) * g3) / den
    u2 = ((b * c) * g1 + (-(b * b)) * g2 + (a * b) * g3) / den
    u3 = ((a * c) * g1 + (a * b) * g2 + (-(a * a)) * g3) / den
    t1 = ((-(c * c)) + (b * c) + (a * c)) / den
    t2 = ((b * c) + (-(b * b)) + (a * b)) / den
    t3 = ((a * c) + (a * b) + (-(a * a))) / den
    mu = ((u1 + u2 + u3) - 1.0) / (t1 + t2 + t3)
    pred = (u1 - mu * t1) * v1 + (u2 - mu * t2) * v2 + (u3 - mu * t3) * v3
    # exact hits override in corner order (00 first = applied last)
    for key in ("11", "10", "01", "00"):
        pred = np.where((d[key] == 0) & ~np.isnan(v[key]), v[key], pred)
    return pred


_METHODS = {
    "remapnn": nearest,
    "remapbil": bilinear,
    "remapdis": inverse_distance,
    "sremapbil": bilinear_sparse,
    "remapok": kriging3,
}


class Resampler:
    """Actor-pool stage: interpolate the broadcast source raster at each
    batch's (x, y) points; appends ``resampled``."""

    def __init__(self, src_ref, spec: GridSpec, method: str):
        if method not in _METHODS:
            raise ValueError(f"unknown resampling {method!r} (one of {sorted(_METHODS)})")
        self.grid = ray.get(src_ref) if isinstance(src_ref, ray.ObjectRef) else src_ref
        self.spec = spec
        self.fn = _METHODS[method]

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = self.fn(
            self.grid, self.spec, batch["lon"].to_numpy(), batch["lat"].to_numpy()
        )
        return batch.append_column("resampled", pa.array(v))


def target_grid_dataset(spec: GridSpec, rows_per_task: int = 64) -> rd.Dataset:
    """Generate the target grid's cell centers as a streaming Dataset."""
    n_chunks = max(1, spec.ysize // rows_per_task)

    def gen(batch: pa.Table):
        for chunk in batch["id"].to_numpy():
            r0 = int(chunk) * rows_per_task
            r1 = min(r0 + rows_per_task, spec.ysize)
            if r0 >= r1:
                continue
            rr, cc = np.meshgrid(np.arange(r0, r1), np.arange(spec.xsize), indexing="ij")
            rr, cc = rr.ravel(), cc.ravel()
            lon, lat = spec.cell_lonlat(rr, cc)
            yield pa.table(
                {
                    "cell_row": rr.astype(np.int32),
                    "cell_col": cc.astype(np.int32),
                    "lon": lon,
                    "lat": lat,
                }
            )

    n_tasks = (spec.ysize + rows_per_task - 1) // rows_per_task
    return rd.range(n_tasks).map_batches(gen, batch_format="pyarrow", batch_size=1)


def resample(
    src_table: pa.Table,
    src_spec: GridSpec,
    dst_spec: GridSpec,
    method: str,
    value_col: str = "value",
    concurrency=(1, 4),
) -> rd.Dataset:
    """Long-form source raster -> resampled long-form raster on dst grid.

    The dense source (one broadcast object) + generated target grid; mirrors
    ``resample(resampling, infile, target)`` (``resample.py:81-161``)
    including the coverage warning.
    """
    if not check_coverage(src_spec, Bbox(*dst_spec.bbox())):
        import warnings

        warnings.warn(
            "source grid does not fully cover target grid; edge cells will be NaN"
            " (resample.py:118-128 semantics)"
        )
    dense = grid_to_dense(src_table, src_spec, value_col)
    src_ref = ray.put(dense)
    ds = target_grid_dataset(dst_spec)
    return ds.map_batches(
        Resampler,
        fn_constructor_args=(src_ref, src_spec, method),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ------------------------------------------------------------------------
# First-order conservative regrid — CDO ``remapcon`` (the last member of
# the reference's remap grammar family, resample.py:81-161).
#
# Integer lattice: 1 unit = 1/256 degree.  Both grids place every cell
# boundary on this lattice, so each per-axis overlap length is an exact
# int64 — the numerator ``sum(value * ox * oy)`` is an order-independent
# integer sum, and the single final division by the target cell area is
# the only float op, which makes the DuckDB twin bit-exact.
CON_SRC_U = 32  # source (weights) cell size in units (0.125 deg)
CON_TINC_U = 48  # target cell size in units (0.1875 deg) — never nests
CON_X0_U = 1  # target west edge, units east of the source west edge
CON_YTOP_U = 8191  # target north edge, units north of the source south edge
CON_N = 128  # target grid is CON_N x CON_N


def conservative_target_cells(n: int = CON_N, rows_per_task: int = 16) -> rd.Dataset:
    """Target cell (row, col) index pairs as a streaming Dataset."""

    def gen(batch: pa.Table):
        for chunk in batch["id"].to_numpy():
            r0 = int(chunk) * rows_per_task
            r1 = min(r0 + rows_per_task, n)
            if r0 >= r1:
                continue
            rr, cc = np.meshgrid(np.arange(r0, r1), np.arange(n), indexing="ij")
            yield pa.table(
                {
                    "cell_row": pa.array(rr.ravel().astype(np.int32)),
                    "cell_col": pa.array(cc.ravel().astype(np.int32)),
                }
            )

    n_tasks = (n + rows_per_task - 1) // rows_per_task
    return rd.range(n_tasks).map_batches(gen, batch_format="pyarrow", batch_size=1)


class ConservativeRegridder:
    """Area-weighted (flux-conserving) regrid of an integer source field:
    each target cell's value is the exact area-weighted mean of every
    source cell it overlaps, so the regrid preserves the spatial integral
    over the covered window bit-exactly (asserted in test_resample).

    The source field is broadcast once via ``ray.put`` (the same
    broadcast-bounded small-side assumption as every :class:`Resampler`
    mode); target cells stream through in batches — no shuffle at all.
    A target cell spans at most ``ceil(TINC/SRC)+1 = 3`` source cells per
    axis, so the gather is a fixed (n, 3, 3) window."""

    _OFF = np.arange(3, dtype=np.int64)

    def __init__(self, grid_ref):
        # dense [south-ascending row, col] integer field
        self.grid = np.ascontiguousarray(ray.get(grid_ref).astype(np.int64))

    def __call__(self, b: pa.Table) -> pa.Table:
        ny, nx = self.grid.shape
        tr = b["cell_row"].to_numpy().astype(np.int64)
        tc = b["cell_col"].to_numpy().astype(np.int64)
        tx0 = CON_X0_U + CON_TINC_U * tc
        ty0 = CON_YTOP_U - CON_TINC_U * (tr + 1)
        i = tx0[:, None] // CON_SRC_U + self._OFF[None, :]
        wy = ty0[:, None] // CON_SRC_U + self._OFF[None, :]
        ox = np.clip(
            np.minimum(tx0[:, None] + CON_TINC_U, CON_SRC_U * (i + 1))
            - np.maximum(tx0[:, None], CON_SRC_U * i),
            0,
            None,
        )
        oy = np.clip(
            np.minimum(ty0[:, None] + CON_TINC_U, CON_SRC_U * (wy + 1))
            - np.maximum(ty0[:, None], CON_SRC_U * wy),
            0,
            None,
        )
        # zero-overlap guard columns may index past the field edge — the
        # clipped gather is multiplied by their ox/oy == 0
        v = self.grid[
            np.clip(wy, 0, ny - 1)[:, :, None], np.clip(i, 0, nx - 1)[:, None, :]
        ]
        num = (v * oy[:, :, None] * ox[:, None, :]).sum(axis=(1, 2))
        res = num.astype(np.float64) / float(CON_TINC_U * CON_TINC_U)
        return pa.table(
            {
                "cell_row": b["cell_row"],
                "cell_col": b["cell_col"],
                "resampled": pa.array(res),
            }
        )
