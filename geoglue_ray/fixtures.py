"""Deterministic fixture derivation — the single source of truth.

The driver's correctness gate runs our Ray pipelines against DuckDB SQL
oracles over the same parquet tables.  The raw ``documents`` / ``events``
tables carry no coordinates, so we derive the interleaved geospatial corpus
(`BASELINE.json` ``input_hint``) deterministically from the integer id with
arithmetic that is **bit-exact in both numpy and DuckDB**:

- Coordinates are odd-numerator dyadic fractions (``(2*h+1) * 2**-k``), so
  every intermediate value is exactly representable and no float rounding
  ever occurs before the final result.  In particular no point can fall
  exactly on an admin-cell boundary (the numerator is odd, boundaries are
  even) nor on a triangle diagonal (the lon- and lat-fraction granularities
  differ by a power of two, so ``fx + fy == 1`` is impossible by parity).
  This makes the geometric point-in-polygon assignment of the engine
  provably identical to the closed-form floor-arithmetic SQL oracle.
- Measures (``value``, ``weight``) are *integer-valued* doubles, so sums
  are exact integers (≪ 2**53) and therefore independent of addition
  order — a distributed partial/final aggregation matches a serial SQL
  ``SUM`` bit-exactly.

The admin fixture mirrors the reference's GADM admin hierarchy
(``region.py:225-287`` pk ``GID_{level}``; 706 usable VNM admin-2 regions in
``tests/test_zonalstats.py:14``): a VNM-shaped bbox [102,110)x[8,24) split
into 16x32 half-degree cells, each split into 2 triangles -> 1024 admin-2
units under 4x8=32 admin-1 units.  ~30% of ids cluster into one "city"
cell (skewed mega-cell, per north_star) and ids divisible by 128 fall
outside every polygon to exercise the kNN-nearest-centroid fallback.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- constants
LON0, LAT0 = 102.0, 8.0  # admin bbox origin
LON_SPAN, LAT_SPAN = 8.0, 16.0  # bbox [102,110) x [8,24)
CELL = 0.5  # admin-2 base cell size (deg); exact binary
NX, NY = 16, 32  # half-degree cells
N_ADMIN2 = NX * NY * 2  # 1024 triangles
ADM1_BLOCK = 4  # 4x4 cells per admin-1
NX1, NY1 = NX // ADM1_BLOCK, NY // ADM1_BLOCK  # 4 x 8 = 32 admin-1

# weight raster (worldpop-shaped, finer than admin grid): 0.125 deg cells
# anchored at (96, 0) so indices stay non-negative even for outside points
# (negative modulo differs between numpy and SQL).
WLON0, WLAT0, WCELL = 96.0, 0.0, 0.125
WNX, WNY = 208, 256  # covers lon [96,122) x lat [0,32)

# Lehmer-style integer mixers (all intermediate products < 2**63).
H1_MUL, H1_ADD, H1_MOD = 48271, 11, 131072  # 2**17 — lon
H2_MUL, H2_ADD, H2_MOD = 69621, 7, 32768  # 2**15 — lat
H3_MUL, H3_ADD, H3_MOD = 16807, 3, 65536  # 2**16 — value

T0 = np.datetime64("2020-01-06T00:00:00", "us")  # a Monday (ISO week start)
T0_SQL = "TIMESTAMP '2020-01-06 00:00:00'"
N_HOURS = 720  # 30 days of hourly observations

CITY_MOD, CITY_LT = 10, 3  # id % 10 < 3  -> city cluster (~30%)
OUT_MOD = 128  # id % 128 == 0 -> outside all polygons (~0.8%)


# ---------------------------------------------------------------- numpy side
def _h(ids: np.ndarray, mul: int, add: int, mod: int) -> np.ndarray:
    return (ids.astype(np.int64) * mul + add) % mod


def derive_lonlat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """id -> (lon, lat), bit-exact vs :func:`sql_lon` / :func:`sql_lat`."""
    ids = np.asarray(ids, dtype=np.int64)
    h1 = _h(ids, H1_MUL, H1_ADD, H1_MOD).astype(np.float64)
    h2 = _h(ids, H2_MUL, H2_ADD, H2_MOD).astype(np.float64)
    # all three branches are exact dyadic arithmetic (no rounding at all)
    lon_in = 102.0 + (2.0 * h1 + 1.0) * (8.0 / 262144.0)
    lat_in = 8.0 + (2.0 * h2 + 1.0) * (16.0 / 65536.0)
    lon_city = 105.0 + (2.0 * h1 + 1.0) * (0.25 / 262144.0)
    lat_city = 10.0 + (2.0 * h2 + 1.0) * (0.25 / 65536.0)
    lon_out = 100.0 + (2.0 * h1 + 1.0) * (1.0 / 262144.0)
    lat_out = 6.0 + (2.0 * h2 + 1.0) * (1.0 / 65536.0)
    is_out = ids % OUT_MOD == 0
    is_city = (~is_out) & (ids % CITY_MOD < CITY_LT)
    lon = np.where(is_out, lon_out, np.where(is_city, lon_city, lon_in))
    lat = np.where(is_out, lat_out, np.where(is_city, lat_city, lat_in))
    return lon, lat


def derive_value(ids: np.ndarray) -> np.ndarray:
    """Integer-valued double in [0, 65536) — exact under any summation order."""
    return _h(np.asarray(ids, dtype=np.int64), H3_MUL, H3_ADD, H3_MOD).astype(np.float64)


def derive_event_time(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return T0 + ((ids % N_HOURS) * 3_600_000_000).astype("timedelta64[us]")


def derive_weight(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Worldpop-shaped weight raster value at (lon, lat): integer-valued double."""
    wx = np.floor((lon - WLON0) / WCELL).astype(np.int64)
    wy = np.floor((lat - WLAT0) / WCELL).astype(np.int64)
    return ((wx * 31 + wy * 17 + 7) % 101).astype(np.float64)


def assign_admin2_arith(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Closed-form admin-2 assignment (oracle arithmetic; -1 = outside).

    The engine never uses this in pipelines — it runs real WKB
    point-in-polygon (geom.py) — but tests assert both agree on every id.
    """
    fx = (lon - LON0) / CELL
    fy = (lat - LAT0) / CELL
    cx = np.floor(fx)
    cy = np.floor(fy)
    tri = ((fx - cx) + (fy - cy) > 1.0).astype(np.int64)
    idx = (cy.astype(np.int64) * NX + cx.astype(np.int64)) * 2 + tri
    inside = (lon >= LON0) & (lon < LON0 + LON_SPAN) & (lat >= LAT0) & (lat < LAT0 + LAT_SPAN)
    return np.where(inside, idx, -1)


def admin2_centroids() -> tuple[np.ndarray, np.ndarray]:
    """Vertex-mean centroids of every admin-2 triangle (index = admin2 idx).

    Numerators are exact dyadic sums, so the single /3 rounding matches the
    SQL formula ``(2*x0 + x1)/3`` bit-exactly.
    """
    idx = np.arange(N_ADMIN2, dtype=np.int64)
    tri = idx % 2
    cell = idx // 2
    cx = (cell % NX).astype(np.float64)
    cy = (cell // NX).astype(np.float64)
    x0 = LON0 + cx * CELL
    y0 = LAT0 + cy * CELL
    x1 = x0 + CELL
    y1 = y0 + CELL
    # lower triangle ring: (x0,y0),(x1,y0),(x0,y1); upper: (x1,y0),(x1,y1),(x0,y1)
    gx = np.where(tri == 0, (2.0 * x0 + x1) / 3.0, (2.0 * x1 + x0) / 3.0)
    gy = np.where(tri == 0, (2.0 * y0 + y1) / 3.0, (2.0 * y1 + y0) / 3.0)
    return gx, gy


def assign_knn_arith(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Nearest admin-2 centroid (Euclidean deg²), tie-broken by lowest idx."""
    gx, gy = admin2_centroids()
    d2 = (lon[:, None] - gx[None, :]) ** 2 + (lat[:, None] - gy[None, :]) ** 2
    return np.argmin(d2, axis=1).astype(np.int64)


def admin2_name(idx: np.ndarray | int):
    if np.isscalar(idx):
        return f"ADM2-{idx:04d}"
    return np.char.mod("ADM2-%04d", np.asarray(idx, dtype=np.int64))


def admin1_of(idx2: np.ndarray) -> np.ndarray:
    """admin-2 index -> admin-1 index (4x4 cell blocks)."""
    cell = np.asarray(idx2, dtype=np.int64) // 2
    cx, cy = cell % NX, cell // NX
    return (cy // ADM1_BLOCK) * NX1 + (cx // ADM1_BLOCK)


def derive_n_spans(ids: np.ndarray) -> np.ndarray:
    return 1 + (np.asarray(ids, dtype=np.int64) % 3)


# ------------------------------------------------------------------ SQL side
# Each snippet takes the id column expression and mirrors the numpy ops 1:1.
def sql_h(id_expr: str, mul: int, add: int, mod: int) -> str:
    return f"(({id_expr}) * {mul} + {add}) % {mod}"


def sql_lon(id_expr: str) -> str:
    h1 = sql_h(id_expr, H1_MUL, H1_ADD, H1_MOD)
    return (
        f"(CASE WHEN ({id_expr}) % {OUT_MOD} = 0"
        f" THEN 100.0 + (2*({h1})+1) * (1.0/262144.0)"
        f" WHEN ({id_expr}) % {CITY_MOD} < {CITY_LT}"
        f" THEN 105.0 + (2*({h1})+1) * (0.25/262144.0)"
        f" ELSE 102.0 + (2*({h1})+1) * (8.0/262144.0) END)"
    )


def sql_lat(id_expr: str) -> str:
    h2 = sql_h(id_expr, H2_MUL, H2_ADD, H2_MOD)
    return (
        f"(CASE WHEN ({id_expr}) % {OUT_MOD} = 0"
        f" THEN 6.0 + (2*({h2})+1) * (1.0/65536.0)"
        f" WHEN ({id_expr}) % {CITY_MOD} < {CITY_LT}"
        f" THEN 10.0 + (2*({h2})+1) * (0.25/65536.0)"
        f" ELSE 8.0 + (2*({h2})+1) * (16.0/65536.0) END)"
    )


def sql_value(id_expr: str) -> str:
    return f"CAST({sql_h(id_expr, H3_MUL, H3_ADD, H3_MOD)} AS DOUBLE)"


def sql_event_time(id_expr: str) -> str:
    return f"({T0_SQL} + INTERVAL 1 HOUR * (({id_expr}) % {N_HOURS}))"


def sql_weight(lon_expr: str, lat_expr: str) -> str:
    wx = f"CAST(floor(({lon_expr} - {WLON0}) / {WCELL}) AS BIGINT)"
    wy = f"CAST(floor(({lat_expr} - {WLAT0}) / {WCELL}) AS BIGINT)"
    return f"CAST((({wx}) * 31 + ({wy}) * 17 + 7) % 101 AS DOUBLE)"


def sql_admin2_inside(lon_expr: str, lat_expr: str) -> str:
    """Admin-2 index for a point known to be inside the bbox."""
    fx = f"(({lon_expr}) - {LON0}) / {CELL}"
    fy = f"(({lat_expr}) - {LAT0}) / {CELL}"
    cx = f"CAST(floor({fx}) AS BIGINT)"
    cy = f"CAST(floor({fy}) AS BIGINT)"
    tri = f"(CASE WHEN (({fx}) - floor({fx})) + (({fy}) - floor({fy})) > 1.0 THEN 1 ELSE 0 END)"
    return f"((({cy}) * {NX} + ({cx})) * 2 + {tri})"


# CTE producing every admin-2 triangle's index and centroid, for kNN oracles.
SQL_CENTROIDS = f"""
SELECT i.range AS a2,
       CASE WHEN i.range % 2 = 0
            THEN (2*(102.0 + ((i.range//2) % {NX}) * {CELL}) + (102.0 + ((i.range//2) % {NX}) * {CELL} + {CELL})) / 3.0
            ELSE (2*(102.0 + ((i.range//2) % {NX}) * {CELL} + {CELL}) + (102.0 + ((i.range//2) % {NX}) * {CELL})) / 3.0 END AS gx,
       CASE WHEN i.range % 2 = 0
            THEN (2*(8.0 + ((i.range//2) // {NX}) * {CELL}) + (8.0 + ((i.range//2) // {NX}) * {CELL} + {CELL})) / 3.0
            ELSE (2*(8.0 + ((i.range//2) // {NX}) * {CELL} + {CELL}) + (8.0 + ((i.range//2) // {NX}) * {CELL})) / 3.0 END AS gy
FROM range({N_ADMIN2}) i
"""


def sql_admin2_name(idx_expr: str) -> str:
    return f"printf('ADM2-%04d', CAST({idx_expr} AS BIGINT))"


def sql_admin1_name(idx2_expr: str) -> str:
    cell = f"(CAST({idx2_expr} AS BIGINT) // 2)"
    return (
        f"printf('ADM1-%02d', (({cell} // {NX}) // {ADM1_BLOCK}) * {NX1}"
        f" + (({cell} % {NX}) // {ADM1_BLOCK}))"
    )


def sql_corpus_cte(id_col: str = "doc_id", table: str = "documents") -> str:
    """CTE deriving the observation columns of the interleaved corpus."""
    return f"""
SELECT {id_col} AS id,
       {sql_lon(id_col)} AS lon,
       {sql_lat(id_col)} AS lat,
       {sql_value(id_col)} AS value,
       {sql_event_time(id_col)} AS event_time,
       ({id_col}) % {OUT_MOD} = 0 AS is_outside
FROM {table}
"""
