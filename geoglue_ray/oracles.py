"""DuckDB oracle SQL builders for the driver's correctness gate.

Each function returns ANSI SQL (DuckDB dialect) over the pre-registered
testdata views that reproduces the matching Ray pipeline bit-exactly — see
:mod:`geoglue_ray.fixtures` for why the arithmetic matches to the last
float bit.  Column names are chosen to match the Ray outputs exactly (the
driver sorts columns by name before hashing).
"""

from __future__ import annotations

from geoglue_ray import fixtures as fx

# corpus + admin assignment (PIP arithmetic inside bbox, kNN centroid outside)
def _assigned_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""
WITH c AS ({fx.sql_corpus_cte(id_col, table)}),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c)
"""


def corpus_derive() -> str:
    return f"""
WITH c AS ({fx.sql_corpus_cte()})
SELECT id AS doc_id, lon, lat, value, event_time,
       1 + (id % 3) AS n_spans
FROM c ORDER BY doc_id
"""


def spatial_join() -> str:
    return f"""{_assigned_cte()}
SELECT id AS doc_id,
       {fx.sql_admin2_name('a2')} AS admin_id,
       {fx.sql_admin1_name('a2')} AS admin1_id,
       is_outside AS via_knn
FROM asg ORDER BY doc_id
"""


def knn_outside() -> str:
    return f"""{_assigned_cte()}
SELECT id AS doc_id, {fx.sql_admin2_name('a2')} AS admin_id
FROM asg WHERE is_outside ORDER BY doc_id
"""


def zonal_stats() -> str:
    w = fx.sql_weight("lon", "lat")
    return f"""{_assigned_cte()}
SELECT {fx.sql_admin2_name('a2')} AS admin_id,
       sum(value) / count(*) AS "mean",
       sum(value) AS "sum",
       CAST(count(*) AS DOUBLE) AS "count",
       sum(({w}) * value) / sum({w}) AS weighted_mean,
       sum(({w}) * value) AS weighted_sum,
       sum(({w}) * value) / count(*) AS area_weighted_sum
FROM asg GROUP BY 1 ORDER BY 1
"""


def zonal_stats_admin1() -> str:
    return f"""{_assigned_cte()}
SELECT {fx.sql_admin1_name('a2')} AS admin1_id,
       sum(value) AS "sum",
       CAST(count(*) AS DOUBLE) AS "count",
       min(value) AS "min",
       max(value) AS "max"
FROM asg GROUP BY 1 ORDER BY 1
"""


def daily_admin1() -> str:
    return f"""{_assigned_cte()}
SELECT {fx.sql_admin1_name('a2')} AS admin1_id,
       date_trunc('day', event_time)::TIMESTAMP AS day,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(value) AS "sum"
FROM asg GROUP BY 1, 2 ORDER BY 1, 2
"""


def weekly_events() -> str:
    return """
SELECT event_type,
       date_trunc('week', ts)::TIMESTAMP AS week,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(floor(value)) AS "sum"
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def timeshift_local_daily() -> str:
    return f"""
WITH c AS ({fx.sql_corpus_cte()}),
s AS (
  SELECT CASE WHEN id % 2 = 0 THEN 'instant' ELSE 'accum' END AS vartype,
         event_time + INTERVAL 1 HOUR * (CASE WHEN id % 2 = 0 THEN 7 ELSE 6 END) AS local_time,
         value
  FROM c)
SELECT vartype, date_trunc('day', local_time)::TIMESTAMP AS local_day,
       CAST(count(*) AS DOUBLE) AS "count", sum(value) AS "sum"
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def hourly_check() -> str:
    return f"""
WITH c AS ({fx.sql_corpus_cte()})
SELECT date_trunc('day', event_time)::TIMESTAMP AS day,
       CAST(count(DISTINCT extract(hour FROM event_time)) AS DOUBLE) AS n_hours
FROM c GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------ raster oracles
def _raster_cells_cte() -> str:
    """Distinct raster cells with admin assignment (PIP arithmetic inside the
    admin bbox; kNN centroid outside — col 32 sits east of the bbox)."""
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE

    return f"""
cells AS (
  SELECT r.range AS r, c.range AS c,
         {RXFIRST} + c.range*{RINC} AS lon,
         {RYFIRST} - r.range*{RINC} AS lat
  FROM range({RYSIZE}) r, range({RXSIZE}) c),
cen AS ({fx.SQL_CENTROIDS}),
cass AS (
  SELECT cells.r, cells.c,
         CASE WHEN cells.lon >= {fx.LON0} AND cells.lon < {fx.LON0 + fx.LON_SPAN}
                   AND cells.lat >= {fx.LAT0} AND cells.lat < {fx.LAT0 + fx.LAT_SPAN}
              THEN {fx.sql_admin2_inside('cells.lon', 'cells.lat')}
              ELSE (SELECT cen.a2 FROM cen
                    ORDER BY (cells.lon-cen.gx)*(cells.lon-cen.gx) + (cells.lat-cen.gy)*(cells.lat-cen.gy), cen.a2
                    LIMIT 1) END AS a2
  FROM cells)
"""


def raster_daily() -> str:
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT variable,
       CAST(r AS INTEGER) AS cell_row, CAST(c AS INTEGER) AS cell_col,
       date_trunc('day', valid_time)::TIMESTAMP AS day,
       CASE WHEN vartype = 'accum' THEN sum(value)
            ELSE sum(value) / count(value) END AS stat
FROM rast WHERE value IS NOT NULL
GROUP BY 1, 2, 3, 4, vartype ORDER BY 1, 2, 3, 4
"""


def raster_zonal() -> str:
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
{_raster_cells_cte()}
SELECT {fx.sql_admin2_name('cass.a2')} AS admin_id, rast.variable,
       CAST(count(rast.value) AS DOUBLE) AS "count",
       sum(rast.value) AS "sum",
       sum(rast.value) / count(rast.value) AS "mean"
FROM rast JOIN cass ON rast.r = cass.r AND rast.c = cass.c
WHERE rast.value IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_zonal_majority() -> str:
    """Categorical zonal twin: hour-0 t2m classes joined to the cell
    assignment CTE, per-(admin, class) counts, the same (count, value)
    row_number total orders as majority_admin1."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
{_raster_cells_cte()},
h AS (
  SELECT {fx.sql_admin2_name('cass.a2')} AS admin_id,
         CAST(rast.value AS BIGINT) // 16 AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM rast JOIN cass ON rast.r = cass.r AND rast.c = cass.c
  WHERE rast.t = 0 AND rast.variable = 't2m' AND rast.value IS NOT NULL
  GROUP BY 1, 2),
r AS (SELECT admin_id, v, c,
             row_number() OVER (PARTITION BY admin_id ORDER BY c DESC, v) AS rj,
             row_number() OVER (PARTITION BY admin_id ORDER BY c ASC, v) AS rn
      FROM h)
SELECT admin_id,
       max(v) FILTER (rj = 1) AS majority_val,
       max(c) FILTER (rj = 1) AS majority_n,
       max(v) FILTER (rn = 1) AS minority_val,
       max(c) FILTER (rn = 1) AS minority_n,
       CAST(count(*) AS BIGINT) AS variety
FROM r GROUP BY 1 ORDER BY 1
"""


def zonal_coverage() -> str:
    """Coverage-fraction zonal stats, closed form: each raster cell's
    overlap with an admin square splits by the diagonal via the clamped-
    corner formula A = T(1-u0-v0) - T(1-u1-v0) - T(1-u0-v1) + T(1-u1-v1),
    T(t) = max(t,0)^2/2 in unit-square coords — exact dyadic arithmetic,
    bit-identical to the engine's Sutherland–Hodgman rectangle clip."""
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE, sql_raster_cte

    x_edge0 = RXFIRST - RINC / 2
    y_edge1 = RYFIRST + RINC / 2

    def g(t: str) -> str:
        return f"(CASE WHEN ({t}) > 0 THEN ({t})*({t})/2.0 ELSE 0.0 END)"

    u0, u1 = "((ox0-qx0)*2)", "((ox1-qx0)*2)"
    v0, v1 = "((oy0-qy0)*2)", "((oy1-qy0)*2)"
    lower_unit = (
        f"{g(f'1-{u0}-{v0}')} - {g(f'1-{u1}-{v0}')}"
        f" - {g(f'1-{u0}-{v1}')} + {g(f'1-{u1}-{v1}')}"
    )
    w = fx.sql_weight("rast.lon", "rast.lat")
    v = "COALESCE(rast.value, 0)"  # default_value=0
    return f"""
WITH rast AS ({sql_raster_cte()}),
rcells AS (
  SELECT r.range AS r, c.range AS c,
         {x_edge0} + c.range*{RINC} AS x0, {x_edge0 + RINC} + c.range*{RINC} AS x1,
         {y_edge1 - RINC} - r.range*{RINC} AS y0, {y_edge1} - r.range*{RINC} AS y1
  FROM range({RYSIZE}) r, range({RXSIZE}) c),
squares AS (
  SELECT sx.range AS sx, sy.range AS sy,
         {fx.LON0} + sx.range*{fx.CELL} AS qx0, {fx.LAT0} + sy.range*{fx.CELL} AS qy0
  FROM range({fx.NX}) sx, range({fx.NY}) sy),
ov AS (
  SELECT rc.r, rc.c, sq.sx, sq.sy, sq.qx0, sq.qy0,
         GREATEST(rc.x0, sq.qx0) AS ox0, LEAST(rc.x1, sq.qx0+{fx.CELL}) AS ox1,
         GREATEST(rc.y0, sq.qy0) AS oy0, LEAST(rc.y1, sq.qy0+{fx.CELL}) AS oy1
  FROM rcells rc, squares sq
  WHERE GREATEST(rc.x0, sq.qx0) < LEAST(rc.x1, sq.qx0+{fx.CELL})
    AND GREATEST(rc.y0, sq.qy0) < LEAST(rc.y1, sq.qy0+{fx.CELL})),
parts AS (
  SELECT r, c, (sy*{fx.NX}+sx)*2 AS a2lo,
         (ox1-ox0)*(oy1-oy0) AS rect_area,
         {fx.CELL * fx.CELL} * ({lower_unit}) AS lower_area
  FROM ov),
cov AS (
  SELECT r, c, a2lo AS a2, lower_area/{RINC * RINC} AS cov
  FROM parts WHERE lower_area > 0
  UNION ALL
  SELECT r, c, a2lo+1 AS a2, (rect_area-lower_area)/{RINC * RINC} AS cov
  FROM parts WHERE rect_area - lower_area > 0)
SELECT {fx.sql_admin2_name('cov.a2')} AS admin_id, rast.variable,
       sum(cov.cov) AS "count",
       sum(cov.cov * {v}) AS "sum",
       sum(cov.cov * {v}) / sum(cov.cov) AS "mean",
       sum(cov.cov * {w} * {v}) AS weighted_sum,
       sum(cov.cov * {w} * {v}) / sum(cov.cov * {w}) AS weighted_mean,
       sum(cov.cov * {w} * {v}) / sum(cov.cov) AS area_weighted_sum
FROM rast JOIN cov ON rast.r = cov.r AND rast.c = cov.c
GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_weekly_zonal() -> str:
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
{_raster_cells_cte()}
SELECT {fx.sql_admin2_name('cass.a2')} AS admin_id, rast.variable,
       date_trunc('week', rast.valid_time)::TIMESTAMP AS week,
       CASE WHEN rast.vartype = 'accum'
            THEN sum(rast.value) / (count(rast.value) / 24.0)
            ELSE sum(rast.value) / count(rast.value) END AS stat
FROM rast JOIN cass ON rast.r = cass.r AND rast.c = cass.c
WHERE rast.value IS NOT NULL
GROUP BY 1, 2, 3, rast.vartype ORDER BY 1, 2, 3
"""


def weekly_variation() -> str:
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
{_raster_cells_cte()},
weekly AS (
  SELECT {fx.sql_admin2_name('cass.a2')} AS admin_id, rast.variable,
         date_trunc('week', rast.valid_time)::TIMESTAMP AS week,
         CASE WHEN rast.vartype = 'accum'
              THEN sum(rast.value) / (count(rast.value) / 24.0)
              ELSE sum(rast.value) / count(rast.value) END AS stat
  FROM rast JOIN cass ON rast.r = cass.r AND rast.c = cass.c
  WHERE rast.value IS NOT NULL
  GROUP BY 1, 2, 3, rast.vartype)
SELECT variable, week,
       CAST(count(*) AS DOUBLE) AS n_regions,
       min(stat) AS stat_min, max(stat) AS stat_max
FROM weekly GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_stats() -> str:
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT variable,
       CAST(count(value) AS DOUBLE) AS "count",
       sum(value) / count(value) AS "mean",
       min(value) AS "min", max(value) AS "max"
FROM rast WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def events_asof_obs() -> str:
    return f"""
WITH c AS ({fx.sql_corpus_cte()}),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c),
obs AS (
  SELECT a2, event_time, sum(value) AS obs_value FROM asg GROUP BY 1, 2),
ev AS (
  SELECT e.event_id,
         {fx.sql_lon('e.event_id')} AS lon,
         {fx.sql_lat('e.event_id')} AS lat,
         e.event_id % {fx.OUT_MOD} = 0 AS is_outside,
         {fx.T0_SQL} + INTERVAL 1 HOUR * (e.event_id % 1440) AS ts_aligned
  FROM events e),
eva AS (
  SELECT ev.event_id, ev.ts_aligned,
         CASE WHEN ev.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (ev.lon-cen.gx)*(ev.lon-cen.gx) + (ev.lat-cen.gy)*(ev.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('ev.lon', 'ev.lat')} END AS a2
  FROM ev)
SELECT eva.event_id,
       {fx.sql_admin2_name('eva.a2')} AS admin_id,
       eva.ts_aligned,
       obs.event_time AS matched_time,
       obs.obs_value
FROM eva ASOF JOIN obs
  ON eva.a2 = obs.a2 AND eva.ts_aligned >= obs.event_time
ORDER BY eva.event_id
"""


def value_bands() -> str:
    from geoglue_ray.pipelines.queries import N_BANDS

    return f"""
WITH c AS ({fx.sql_corpus_cte()}),
bands AS (
  SELECT k.range AS band_id,
         printf('band-%02d', k.range) AS band_name,
         CAST(k.range * k.range * 256 AS DOUBLE) AS lo,
         CAST((k.range+1) * (k.range+1) * 256 AS DOUBLE) AS hi
  FROM range({N_BANDS}) k)
SELECT c.id AS doc_id, c.value, b.band_id, b.band_name
FROM c JOIN bands b ON c.value >= b.lo AND c.value < b.hi
ORDER BY doc_id
"""


def rolling_daily_admin() -> str:
    return f"""{_assigned_cte()}
, daily AS (
  SELECT a2, date_trunc('day', event_time)::TIMESTAMP AS day,
         sum(value) AS day_sum
  FROM asg GROUP BY 1, 2)
SELECT {fx.sql_admin2_name('a2')} AS admin_id, day, day_sum,
       sum(day_sum) OVER (PARTITION BY a2 ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_sum,
       CAST(count(*) OVER (PARTITION BY a2 ORDER BY day
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_n
FROM daily ORDER BY 1, 2
"""


def topk_by_admin1() -> str:
    return f"""{_assigned_cte()}
SELECT {fx.sql_admin1_name('a2')} AS admin1_id, id AS doc_id, value,
       row_number() OVER (
         PARTITION BY {fx.sql_admin1_name('a2')}
         ORDER BY value DESC, id
       ) AS rank
FROM asg QUALIFY rank <= 10 ORDER BY admin1_id, rank
"""


def distinct_sources() -> str:
    return """
SELECT lang, CAST(count(DISTINCT source) AS DOUBLE) AS n_sources
FROM documents GROUP BY 1 ORDER BY 1
"""


def events_sessionize() -> str:
    return """
WITH e AS (SELECT user_id, ts, floor(value) AS v FROM events),
s AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT user_id, min(ts) AS session_start,
       CAST(count(*) AS DOUBLE) AS n_events, sum(v) AS sum_val
FROM g GROUP BY user_id, sid ORDER BY 1, 2
"""


# ------------------------------------------------------- relational oracles
def q1_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(floor(l_quantity)) AS sum_qty,
       CAST(count(*) AS DOUBLE) AS n_rows,
       sum(floor(l_extendedprice)) AS sum_price
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def segment_revenue() -> str:
    return """
SELECT c.c_mktsegment,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(floor(o.o_totalprice)) AS "sum",
       min(floor(o.o_totalprice)) AS "min",
       max(floor(o.o_totalprice)) AS "max"
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------ crop / resample
def crop_bbox() -> str:
    from geoglue_ray.pipelines.queries import CROP_BBOX

    minx, miny, maxx, maxy = CROP_BBOX
    return f"""
WITH c AS ({fx.sql_corpus_cte()})
SELECT id AS doc_id, lon, lat, value FROM c
WHERE lon >= {minx} AND lon < {maxx} AND lat >= {miny} AND lat < {maxy}
ORDER BY doc_id
"""


def _era5_targets() -> str:
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE

    return f"""
targets AS (
  SELECT r.range AS tr, c.range AS tc,
         {RXFIRST} + c.range*{RINC} AS x,
         {RYFIRST} - r.range*{RINC} AS y
  FROM range({RYSIZE}) r, range({RXSIZE}) c)
"""


def _wval(i: str, j: str) -> str:
    """Weights value at (col i, north-row j) of the 0.125-deg grid."""
    return f"CAST((({i})*31 + (255 - ({j}))*17 + 7) % 101 AS DOUBLE)"


def resample_nearest() -> str:
    return f"""
WITH {_era5_targets()},
g AS (
  SELECT tr, tc,
         CAST(floor((x - 96.0625)/0.125 + 0.5) AS BIGINT) AS i,
         CAST(floor((31.9375 - y)/0.125 + 0.5) AS BIGINT) AS j
  FROM targets)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       {_wval('i', 'j')} AS resampled
FROM g ORDER BY 1, 2
"""


def resample_bilinear() -> str:
    return f"""
WITH {_era5_targets()},
g AS (
  SELECT tr, tc,
         (x - 96.0625)/0.125 AS gx,
         (31.9375 - y)/0.125 AS gy
  FROM targets),
h AS (
  SELECT tr, tc, gx, gy,
         CAST(floor(gx) AS BIGINT) AS i0, CAST(floor(gy) AS BIGINT) AS j0,
         gx - floor(gx) AS fxx, gy - floor(gy) AS fy
  FROM g)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       (1.0-fxx)*(1.0-fy)*{_wval('i0', 'j0')}
       + fxx*(1.0-fy)*{_wval('i0+1', 'j0')}
       + (1.0-fxx)*fy*{_wval('i0', 'j0+1')}
       + fxx*fy*{_wval('i0+1', 'j0+1')} AS resampled
FROM h ORDER BY 1, 2
"""


def resample_idw() -> str:
    """remapdis twin: 4-corner inverse-distance mean.  Mirrors
    stages/resample.inverse_distance op-for-op — d = sqrt(dx*dx + dy*dy)
    (the engine avoids np.hypot for exactly this reason), w = 1/d, the
    accumulation order (0,0),(0,1),(1,0),(1,1), and the exact-hit
    (d == 0 -> source value) branch.  The weights grid has no NaN so the
    skip-NaN-corner weight-zeroing is vacuous on this fixture."""
    dist = {
        "d00": ("(gx - i0)", "(gy - j0)"),
        "d01": ("(gx - (i0+1))", "(gy - j0)"),
        "d10": ("(gx - i0)", "(gy - (j0+1))"),
        "d11": ("(gx - (i0+1))", "(gy - (j0+1))"),
    }
    dsel = ",\n         ".join(
        f"sqrt(({dx}*0.125)*({dx}*0.125) + ({dy}*0.125)*({dy}*0.125)) AS {k}"
        for k, (dx, dy) in dist.items()
    )
    wsel = ",\n         ".join(
        f"CASE WHEN d{k} > 0 THEN 1.0/d{k} ELSE 0.0 END AS w{k}"
        for k in ("00", "01", "10", "11")
    )
    return f"""
WITH {_era5_targets()},
g AS (
  SELECT tr, tc, (x - 96.0625)/0.125 AS gx, (31.9375 - y)/0.125 AS gy FROM targets),
h AS (
  SELECT tr, tc, gx, gy,
         CAST(floor(gx) AS BIGINT) AS i0, CAST(floor(gy) AS BIGINT) AS j0
  FROM g),
d AS (
  SELECT tr, tc,
         {_wval('i0', 'j0')} AS v00, {_wval('i0+1', 'j0')} AS v01,
         {_wval('i0', 'j0+1')} AS v10, {_wval('i0+1', 'j0+1')} AS v11,
         {dsel}
  FROM h),
w AS (
  SELECT tr, tc, v00, v01, v10, v11, d00, d01, d10, d11,
         {wsel}
  FROM d)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       CASE WHEN d00 = 0 THEN v00 WHEN d01 = 0 THEN v01
            WHEN d10 = 0 THEN v10 WHEN d11 = 0 THEN v11
            ELSE (w00*v00 + w01*v01 + w10*v10 + w11*v11)
                 / (w00 + w01 + w10 + w11) END AS resampled
FROM w ORDER BY 1, 2
"""


def resample_kriging() -> str:
    """remapok twin: ordinary kriging on the 3 nearest corners, linear
    variogram.  Mirrors stages/resample.kriging3 op-for-op — the corner
    distances reuse the idw chain; the drop-farthest CASE checks
    (11, 10, 01) in order (first match == numpy's where-chain with
    last-index tie preference); select-then-compute equals the engine's
    compute-then-select bitwise because exactly one branch is taken;
    den/u/t/mu/weights are the same left-associated chains."""
    HD = "sqrt(0.125*0.125)"
    VD = "sqrt(0.125*0.125)"
    DG = "sqrt(0.125*0.125 + 0.125*0.125)"
    dist = {
        "d00": ("(gx - i0)", "(gy - j0)"),
        "d01": ("(gx - (i0+1))", "(gy - j0)"),
        "d10": ("(gx - i0)", "(gy - (j0+1))"),
        "d11": ("(gx - (i0+1))", "(gy - (j0+1))"),
    }
    dsel = ",\n         ".join(
        f"sqrt(({dx}*0.125)*({dx}*0.125) + ({dy}*0.125)*({dy}*0.125)) AS {k}"
        for k, (dx, dy) in dist.items()
    )

    def pick(c11: str, c10: str, c01: str, c00: str) -> str:
        return (
            "CASE WHEN d11 >= d10 AND d11 >= d01 AND d11 >= d00 "
            f"THEN {c11} "
            f"WHEN d10 >= d01 AND d10 >= d00 THEN {c10} "
            f"WHEN d01 >= d00 THEN {c01} ELSE {c00} END"
        )

    sels = ",\n         ".join(
        f"{pick(*cases)} AS {name}"
        for name, cases in (
            ("a", (HD, HD, VD, DG)),
            ("b", (VD, DG, DG, VD)),
            ("c", (DG, VD, HD, HD)),
            ("g1", ("d00", "d00", "d00", "d01")),
            ("g2", ("d01", "d01", "d10", "d10")),
            ("g3", ("d10", "d11", "d11", "d11")),
            ("v1", ("v00", "v00", "v00", "v01")),
            ("v2", ("v01", "v01", "v10", "v10")),
            ("v3", ("v10", "v11", "v11", "v11")),
        )
    )
    return f"""
WITH {_era5_targets()},
g AS (
  SELECT tr, tc, (x - 96.0625)/0.125 AS gx, (31.9375 - y)/0.125 AS gy FROM targets),
h AS (
  SELECT tr, tc, gx, gy,
         CAST(floor(gx) AS BIGINT) AS i0, CAST(floor(gy) AS BIGINT) AS j0
  FROM g),
d AS (
  SELECT tr, tc,
         {_wval('i0', 'j0')} AS v00, {_wval('i0+1', 'j0')} AS v01,
         {_wval('i0', 'j0+1')} AS v10, {_wval('i0+1', 'j0+1')} AS v11,
         {dsel}
  FROM h),
s AS (
  SELECT tr, tc, d00, d01, d10, d11, v00, v01, v10, v11,
         {sels}
  FROM d),
u AS (
  SELECT *, (((2.0*a)*b)*c) AS den FROM s),
uu AS (
  SELECT *,
         ((-(c*c))*g1 + (b*c)*g2 + (a*c)*g3) / den AS u1,
         ((b*c)*g1 + (-(b*b))*g2 + (a*b)*g3) / den AS u2,
         ((a*c)*g1 + (a*b)*g2 + (-(a*a))*g3) / den AS u3,
         ((-(c*c)) + (b*c) + (a*c)) / den AS t1,
         ((b*c) + (-(b*b)) + (a*b)) / den AS t2,
         ((a*c) + (a*b) + (-(a*a))) / den AS t3
  FROM u),
mm AS (
  SELECT *, ((u1 + u2 + u3) - 1.0) / (t1 + t2 + t3) AS mu FROM uu)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       CASE WHEN d00 = 0 THEN v00 WHEN d01 = 0 THEN v01
            WHEN d10 = 0 THEN v10 WHEN d11 = 0 THEN v11
            ELSE (u1 - mu*t1)*v1 + (u2 - mu*t2)*v2 + (u3 - mu*t3)*v3 END
         AS resampled
FROM mm ORDER BY 1, 2
"""


def _rval(i: str, j: str) -> str:
    """ERA5 t2m hour-0 value at (col i, north-row j); NULL on ocean holes."""
    from geoglue_ray.sources.raster import HOLE_MOD, RXSIZE, VAL_MOD

    return (
        f"(CASE WHEN (({j})*{RXSIZE} + ({i})) % {HOLE_MOD} = 0 THEN NULL "
        f"ELSE CAST((({j})*7 + ({i})*13) % {VAL_MOD} AS DOUBLE) END)"
    )


def resample_sparse() -> str:
    fill = {k: f"COALESCE({_rval(*ij)}, 0.0)" for k, ij in
            {"f00": ("i0", "j0"), "f01": ("i0+1", "j0"),
             "f10": ("i0", "j0+1"), "f11": ("i0+1", "j0+1")}.items()}
    mask = {k: f"(CASE WHEN {_rval(*ij)} IS NULL THEN 0.0 ELSE 1.0 END)" for k, ij in
            {"m00": ("i0", "j0"), "m01": ("i0+1", "j0"),
             "m10": ("i0", "j0+1"), "m11": ("i0+1", "j0+1")}.items()}
    bil_f = (f"(1.0-fxx)*(1.0-fy)*{fill['f00']} + fxx*(1.0-fy)*{fill['f01']}"
             f" + (1.0-fxx)*fy*{fill['f10']} + fxx*fy*{fill['f11']}")
    bil_m = (f"(1.0-fxx)*(1.0-fy)*{mask['m00']} + fxx*(1.0-fy)*{mask['m01']}"
             f" + (1.0-fxx)*fy*{mask['m10']} + fxx*fy*{mask['m11']}")
    return f"""
WITH targets AS (
  SELECT r.range AS tr, c.range AS tc,
         102.25 + c.range*0.125 AS x,
         21.4375 - r.range*0.125 AS y
  FROM range(100) r, range(60) c),
g AS (
  SELECT tr, tc, (x - 102.125)/0.25 AS gx, (23.9375 - y)/0.25 AS gy FROM targets),
h AS (
  SELECT tr, tc,
         CAST(floor(gx) AS BIGINT) AS i0, CAST(floor(gy) AS BIGINT) AS j0,
         gx - floor(gx) AS fxx, gy - floor(gy) AS fy
  FROM g),
bl AS (
  SELECT tr, tc, {bil_f} AS fillr, {bil_m} AS maskr FROM h)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       CASE WHEN maskr > 0.000001 THEN fillr / maskr ELSE NULL END AS resampled
FROM bl ORDER BY 1, 2
"""


def resample_conservative() -> str:
    """remapcon twin: per-axis integer overlap lengths on the 1/256-deg
    lattice (GREATEST/LEAST interval intersection), integer SUM numerator
    (order-free), one division by the target cell area — mirrors
    stages/resample.ConservativeRegridder op-for-op.  The source value at
    (col i, south-row wy) is the closed-form weights field (_wval with
    wy = 255 - j)."""
    from geoglue_ray.stages.resample import (
        CON_N,
        CON_SRC_U,
        CON_TINC_U,
        CON_X0_U,
        CON_YTOP_U,
    )

    area = CON_TINC_U * CON_TINC_U
    return f"""
WITH tgt AS (
  SELECT r.range AS tr, c.range AS tc,
         {CON_X0_U} + {CON_TINC_U}*c.range AS tx0,
         {CON_YTOP_U} - {CON_TINC_U}*(r.range+1) AS ty0
  FROM range({CON_N}) r, range({CON_N}) c),
cand AS (
  SELECT tr, tc, tx0, ty0,
         tx0//{CON_SRC_U} + b.range AS i,
         ty0//{CON_SRC_U} + a.range AS wy
  FROM tgt, range(3) a, range(3) b),
ov AS (
  SELECT tr, tc, i, wy,
         GREATEST(0, LEAST(tx0+{CON_TINC_U}, {CON_SRC_U}*(i+1))
                  - GREATEST(tx0, {CON_SRC_U}*i)) AS ox,
         GREATEST(0, LEAST(ty0+{CON_TINC_U}, {CON_SRC_U}*(wy+1))
                  - GREATEST(ty0, {CON_SRC_U}*wy)) AS oy
  FROM cand)
SELECT CAST(tr AS INTEGER) AS cell_row, CAST(tc AS INTEGER) AS cell_col,
       CAST(SUM(((i*31 + wy*17 + 7) % 101) * ox * oy) AS DOUBLE) / {area}.0
         AS resampled
FROM ov WHERE ox > 0 AND oy > 0
GROUP BY tr, tc ORDER BY 1, 2
"""


def events_extract() -> str:
    """Point-extraction twin: sparse bilinear of the ERA5 t2m hour-0
    field at each event's derived (lon, lat) — the resample_sparse
    fill/mask chain with the engine's interior mask spelled as integer
    bounds (i0 in [0, 31], j0 in [0, 62]); event coordinates are dyadic
    odd-numerator so gx/gy are never integral and every weight is
    exact."""
    fill = {k: f"COALESCE({_rval(*ij)}, 0.0)" for k, ij in
            {"f00": ("i0", "j0"), "f01": ("i0+1", "j0"),
             "f10": ("i0", "j0+1"), "f11": ("i0+1", "j0+1")}.items()}
    mask = {k: f"(CASE WHEN {_rval(*ij)} IS NULL THEN 0.0 ELSE 1.0 END)" for k, ij in
            {"m00": ("i0", "j0"), "m01": ("i0+1", "j0"),
             "m10": ("i0", "j0+1"), "m11": ("i0+1", "j0+1")}.items()}
    bil_f = (f"(1.0-fxx)*(1.0-fy)*{fill['f00']} + fxx*(1.0-fy)*{fill['f01']}"
             f" + (1.0-fxx)*fy*{fill['f10']} + fxx*fy*{fill['f11']}")
    bil_m = (f"(1.0-fxx)*(1.0-fy)*{mask['m00']} + fxx*(1.0-fy)*{mask['m01']}"
             f" + (1.0-fxx)*fy*{mask['m10']} + fxx*fy*{mask['m11']}")
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
g AS (
  SELECT event_id, (lon - 102.125)/0.25 AS gx, (23.9375 - lat)/0.25 AS gy
  FROM e),
h AS (
  SELECT event_id,
         CAST(floor(gx) AS BIGINT) AS i0, CAST(floor(gy) AS BIGINT) AS j0,
         gx - floor(gx) AS fxx, gy - floor(gy) AS fy
  FROM g),
bl AS (SELECT event_id, i0, j0, {bil_f} AS fillr, {bil_m} AS maskr FROM h)
SELECT event_id,
       CASE WHEN i0 BETWEEN 0 AND 31 AND j0 BETWEEN 0 AND 62
                 AND maskr > 0.000001
            THEN fillr / maskr ELSE NULL END AS resampled
FROM bl ORDER BY event_id
"""


# ---------------------------------------------------- training-data oracles
def token_count() -> str:
    return r"""
SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
FROM documents ORDER BY doc_id
"""


def pack_offsets() -> str:
    """Packing twin: exclusive running window sum in doc-id order (cast
    back to BIGINT — DuckDB window sum widens to HUGEINT), integer
    div/mod window arithmetic."""
    return r"""
WITH t AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) - n_tokens AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 256 AS bin,
       start_offset % 256 AS pos_in_bin,
       (start_offset % 256) + n_tokens > 256 AS crosses_boundary
FROM s ORDER BY doc_id
"""


def contamination_ngram() -> str:
    """Contamination twin: 5-grams via list_transform over ranges of the
    token list, the eval set as a DISTINCT unnest, duplicate-instance
    hits by join, the single exact-int division (NULL under 5 tokens)."""
    return r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
n AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
              THEN list_transform(range(1, len(toks) - 3),
                                  i -> array_to_string(array_slice(toks, i, i + 4), ' '))
              ELSE CAST([] AS VARCHAR[]) END AS ngs
  FROM t),
bench AS (
  SELECT DISTINCT unnest(ngs) AS ng FROM n WHERE doc_id % 97 = 0),
inst AS (SELECT doc_id, unnest(ngs) AS ng FROM n),
hits AS (
  SELECT i.doc_id, count(*) AS n_hit
  FROM inst i JOIN bench b ON b.ng = i.ng GROUP BY 1)
SELECT n.doc_id,
       len(n.ngs) AS n_ngrams,
       COALESCE(h.n_hit, 0) AS n_hit,
       CASE WHEN len(n.ngs) > 0
            THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(len(n.ngs) AS DOUBLE)
            ELSE NULL END AS contamination
FROM n LEFT JOIN hits h ON h.doc_id = n.doc_id
ORDER BY n.doc_id
"""


def text_quality() -> str:
    stop = ", ".join(f"'{s}'" for s in ("the", "a", "of", "and", "to"))
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> x IN ({stop}))) AS n_stopwords,
       len(list_filter(toks, x -> x IN ({stop}))) / len(toks) AS stop_ratio,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         AS mean_token_len
FROM t ORDER BY doc_id
"""


def dedup_exact() -> str:
    return """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY text ORDER BY doc_id
"""


def _sql_tokens(text_expr: str) -> str:
    """Whitespace tokens of raw text (mirrors utf8_split_whitespace)."""
    return f"list_filter(string_split({text_expr}, ' '), x -> x <> '')"


def lang_id() -> str:
    from geoglue_ray.stages.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)  # argmax order: first max wins

    def hits(lg: str) -> str:
        vals = ", ".join(f"'{m}'" for m in LANG_MARKERS[lg])
        return f"sum(CASE WHEN t IN ({vals}) THEN 1 ELSE 0 END)"

    score_cols = ", ".join(f"{hits(lg)} AS s_{lg}" for lg in langs)
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{lg} = {m} THEN '{lg}'" for lg in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_tokens('lower(text)')}) AS t FROM documents),
sc AS (
  SELECT doc_id, {score_cols}, count(*) AS n_tok FROM toks GROUP BY doc_id)
SELECT d.doc_id, d.lang, {pred} AS pred_lang,
       CAST({m} AS DOUBLE) / greatest(n_tok, 1) AS lang_score
FROM documents d JOIN sc ON d.doc_id = sc.doc_id
ORDER BY d.doc_id
"""


def doc_fingerprint() -> str:
    """Rolling FNV over token hashes, reproduced in SQL via list_transform
    + list_reduce over HUGEINT (mod-2^64 arithmetic; texthash.py)."""
    from geoglue_ray.functions.texthash import U64, sql_token_hash, sql_u64_to_bigint
    from geoglue_ray.stages.text import _FP_BASE, _FP_SEED

    th_list = f"list_transform({_sql_tokens('text')}, t -> {sql_token_hash('t')})"
    fp = (
        f"list_reduce(list_prepend({int(_FP_SEED)}::HUGEINT, {th_list}), "
        f"(acc, x) -> xor((acc * {int(_FP_BASE)}::HUGEINT) % {U64}::HUGEINT, x))"
    )
    return f"""
SELECT doc_id,
       CASE WHEN length({_sql_tokens('text')}) = 0 THEN 0
            ELSE {sql_u64_to_bigint(fp)} END AS fingerprint
FROM documents ORDER BY doc_id
"""


def _sql_simhash_fp() -> str:
    """CTE text: per-doc 64-bit SimHash fingerprint as HUGEINT in
    [0, 2^64) — per-bit +/-1 sums over token hashes, bit set when the sum
    is positive (mirrors stages/dedup.py SimHasher)."""
    from geoglue_ray.functions.texthash import sql_token_hash

    bit_terms = " + ".join(
        f"CASE WHEN sum(CASE WHEN (h // {1 << b}::HUGEINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )
    return f"""
toks AS (
  SELECT doc_id, unnest({_sql_tokens('text')}) AS t FROM documents),
th AS (SELECT doc_id, {sql_token_hash('t')} AS h FROM toks),
fps AS (SELECT doc_id, ({bit_terms}) AS fp FROM th GROUP BY doc_id)
"""


def simhash_neardup() -> str:
    """All pairs with Hamming(simhash) <= 4 — the engine's banded LSH is
    COMPLETE (pigeonhole), so its pair set equals this full quadratic."""
    from geoglue_ray.functions.texthash import sql_u64_to_bigint

    ham = (
        f"bit_count(xor({sql_u64_to_bigint('a.fp')}, {sql_u64_to_bigint('b.fp')}))"
    )
    return f"""
WITH {_sql_simhash_fp()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST({ham} AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE {ham} <= 4
ORDER BY 1, 2
"""


def ngram_neardup() -> str:
    """Blocked quadratic char-3-gram Jaccard (same (lang, n_chars//64)
    blocking as the engine; jaccard = one exact integer division)."""
    return """
WITH grams AS (
  SELECT DISTINCT doc_id, lang, n_chars // 64 AS block,
         substr(text, i.range::INTEGER, 3) AS g
  FROM documents, range(1, 8192) i
  WHERE i.range <= greatest(length(text) - 2, 1)),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS both
  FROM grams a JOIN grams b
    ON a.g = b.g AND a.lang = b.lang AND a.block = b.block
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both) >= 0.5
ORDER BY 1, 2
"""


def revenue_rollup() -> str:
    """GROUP BY ROLLUP twin — each grouping set sums the same floored
    (hence integer-valued, order-independent) per-row revenue the engine
    collapses per nation; 'ALL' sentinels replace ROLLUP's NULL levels so
    block schemas and sorts stay typed on both sides."""
    return """
WITH rev AS (
  SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
         SUM(floor(l_extendedprice * (1.0 - l_discount))) AS revenue
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY ROLLUP(r_name, n_name))
SELECT r_name, n_name, revenue FROM rev ORDER BY 1, 2
"""


def redact_docs() -> str:
    """RE2 twin of the Arrow redaction kernels: `regexp_extract_all`
    counts the same non-overlapping matches `count_substring_regex`
    counts, and `regexp_replace(..., 'g')` rewrites the same spans."""
    return r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\b(key|part|table)\b')) AS n_masked,
       regexp_replace(text, '\b(key|part|table)\b', '<TERM>', 'g')
         AS text_redacted
FROM documents ORDER BY doc_id
"""


def pagerank_parts() -> str:
    """Unrolled 3-iteration fixed-point PageRank in HUGEINT: the engine's
    int64 chain (rank//deg floor contributions, order-independent integer
    sums, (85*sum)//100 damping, base 15*2^32//100) is mirrored term for
    term; the final CAST narrows to BIGINT exactly (values < 2^63 by the
    engine's asserted overflow bound)."""
    it = """
  SELECT e.dst AS node,
         15 * CAST(4294967296 AS HUGEINT) // 100
         + 85 * SUM({rank} // d.d) // 100 AS rank
  FROM pr_edges e JOIN deg d ON d.src = e.src{join}
  GROUP BY e.dst"""
    return (
        """
WITH pr_edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, count(*) AS d FROM pr_edges GROUP BY src),
r1 AS ("""
        + it.format(rank="CAST(4294967296 AS HUGEINT)", join="")
        + "),\nr2 AS ("
        + it.format(rank="r.rank", join=" JOIN r1 r ON r.node = e.src")
        + "),\nr3 AS ("
        + it.format(rank="r.rank", join=" JOIN r2 r ON r.node = e.src")
        + """)
SELECT node AS part_key, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY 1
"""
    )


def sssp_parts(rounds: int = 4) -> str:
    """Weighted SSSP twin: exact pair counts (count DISTINCT baskets),
    the inverse-strength weight, and ``rounds`` unrolled min/plus
    relaxations — each round AS MATERIALIZED (two references per round:
    the raster_jacobi inlining lesson)."""
    parts = [
        """pairs AS (
  SELECT a.l_partkey AS i1, b.l_partkey AS i2,
         CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS n
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e2 AS MATERIALIZED (
  SELECT i1 AS src, i2 AS dst, 1 + 1000 // n AS w FROM pairs
  UNION ALL
  SELECT i2, i1, 1 + 1000 // n FROM pairs),
d0 AS MATERIALIZED (
  SELECT min(src) AS node, CAST(0 AS BIGINT) AS d FROM e2)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
d{r} AS MATERIALIZED (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM d{r - 1}
    UNION ALL
    SELECT e.dst, p.d + e.w FROM e2 e JOIN d{r - 1} p ON p.node = e.src)
  GROUP BY 1)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT node AS part_key, CAST(d AS BIGINT) AS dist FROM d{rounds} ORDER BY 1
"""
    )


def bfs_parts() -> str:
    """BFS twin: depth-guarded recursive closure with UNION dedup (the
    accumulated (src, node, d) set is bounded by sources x nodes x
    depth, so the CTE never path-explodes), min(d) = hop distance."""
    return """
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
srcs AS (SELECT DISTINCT src FROM e ORDER BY 1 LIMIT 4),
reach(s, node, d) AS (
  SELECT src, src, 0 FROM srcs
  UNION
  SELECT r.s, e.dst, r.d + 1
  FROM reach r JOIN e ON e.src = r.node
  WHERE r.d < 4)
SELECT s AS src_id, node, CAST(min(d) AS BIGINT) AS hops
FROM reach GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_focal_mean() -> str:
    """Focal-mean twin by 3x3 lattice self-join: values are
    integer-valued doubles so the <=9-term sum is order-free exact, and
    the mean is the same single division the engine performs."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT a.valid_time, a.r AS cell_row, a.c AS cell_col,
       count(b.value) AS n_nb,
       sum(b.value) / count(b.value) AS focal_mean
FROM rast a JOIN rast b
  ON b.t = a.t AND b.variable = a.variable
 AND b.r BETWEEN a.r - 1 AND a.r + 1
 AND b.c BETWEEN a.c - 1 AND a.c + 1
 AND b.value IS NOT NULL
WHERE a.variable = 't2m' AND a.t < 48
GROUP BY 1, 2, 3 ORDER BY 2, 3, 1
"""


def raster_gradient() -> str:
    """Gradient twin by four cardinal self-joins: differences, the *2.0
    dyadic scale and the two-term square sum are exact over
    integer-valued doubles; grad2 is built from the SAME grad_x/grad_y
    expressions the engine squares."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
t2 AS (SELECT t, valid_time, r, c, value FROM rast
       WHERE variable = 't2m' AND t < 24 AND value IS NOT NULL),
g AS (
  SELECT a.valid_time, a.r, a.c,
         (e.value - w.value) * 2.0 AS grad_x,
         (n.value - s.value) * 2.0 AS grad_y
  FROM t2 a
  JOIN t2 e ON e.t = a.t AND e.r = a.r AND e.c = a.c + 1
  JOIN t2 w ON w.t = a.t AND w.r = a.r AND w.c = a.c - 1
  JOIN t2 n ON n.t = a.t AND n.r = a.r - 1 AND n.c = a.c
  JOIN t2 s ON s.t = a.t AND s.r = a.r + 1 AND s.c = a.c)
SELECT valid_time, r AS cell_row, c AS cell_col, grad_x, grad_y,
       grad_x*grad_x + grad_y*grad_y AS grad2
FROM g ORDER BY 2, 3, 1
"""


def raster_geary() -> str:
    """Local Geary twin: the neighbour squared-difference sum in pure
    BIGINT (k*x*x - 2*x*ns + nss), per-slice m2 from exact aggregates,
    one division — mirrors stages/stencil.local_geary op-for-op."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
mom AS (
  SELECT t,
         CAST(SUM(x*x) AS DOUBLE) / count(*)
           - (CAST(SUM(x) AS DOUBLE) / count(*))
             * (CAST(SUM(x) AS DOUBLE) / count(*)) AS m2
  FROM v GROUP BY t),
nb AS (
  SELECT a.t, a.r, a.c, a.valid_time, a.x,
         count(b.x) AS k, COALESCE(SUM(b.x), 0) AS ns,
         COALESCE(SUM(b.x*b.x), 0) AS nss
  FROM v a LEFT JOIN v b
    ON b.t = a.t
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
   AND abs(b.r - a.r) + abs(b.c - a.c) = 1
  GROUP BY 1, 2, 3, 4, 5),
cells AS (
  SELECT nb.valid_time, nb.r AS cell_row, nb.c AS cell_col,
         CAST(nb.k AS BIGINT) AS n_nb,
         CAST(nb.k*nb.x*nb.x - 2*nb.x*nb.ns + nb.nss AS DOUBLE) AS sqdiff,
         m.m2
  FROM nb JOIN mom m ON m.t = nb.t)
SELECT valid_time, cell_row, cell_col, n_nb, sqdiff, sqdiff / m2 AS local_c
FROM cells ORDER BY 2, 3, 1
"""


def raster_moran_bv() -> str:
    """Bivariate Moran twin: x-cells joined to rook y-neighbour integer
    sums, per-slice moments of both fields, and the identical chain
    zx = x - mean_x; lag = nsy - k*mean_y;
    I = (zx*lag)/(sqrt(m2x)*sqrt(m2y))."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
vx AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
vy AS (
  SELECT t, r, c, CAST(value AS BIGINT) AS y
  FROM rast WHERE variable = 'tp' AND value IS NOT NULL AND t < 48),
momx AS (
  SELECT t,
         CAST(SUM(x) AS DOUBLE) / count(*) AS mean_x,
         CAST(SUM(x*x) AS DOUBLE) / count(*)
           - (CAST(SUM(x) AS DOUBLE) / count(*))
             * (CAST(SUM(x) AS DOUBLE) / count(*)) AS m2x
  FROM vx GROUP BY t),
momy AS (
  SELECT t,
         CAST(SUM(y) AS DOUBLE) / count(*) AS mean_y,
         CAST(SUM(y*y) AS DOUBLE) / count(*)
           - (CAST(SUM(y) AS DOUBLE) / count(*))
             * (CAST(SUM(y) AS DOUBLE) / count(*)) AS m2y
  FROM vy GROUP BY t),
nb AS (
  SELECT a.t, a.r, a.c, a.valid_time, a.x,
         count(b.y) AS k, COALESCE(SUM(b.y), 0) AS nsy
  FROM vx a LEFT JOIN vy b
    ON b.t = a.t
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
   AND abs(b.r - a.r) + abs(b.c - a.c) = 1
  GROUP BY 1, 2, 3, 4, 5),
cells AS (
  SELECT nb.valid_time, nb.r AS cell_row, nb.c AS cell_col,
         CAST(nb.k AS BIGINT) AS n_nb,
         CAST(nb.x AS DOUBLE) - mx.mean_x AS zx,
         CAST(nb.nsy AS DOUBLE) - CAST(nb.k AS DOUBLE) * my.mean_y AS lag_y,
         mx.m2x, my.m2y
  FROM nb JOIN momx mx ON mx.t = nb.t JOIN momy my ON my.t = nb.t)
SELECT valid_time, cell_row, cell_col, n_nb, zx, lag_y,
       (zx * lag_y) / (sqrt(m2x) * sqrt(m2y)) AS local_ixy
FROM cells ORDER BY 2, 3, 1
"""


def raster_anomaly() -> str:
    """Anomaly twin: per-cell period mean from exact sums (SUM of
    integer-valued doubles is order-free), then the same subtraction and
    single division per row."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, value FROM rast
  WHERE variable = 't2m' AND value IS NOT NULL AND t < 144),
m AS (
  SELECT r, c, SUM(value) / count(*) AS cell_mean FROM v GROUP BY 1, 2)
SELECT v.valid_time, CAST(v.r AS BIGINT) AS cell_row,
       CAST(v.c AS BIGINT) AS cell_col, v.value, m.cell_mean,
       v.value - m.cell_mean AS anom, v.value / m.cell_mean AS ratio
FROM v JOIN m ON m.r = v.r AND m.c = v.c
ORDER BY 2, 3, 1
"""


def raster_joincount() -> str:
    """Join-count twin: rook edges enumerated once as right- and
    down-neighbour pairs, endpoint-color sums in CASE pivots — all
    integer counts."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time,
         CASE WHEN value >= 499 THEN 1 ELSE 0 END AS b
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
e AS (
  SELECT a.t, a.valid_time, a.b + n.b AS s
  FROM v a JOIN v n ON n.t = a.t AND n.r = a.r AND n.c = a.c + 1
  UNION ALL
  SELECT a.t, a.valid_time, a.b + n.b AS s
  FROM v a JOIN v n ON n.t = a.t AND n.r = a.r + 1 AND n.c = a.c)
SELECT valid_time,
       CAST(count(*) FILTER (s = 2) AS BIGINT) AS bb,
       CAST(count(*) FILTER (s = 0) AS BIGINT) AS ww,
       CAST(count(*) FILTER (s = 1) AS BIGINT) AS bw,
       CAST(count(*) AS BIGINT) AS n_edges
FROM e GROUP BY 1 ORDER BY 1
"""


def raster_streaks() -> str:
    """Streaks twin: daily max per cell, islands via day - row_number()
    (consecutive qualifying days share an island id), per-cell run
    statistics — all integers."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
d AS (
  SELECT r, c, t // 24 AS day, max(value) AS dmax
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL
  GROUP BY 1, 2, 3),
a AS (
  SELECT r, c, day,
         day - row_number() OVER (PARTITION BY r, c ORDER BY day) AS island
  FROM d WHERE dmax >= 970.0),
runs AS (
  SELECT r, c, island, CAST(count(*) AS BIGINT) AS len
  FROM a GROUP BY 1, 2, 3)
SELECT CAST(r AS BIGINT) AS cell_row, CAST(c AS BIGINT) AS cell_col,
       CAST(SUM(len) AS BIGINT) AS days_above,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(MAX(len) AS BIGINT) AS longest_run
FROM runs GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_focal_range() -> str:
    """Focal min/max/range twin — order-free exact over integer-valued
    doubles."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT a.valid_time, a.r AS cell_row, a.c AS cell_col,
       count(b.value) AS n_nb,
       min(b.value) AS focal_min, max(b.value) AS focal_max,
       max(b.value) - min(b.value) AS focal_range
FROM rast a JOIN rast b
  ON b.t = a.t AND b.variable = a.variable
 AND b.r BETWEEN a.r - 1 AND a.r + 1
 AND b.c BETWEEN a.c - 1 AND a.c + 1
 AND b.value IS NOT NULL
WHERE a.variable = 't2m' AND a.t < 24
GROUP BY 1, 2, 3 ORDER BY 2, 3, 1
"""


def raster_focal_median() -> str:
    """Focal median twin: DuckDB median over the 3x3 self-join group —
    measured bit-identical to np.nanmedian's even-count average."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT a.valid_time, a.r AS cell_row, a.c AS cell_col,
       count(b.value) AS n_nb,
       median(b.value) AS focal_median
FROM rast a JOIN rast b
  ON b.t = a.t AND b.variable = a.variable
 AND b.r BETWEEN a.r - 1 AND a.r + 1
 AND b.c BETWEEN a.c - 1 AND a.c + 1
 AND b.value IS NOT NULL
WHERE a.variable = 't2m' AND a.t < 24
GROUP BY 1, 2, 3 ORDER BY 2, 3, 1
"""


def raster_moran() -> str:
    """Local Moran's I twin: rook-neighbour integer sums by lattice
    self-join, per-slice moments from exact BIGINT aggregates, and the
    identical single-op float chain (mean = sx/n; m2 = sxx/n - mean*mean;
    z = x - mean; lag = ns - k*mean; I = (z*lag)/m2) — no transcendental
    functions, all sums integer-exact and order-free."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
mom AS (
  SELECT t,
         CAST(CAST(SUM(x) AS DOUBLE) / count(*) AS DOUBLE) AS mean,
         CAST(SUM(x*x) AS DOUBLE) / count(*)
           - (CAST(SUM(x) AS DOUBLE) / count(*))
             * (CAST(SUM(x) AS DOUBLE) / count(*)) AS m2
  FROM v GROUP BY t),
nb AS (
  SELECT a.t, a.r, a.c, a.valid_time, a.x,
         count(b.x) AS k, COALESCE(SUM(b.x), 0) AS ns
  FROM v a LEFT JOIN v b
    ON b.t = a.t
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
   AND abs(b.r - a.r) + abs(b.c - a.c) = 1
  GROUP BY 1, 2, 3, 4, 5),
cells AS (
  SELECT nb.valid_time, nb.r AS cell_row, nb.c AS cell_col,
         CAST(nb.k AS BIGINT) AS n_nb,
         CAST(nb.x AS DOUBLE) - m.mean AS z,
         CAST(nb.ns AS DOUBLE) - CAST(nb.k AS DOUBLE) * m.mean AS lag,
         m.m2
  FROM nb JOIN mom m ON m.t = nb.t)
SELECT valid_time, cell_row, cell_col, n_nb, z, lag,
       (z * lag) / m2 AS local_i
FROM cells ORDER BY 2, 3, 1
"""


def raster_hotspots() -> str:
    """Getis-Ord Gi* twin: queen 3x3 self-join incl. self, exact BIGINT
    moments, and the identical single-op chain — sqrt is IEEE
    correctly-rounded on both sides (transcendentals are not, and never
    appear here)."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
mom AS (
  SELECT t, count(*) AS n,
         CAST(SUM(x) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(SUM(x*x) AS DOUBLE) / count(*)
              - (CAST(SUM(x) AS DOUBLE) / count(*))
                * (CAST(SUM(x) AS DOUBLE) / count(*))) AS s
  FROM v GROUP BY t),
nb AS (
  SELECT a.t, a.r, a.c, a.valid_time,
         count(b.x) AS w, SUM(b.x) AS ns
  FROM v a JOIN v b
    ON b.t = a.t
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
  GROUP BY 1, 2, 3, 4)
SELECT nb.valid_time, nb.r AS cell_row, nb.c AS cell_col,
       CAST(nb.w AS BIGINT) AS w_nb,
       (CAST(nb.ns AS DOUBLE) - CAST(nb.w AS DOUBLE) * m.mean)
         / (m.s * sqrt(CAST(m.n * nb.w - nb.w * nb.w AS DOUBLE) / (m.n - 1)))
         AS g_star
FROM nb JOIN mom m ON m.t = nb.t
ORDER BY 2, 3, 1
"""


def emerging_hotspots() -> str:
    """Emerging-hotspot twin: the raster_hotspots Gi* construction as a
    CTE, Mann-Kendall S over the per-cell z series by time self-join,
    |z| >= 1.96 slice counts, and the engine's integer CASE ladder."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
mom AS (
  SELECT t, count(*) AS n,
         CAST(SUM(x) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(SUM(x*x) AS DOUBLE) / count(*)
              - (CAST(SUM(x) AS DOUBLE) / count(*))
                * (CAST(SUM(x) AS DOUBLE) / count(*))) AS s
  FROM v GROUP BY t),
nb AS (
  SELECT a.t, a.r, a.c, count(b.x) AS w, SUM(b.x) AS ns
  FROM v a JOIN v b
    ON b.t = a.t
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
  GROUP BY 1, 2, 3),
gi AS (
  SELECT nb.t, nb.r, nb.c,
         (CAST(nb.ns AS DOUBLE) - CAST(nb.w AS DOUBLE) * m.mean)
           / (m.s * sqrt(CAST(m.n * nb.w - nb.w * nb.w AS DOUBLE) / (m.n - 1)))
           AS z
  FROM nb JOIN mom m ON m.t = nb.t),
mk AS (
  SELECT a.r, a.c,
         CAST(SUM(CASE WHEN b.z > a.z THEN 1
                       WHEN b.z < a.z THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM gi a JOIN gi b ON b.r = a.r AND b.c = a.c AND b.t > a.t
  GROUP BY 1, 2),
cnt AS (
  SELECT r, c, CAST(count(*) AS BIGINT) AS n_slices,
         CAST(count(*) FILTER (WHERE z >= 1.96) AS BIGINT) AS hot_count,
         CAST(count(*) FILTER (WHERE z <= -1.96) AS BIGINT) AS cold_count
  FROM gi GROUP BY 1, 2)
SELECT CAST(cnt.r AS BIGINT) AS cell_row, CAST(cnt.c AS BIGINT) AS cell_col,
       cnt.n_slices, cnt.hot_count, cnt.cold_count, mk.s_stat,
       CASE
         WHEN cnt.hot_count = 0 AND cnt.cold_count = 0 THEN 'none'
         WHEN cnt.hot_count > cnt.cold_count THEN
           CASE WHEN mk.s_stat > 0 THEN 'intensifying hot'
                WHEN mk.s_stat < 0 THEN 'waning hot'
                ELSE 'persistent hot' END
         WHEN cnt.cold_count > cnt.hot_count THEN
           CASE WHEN mk.s_stat < 0 THEN 'intensifying cold'
                WHEN mk.s_stat > 0 THEN 'waning cold'
                ELSE 'persistent cold' END
         ELSE 'mixed'
       END AS category
FROM cnt JOIN mk ON mk.r = cnt.r AND mk.c = cnt.c
ORDER BY 1, 2
"""


def raster_temporal_variogram() -> str:
    """Temporal-semivariogram twin: same-cell (t, t+h) pairs by
    self-join, exact integer squared-difference sums, one division."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
hs AS (SELECT range AS h FROM range(1, 7)),
p AS (
  SELECT hs.h, (b.x - a.x) * (b.x - a.x) AS d2
  FROM v a CROSS JOIN hs
  JOIN v b ON b.r = a.r AND b.c = a.c AND b.t = a.t + hs.h)
SELECT h AS lag_hours, count(*) AS n_pairs,
       CAST(SUM(d2) AS DOUBLE) / (2 * count(*)) AS gamma
FROM p GROUP BY 1 ORDER BY 1
"""


def raster_cusum() -> str:
    """CUSUM drawup twin: running sum / row_number windows build the
    cleared-denominator D_k (HUGEINT-safe, CAST back exact), exclusive
    running min with LEAST(0, ...) for the empty prefix, QUALIFY
    first-max on the (drawup DESC, hour ASC) total order."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t AS hour, r, c, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
st AS (
  SELECT r, c, hour,
         CAST(count(*) OVER cw AS BIGINT) AS n,
         SUM(x) OVER w AS s_k,
         CAST(row_number() OVER w AS BIGINT) AS k,
         SUM(x) OVER cw AS tot
  FROM v
  WINDOW w AS (PARTITION BY r, c ORDER BY hour ROWS UNBOUNDED PRECEDING),
         cw AS (PARTITION BY r, c)),
d AS (SELECT r, c, hour, n, CAST(n * s_k - k * tot AS BIGINT) AS dk FROM st),
dr AS (
  SELECT r, c, hour, n,
         dk - LEAST(0, COALESCE(MIN(dk) OVER (
             PARTITION BY r, c ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS dr
  FROM d)
SELECT CAST(r AS BIGINT) AS cell_row, CAST(c AS BIGINT) AS cell_col,
       n AS n_obs, dr AS drawup, hour AS t_at_max
FROM dr
QUALIFY row_number() OVER (PARTITION BY r, c ORDER BY dr DESC, hour) = 1
ORDER BY 1, 2
"""


def raster_decompose() -> str:
    """STL-lite twin: centered window sum + count (interior = full
    25-hour windows), cleared-denominator d25/s75 integers, the three
    mirrored single divisions."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 96),
w AS (
  SELECT t, r, c, valid_time, x,
         CAST(SUM(x) OVER (PARTITION BY r, c ORDER BY t
                           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              AS BIGINT) AS t25,
         count(*) OVER (PARTITION BY r, c ORDER BY t
                        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS wn
  FROM v),
d AS (
  SELECT t, r, c, valid_time, t25, 25*x - t25 AS d25, t % 24 AS hod
  FROM w WHERE wn = 25),
s AS (
  SELECT r, c, hod, CAST(SUM(d25) AS BIGINT) AS s75,
         CAST(count(*) AS BIGINT) AS m
  FROM d GROUP BY 1, 2, 3)
SELECT d.valid_time, d.r AS cell_row, d.c AS cell_col,
       CAST(d.t25 AS DOUBLE) / 25.0 AS trend,
       CAST(s.s75 AS DOUBLE) / CAST(25 * s.m AS DOUBLE) AS seasonal,
       CAST(s.m * d.d25 - s.s75 AS DOUBLE) / CAST(25 * s.m AS DOUBLE)
         AS resid
FROM d JOIN s ON s.r = d.r AND s.c = d.c AND s.hod = d.hod
ORDER BY 2, 3, 1
"""


def raster_spearman() -> str:
    """Spearman twin: doubled average ranks as integer window
    expressions (2*(rank()-1) + tie count + 1), exact BIGINT sums per
    slice, the engine's mirrored rho chain."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, variable, valid_time, value
  FROM rast
  WHERE value IS NOT NULL AND t < 48 AND variable IN ('t2m', 'tp')),
rk AS (
  SELECT t, r, c, variable, valid_time,
         CAST(2 * (rank() OVER (PARTITION BY t, variable ORDER BY value)
                   - 1)
              + count(*) OVER (PARTITION BY t, variable, value)
              + 1 AS BIGINT) AS r2
  FROM v),
xy AS (
  SELECT x.t, x.valid_time, x.r2 AS rx, y.r2 AS ry
  FROM rk x JOIN rk y
    ON y.t = x.t AND y.r = x.r AND y.c = x.c AND y.variable = 'tp'
  WHERE x.variable = 't2m'),
s AS (
  SELECT t, valid_time, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx*rx) AS BIGINT) AS sxx,
         CAST(SUM(ry*ry) AS BIGINT) AS syy,
         CAST(SUM(rx*ry) AS BIGINT) AS sxy
  FROM xy GROUP BY 1, 2)
SELECT valid_time, n AS n_cells,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS rho
FROM s ORDER BY 1
"""


def raster_mannkendall() -> str:
    """Mann-Kendall twin: time-ordered pair signs by self-join, exact
    BIGINT S and tie terms, var = num/18 (one division), the same
    continuity-corrected z branches; sqrt correctly rounded both
    sides."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
s AS (
  SELECT a.r, a.c,
         CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM v a JOIN v b ON b.r = a.r AND b.c = a.c AND b.t > a.t
  GROUP BY 1, 2),
n AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2),
ties AS (
  SELECT r, c, CAST(SUM(tg*(tg-1)*(2*tg+5)) AS BIGINT) AS tsum
  FROM (SELECT r, c, x, CAST(count(*) AS BIGINT) AS tg FROM v GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
f AS (
  SELECT n.r, n.c, n.n, s.s_stat,
         CAST(n.n*(n.n-1)*(2*n.n+5) - ties.tsum AS DOUBLE) / 18 AS var_s
  FROM n JOIN s ON s.r = n.r AND s.c = n.c
  JOIN ties ON ties.r = n.r AND ties.c = n.c)
SELECT r AS cell_row, c AS cell_col, n AS n_obs, s_stat, var_s,
       CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
            WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
            ELSE 0.0 END AS z
FROM f ORDER BY 1, 2
"""


def raster_flowdir() -> str:
    """D8 twin: 8-direction neighbor self-join (the offsets table), per
    (t, cell) max drop with min-dir tie-break via row_number, pit when
    the best drop <= 0 — pure integer comparisons."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
dirs AS (
  SELECT * FROM (VALUES (0, 0, 1), (1, 1, 1), (2, 1, 0), (3, 1, -1),
                        (4, 0, -1), (5, -1, -1), (6, -1, 0), (7, -1, 1))
    AS d(dir, dr, dc)),
drops AS (
  SELECT a.t, a.r, a.c, d.dir, a.value - b.value AS drop
  FROM v a CROSS JOIN dirs d
  JOIN v b ON b.t = a.t AND b.r = a.r + d.dr AND b.c = a.c + d.dc),
pick AS (
  SELECT t, r, c, dir, drop,
         row_number() OVER (PARTITION BY t, r, c
                            ORDER BY drop DESC, dir ASC) AS rn
  FROM drops)
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * t AS valid_time,
       r AS cell_row, c AS cell_col,
       CASE WHEN drop > 0.0 THEN CAST(dir AS BIGINT)
            ELSE CAST(-1 AS BIGINT) END AS flow_dir,
       drop AS best_drop
FROM pick WHERE rn = 1
ORDER BY 1, 2, 3
"""


def raster_flow_acc() -> str:
    """Hydrology twin: the flowdir pick feeds a recursive-CTE walk
    (every cell's full downstream path — D8 drops are strictly positive
    so the walk terminates); flow_acc = count of start cells whose path
    visits the cell, basin = the path's terminal (pit) cell.  Exact
    integer counts — order never enters a sum."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH RECURSIVE rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 24),
dirs AS (
  SELECT * FROM (VALUES (0, 0, 1), (1, 1, 1), (2, 1, 0), (3, 1, -1),
                        (4, 0, -1), (5, -1, -1), (6, -1, 0), (7, -1, 1))
    AS d(dir, dr, dc)),
drops AS (
  SELECT a.t, a.r, a.c, d.dir, a.value - b.value AS drop
  FROM v a CROSS JOIN dirs d
  JOIN v b ON b.t = a.t AND b.r = a.r + d.dr AND b.c = a.c + d.dc),
pick AS (
  SELECT t, r, c, dir, drop,
         row_number() OVER (PARTITION BY t, r, c
                            ORDER BY drop DESC, dir ASC) AS rn
  FROM drops),
succ AS (
  SELECT p.t, p.r, p.c,
         CASE WHEN p.drop > 0.0 THEN p.r + d.dr END AS nr,
         CASE WHEN p.drop > 0.0 THEN p.c + d.dc END AS nc
  FROM pick p JOIN dirs d ON d.dir = p.dir
  WHERE p.rn = 1),
walk (t, sr, sc, r, c) AS (
  SELECT t, r, c, r, c FROM succ
  UNION ALL
  SELECT w.t, w.sr, w.sc, s.nr, s.nc
  FROM walk w JOIN succ s ON s.t = w.t AND s.r = w.r AND s.c = w.c
  WHERE s.nr IS NOT NULL),
acc AS (
  SELECT t, r, c, CAST(count(*) AS BIGINT) AS flow_acc
  FROM walk GROUP BY 1, 2, 3),
term AS (
  SELECT w.t, w.sr, w.sc, w.r AS basin_row, w.c AS basin_col
  FROM walk w JOIN succ s ON s.t = w.t AND s.r = w.r AND s.c = w.c
  WHERE s.nr IS NULL)
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * a.t AS valid_time,
       a.r AS cell_row, a.c AS cell_col, a.flow_acc,
       CAST(m.basin_row AS BIGINT) AS basin_row,
       CAST(m.basin_col AS BIGINT) AS basin_col
FROM acc a JOIN term m ON m.t = a.t AND m.sr = a.r AND m.sc = a.c
ORDER BY 1, 2, 3
"""


def raster_sen_slope() -> str:
    """Theil-Sen twin: time-ordered pair slopes by self-join (one
    division each), per-cell median (DuckDB's even-count median is the
    same two-middle average as np.median — measured), intercept =
    median(x - slope*t) with the multiply-then-subtract chain
    mirrored."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
sl AS (
  SELECT a.r, a.c,
         CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM v a JOIN v b ON b.r = a.r AND b.c = a.c AND b.t > a.t),
m AS (SELECT r, c, median(s) AS sen_slope FROM sl GROUP BY 1, 2),
n AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n_obs FROM v GROUP BY 1, 2),
b AS (
  SELECT v.r, v.c,
         median(CAST(v.x AS DOUBLE) - m.sen_slope * CAST(v.t AS DOUBLE))
           AS sen_intercept
  FROM v JOIN m ON m.r = v.r AND m.c = v.c
  GROUP BY 1, 2)
SELECT n.r AS cell_row, n.c AS cell_col, n.n_obs, m.sen_slope,
       b.sen_intercept
FROM n JOIN m ON m.r = n.r AND m.c = n.c
      JOIN b ON b.r = n.r AND b.c = n.c
ORDER BY 1, 2
"""


def raster_variogram() -> str:
    """Semivariogram twin: axis-aligned lag-h pairs by self-join, exact
    integer squared-difference sums, one division — order-free."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, valid_time, CAST(value AS BIGINT) AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
hs AS (SELECT range AS h FROM range(1, 5)),
pv AS (
  SELECT a.valid_time, hs.h, (a.x - b.x) * (a.x - b.x) AS d2
  FROM v a CROSS JOIN hs
  JOIN v b ON b.t = a.t AND b.r = a.r + hs.h AND b.c = a.c),
ph AS (
  SELECT a.valid_time, hs.h, (a.x - b.x) * (a.x - b.x) AS d2
  FROM v a CROSS JOIN hs
  JOIN v b ON b.t = a.t AND b.r = a.r AND b.c = a.c + hs.h),
allp AS (SELECT * FROM pv UNION ALL SELECT * FROM ph)
SELECT valid_time, h AS lag, count(*) AS n_pairs,
       CAST(SUM(d2) AS DOUBLE) / (2 * count(*)) AS gamma
FROM allp GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_clumps() -> str:
    """Clump twin: same-class 4-adjacency edges, recursive reachability
    closure (the dedup_clusters idiom), min-label regions aggregated to
    (region, class, size) — all-integer, order-free."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH RECURSIVE rastq AS ({sql_raster_cte()}),
cells AS (
  SELECT r, c, r*33 + c AS id, CAST(value AS BIGINT) // 16 AS cls
  FROM rastq WHERE t = 0 AND variable = 't2m' AND value IS NOT NULL),
edges0 AS (
  SELECT a.id AS src, b.id AS dst FROM cells a
  JOIN cells b ON b.r = a.r AND b.c = a.c + 1 AND b.cls = a.cls
  UNION ALL
  SELECT a.id, b.id FROM cells a
  JOIN cells b ON b.r = a.r + 1 AND b.c = a.c AND b.cls = a.cls),
edges AS (SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0),
reach(node, lab) AS (
  SELECT id, id FROM cells
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
lab AS (SELECT node, min(lab) AS region_id FROM reach GROUP BY node)
SELECT l.region_id, c.cls, count(*) AS n_cells
FROM lab l JOIN cells c ON c.id = l.node
GROUP BY 1, 2 ORDER BY 1
"""


def dedup_chunks() -> str:
    """Chunk-dedup twin: zipped unnest tokenizes, string_agg rebuilds
    chunk strings (single-space corpus, so reconstruction is exact),
    row_number over (doc_id, chunk_id) is the same global first-wins
    order the engine's lexsort implements, and the final string_agg
    ORDER BY chunk_id mirrors the reassembly join."""
    return """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS ord0
  FROM documents),
chunks AS (
  SELECT doc_id, ord0 // 4 AS chunk_id,
         string_agg(tok, ' ' ORDER BY ord0) AS chunk
  FROM toks GROUP BY doc_id, ord0 // 4),
keep AS (
  SELECT doc_id, chunk_id, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_id) AS rn
  FROM chunks)
SELECT doc_id, count(*) AS n_chunks_kept,
       string_agg(chunk, ' ' ORDER BY chunk_id) AS text_dedup
FROM keep WHERE rn = 1
GROUP BY doc_id ORDER BY doc_id
"""


def jaccard_orders() -> str:
    """SSJoin twin: distinct items, per-pair shared-item counts, integer
    rational-threshold filter (2*inter >= union), one double division."""
    return """
WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
sizes AS (SELECT ok, count(*) AS sz FROM items GROUP BY ok),
inter AS (
  SELECT a.ok AS doc_a, b.ok AS doc_b, count(*) AS inter
  FROM items a JOIN items b ON a.item = b.item AND a.ok < b.ok
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, i.inter,
       sa.sz + sb.sz - i.inter AS un,
       CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.ok = i.doc_a
JOIN sizes sb ON sb.ok = i.doc_b
WHERE 2 * i.inter >= sa.sz + sb.sz - i.inter
ORDER BY 1, 2
"""


def triangle_parts() -> str:
    """Triangle enumeration by 3-way self-join over the distinct
    undirected co-purchase edge set (each triangle once as s<t<u by id),
    then each corner counted — integer counts, order-free."""
    return """
WITH pairs AS (
  SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS s,
         greatest(x.l_partkey, y.l_partkey) AS t
  FROM lineitem x JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey),
tri AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.s = e1.t
  JOIN pairs e3 ON e3.s = e1.s AND e3.t = e2.t),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT node AS part_key, count(*) AS n_triangles
FROM corners GROUP BY node ORDER BY 1
"""


def edit_neardup() -> str:
    """Length-band blocked quadratic Levenshtein — the candidate set
    ``same lang AND |Δlen| <= 8`` is exactly what the engine's
    adjacent-bucket banding resolves (bucket = len // 9, pair resolved in
    the max bucket's group), so pair sets match bit-for-bit; ``lev`` is an
    integer in both."""
    return """
WITH cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.text, b.text) AS lev
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND a.doc_id < b.doc_id
   AND abs(length(a.text) - length(b.text)) <= 8)
SELECT doc_a, doc_b, lev FROM cand WHERE lev <= 8
ORDER BY 1, 2
"""


def _sql_minhash_cte(threshold: float, source: str = "documents") -> str:
    """CTE chain reproducing the full MinHash+LSH pipeline in DuckDB:
    position-ordered token hashes -> 3-shingle combines -> 64 multiply-add
    permutation minima -> 16 banded FNV bucket hashes -> colliding pairs
    -> signature-estimated Jaccard.  All arithmetic HUGEINT mod 2**64,
    bit-identical to the numpy uint64 pipeline (stages/dedup.py)."""
    from geoglue_ray.functions.texthash import U64, sql_token_hash
    from geoglue_ray.stages.dedup import _SH_MUL1, _SH_MUL2, MinHasher

    mh = MinHasher(num_perm=64)
    perms = ", ".join(
        f"({p}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for p, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    m1, m2 = int(_SH_MUL1), int(_SH_MUL2)
    # 3-shingle combine: ((h0*M1 ^ h1) * M2 ^ h2) * M2, each step mod 2^64
    step1 = f"((a.h * {m1}::HUGEINT) % {U64}::HUGEINT)"
    step2 = f"((xor({step1}, b.h) * {m2}::HUGEINT) % {U64}::HUGEINT)"
    step3 = f"((xor({step2}, c.h) * {m2}::HUGEINT) % {U64}::HUGEINT)"
    fnv = (
        "list_reduce(list_prepend(1469598103::HUGEINT, list(s ORDER BY p)), "
        f"(acc, x) -> xor((acc * 1099511628211::HUGEINT) % {U64}::HUGEINT, x))"
    )
    return f"""
tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM {source}),
tok AS (
  SELECT doc_id, i.range AS i, {sql_token_hash('list_extract(toks, i.range::INTEGER)')} AS h
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
sh AS (
  SELECT a.doc_id, {step3} AS x
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
perms(p, pa, pb) AS (VALUES {perms}),
sigs AS (
  SELECT doc_id, p, min((pa * x + pb) % {U64}::HUGEINT) AS s
  FROM sh, perms GROUP BY 1, 2),
bands AS (
  SELECT doc_id, p // 4 AS band_id, {fnv} AS band_hash
  FROM sigs GROUP BY doc_id, p // 4),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
est AS (
  SELECT c.da, c.db,
         sum(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) / 64.0 AS est
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.da
  JOIN sigs sb ON sb.doc_id = c.db AND sb.p = sa.p
  GROUP BY 1, 2),
mh_pairs AS (
  SELECT da AS doc_a, db AS doc_b, est AS est_jaccard
  FROM est WHERE est >= {threshold})
"""


def minhash_neardup() -> str:
    """Full MinHash+LSH candidate pairs, bit-exact (the engine's shard
    keying is a pure shuffle choice — the pair set is defined by the band
    collisions this SQL reproduces).  Valid while every doc has >= 3
    tokens (all sf fixtures; the engine additionally handles shorter docs
    with a whole-doc shingle the CTE omits)."""
    return f"""
WITH {_sql_minhash_cte(0.4)}
SELECT doc_a, doc_b, est_jaccard FROM mh_pairs ORDER BY 1, 2
"""


def dedup_clusters() -> str:
    """Connected components over the SQL-recomputed minhash pair set via
    a recursive reachability closure; cluster_id = lowest member."""
    return f"""
WITH RECURSIVE {_sql_minhash_cte(0.4)},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1 ORDER BY 1
"""


def dup_cluster_sizes() -> str:
    """Cluster-size histogram twin: the component closure, per-cluster
    counts, then (size, n_clusters, size*n_clusters)."""
    return f"""
WITH RECURSIVE {_sql_minhash_cte(0.4)},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
cl AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY 1),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS m FROM cl GROUP BY 1)
SELECT m AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       m * CAST(count(*) AS BIGINT) AS n_docs
FROM sz GROUP BY 1 ORDER BY 1
"""


def dedup_corpus() -> str:
    """Composed survivor corpus: the recursive component closure over the
    SQL-recomputed pair set, then an anti-join keeping each cluster's
    lowest doc_id (and every unclustered doc) with its payload columns."""
    return f"""
WITH RECURSIVE {_sql_minhash_cte(0.4)},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
clus AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM clus WHERE cluster_id <> doc_id)
ORDER BY d.doc_id
"""


def approx_distinct_check() -> str:
    """Exact distinct + the accuracy claim the engine must uphold: the
    HLL estimate within 5% (a FALSE on the engine side hash-fails)."""
    return """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_5pct
FROM events GROUP BY 1 ORDER BY 1
"""


def approx_distinct_users() -> str:
    """Bit-exact KMV twin: recomputes the bottom-k hash set per event
    type through the HUGEINT int_hash64 replica and applies the identical
    single-division estimate (stages/sketch.kmv_distinct)."""
    from geoglue_ray.stages.sketch import sql_kmv_distinct

    return (
        sql_kmv_distinct("events", "event_type", "user_id", k=128)
        + " ORDER BY event_type"
    )


def embed_lsh_recall() -> str:
    """Recall claim for multi-probe LSH kNN vs brute force (>= 0.6 mean)."""
    return """
SELECT i.range AS query_id, TRUE AS recall_ok FROM range(4) i ORDER BY 1
"""


def media_explode() -> str:
    return """
SELECT d.doc_id,
       CAST(1 + j.range AS INTEGER) AS span_index,
       CASE WHEN (d.doc_id + 1 + j.range) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       'media/' || d.doc_id || '/' || (1 + j.range) AS media_ref,
       CAST(d.n_chars + j.range AS INTEGER) AS "offset"
FROM documents d, range(2) j
WHERE 1 + j.range <= d.doc_id % 3
ORDER BY doc_id, span_index
"""


def media_features() -> str:
    """Recomputes the media pipeline's deterministic stub decode
    (``stages/media.py``: seed = ASCII-code sum of media_ref; byte[i] =
    (((seed+1)*C1 + (i+1)*C2) mod 2**64) >> 56) and the featurizer's
    histogram moment in pure SQL — HUGEINT arithmetic is exact below
    2**127 (texthash contract), so every byte matches numpy uint64
    wraparound bit-for-bit."""
    from geoglue_ray.functions.texthash import C1, C2, U64
    from geoglue_ray.stages.media import PAYLOAD_LEN

    return f"""
WITH spans AS (
  SELECT d.doc_id,
         CAST(1 + j.range AS INTEGER) AS span_index,
         CASE WHEN (d.doc_id + 1 + j.range) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         'media/' || d.doc_id || '/' || (1 + j.range) AS media_ref
  FROM documents d, range(2) j
  WHERE 1 + j.range <= d.doc_id % 3),
seeds AS (
  SELECT s.doc_id, s.span_index, s.kind,
         sum(ascii(substr(s.media_ref, c.range::INTEGER + 1, 1))) AS seed
  FROM spans s, range(40) c
  WHERE c.range < length(s.media_ref)
  GROUP BY 1, 2, 3),
bytes AS (
  SELECT doc_id, span_index, kind,
         ((((seed + 1)::HUGEINT * {C1}::HUGEINT
            + (i.range + 1)::HUGEINT * {C2}::HUGEINT) % {U64}::HUGEINT)
          // {1 << 56}::HUGEINT) AS byte
  FROM seeds, range({PAYLOAD_LEN}) i)
SELECT doc_id, span_index, kind,
       CAST({PAYLOAD_LEN} AS BIGINT) AS payload_len,
       CAST(sum(byte) AS BIGINT) AS byte_sum,
       CAST(count(DISTINCT byte) AS BIGINT) AS n_distinct_bytes
FROM bytes GROUP BY 1, 2, 3 ORDER BY 1, 2
"""


def embed_centroids() -> str:
    """Quantized-centroid twin: identical floor(x*2^20 + 0.5) quantization
    (exact for float32 inputs), integer-valued sums (order-independent),
    one final division — mirrors pipelines/queries.embed_centroids."""
    return """
WITH x AS (
  SELECT label, i.range AS dim,
         floor(CAST(embedding[i.range + 1] AS DOUBLE) * 1048576.0 + 0.5) AS q
  FROM embeddings, range(64) i)
SELECT label, CAST(dim AS INTEGER) AS dim,
       sum(q) / count(*) AS centroid_q,
       CAST(count(*) AS DOUBLE) AS n_vecs
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""


def _sign_chain(alias: str, signs_col) -> str:
    """One plane's ordered projection: ``s0*e[1] + s1*e[2] + ...`` written
    as a left-associative ±CAST chain — SQL's left-to-right evaluation is
    bit-identical to the engine's ordered accumulation
    (stages/similarity._chain_project); a - x IS a + (-x) in IEEE."""
    parts = []
    for d, s in enumerate(signs_col):
        t = f"CAST({alias}[{d + 1}] AS DOUBLE)"
        if d == 0:
            parts.append(t if s > 0 else f"(- {t})")
        else:
            parts.append(("+ " if s > 0 else "- ") + t)
    return " ".join(parts)


def _bucket_expr(alias: str, signs) -> str:
    """Sign-LSH bucket id from the RAW vector (scale-invariant signs are
    NOT float-invariant under normalization — the engine buckets raw
    vectors for the same reason, similarity.chain_bucket)."""
    bits = [
        f"(CASE WHEN ({_sign_chain(alias, signs[:, j])}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(signs.shape[1])
    ]
    return " + ".join(bits)


def _normsq_chain(alias: str, dim: int) -> str:
    return " + ".join(
        f"CAST({alias}[{d + 1}] AS DOUBLE) * CAST({alias}[{d + 1}] AS DOUBLE)"
        for d in range(dim)
    )


def _dot_chain(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"CAST({a}[{d + 1}] AS DOUBLE) * CAST({b}[{d + 1}] AS DOUBLE)"
        for d in range(dim)
    )


_EMB_DIM = 64  # the embeddings fixture's dimensionality (TESTDATA.md)


def embed_knn_lsh() -> str:
    """Sign-LSH kNN twin: the bucket ids are bit-exact (Rademacher ±
    chains over raw vectors), so candidate membership — Hamming<=2
    multi-probe around each query's bucket, accept-set union across
    queries, exactly the engine's pruning — is exact set equality; the
    final top-10 is the embed_knn rank-only cosine-order contract."""
    from geoglue_ray.stages.similarity import rademacher_signs

    signs = rademacher_signs(_EMB_DIM, 4, seed=23)
    return f"""
WITH sig AS (
  SELECT vec_id, embedding,
         CAST({_bucket_expr('embedding', signs)} AS BIGINT) AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb
      FROM sig WHERE vec_id IN (0, 1, 2, 3)),
cand AS (
  SELECT s.vec_id, s.embedding FROM sig s
  WHERE EXISTS (SELECT 1 FROM q WHERE bit_count(xor(s.bucket, q.qb)) <= 2))
SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
       row_number() OVER (
         PARTITION BY q.qid
         ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC, c.vec_id
       ) AS rank
FROM q, cand c
WHERE c.vec_id <> q.qid
QUALIFY rank <= 10
ORDER BY 1, 3
"""


def embed_knn_ivf() -> str:
    """IVF kNN twin (head coarse quantizer = the 16 lowest-id vectors):
    assignment and probe selection are pure cosine orders with
    (sim DESC, centroid ASC) total order, mirroring the engine's argmax
    / deterministic lexsort probe set; inverted-file semantics — a row
    is a candidate for a query only via the query's 12 probed lists."""
    return """
WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings WHERE vec_id < 16),
asg AS (
  SELECT v.vec_id, v.embedding, cents.c AS lst
  FROM embeddings v, cents
  QUALIFY row_number() OVER (
      PARTITION BY v.vec_id
      ORDER BY list_cosine_similarity(v.embedding, ce) DESC, cents.c) = 1),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id IN (0, 1, 2, 3)),
probes AS (
  SELECT qid, cents.c FROM q, cents
  QUALIFY row_number() OVER (
      PARTITION BY qid
      ORDER BY list_cosine_similarity(qe, ce) DESC, cents.c) <= 12)
SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
       row_number() OVER (
         PARTITION BY q.qid
         ORDER BY list_cosine_similarity(q.qe, a.embedding) DESC, a.vec_id
       ) AS rank
FROM q
JOIN probes p ON p.qid = q.qid
JOIN asg a ON a.lst = p.c AND a.vec_id <> q.qid
QUALIFY rank <= 10
ORDER BY 1, 3
"""


def embed_neardup() -> str:
    """Embedding near-dup twin: bit-exact END TO END — bucket ids from
    the ± chains, norms from the ordered square chains + one
    correctly-rounded sqrt, pair cosine = ordered dot chain / (na*nb);
    every term mirrors one engine IEEE op (similarity.chain_cosine), so
    the threshold verdict AND the float cosine column hash-match."""
    from geoglue_ray.stages.similarity import rademacher_signs

    signs = rademacher_signs(_EMB_DIM, 4, seed=23)
    return f"""
WITH sig AS (
  SELECT vec_id, embedding,
         CAST({_bucket_expr('embedding', signs)} AS BIGINT) AS bucket,
         sqrt({_normsq_chain('embedding', _EMB_DIM)}) AS nrm
  FROM embeddings)
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ({_dot_chain('a.embedding', 'b.embedding', _EMB_DIM)})
           / (a.nrm * b.nrm) AS cosine
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
WHERE cosine >= 0.3
ORDER BY 1, 2
"""


def split_leakage_audit() -> str:
    """Leakage-audit twin: the minhash pair CTE + the split_assign hash
    rule on both pair members, canonical (least, greatest) label pair,
    all-integer counts."""
    from geoglue_ray.functions.texthash import sql_int_hash

    def split(e: str) -> str:
        h = f"({sql_int_hash(e)}) % 10"
        return (
            f"CASE WHEN {h} < 8 THEN 'train' "
            f"WHEN {h} = 8 THEN 'val' ELSE 'test' END"
        )

    return f"""
WITH {_sql_minhash_cte(0.4)},
lab AS (
  SELECT {split('doc_a')} AS sa, {split('doc_b')} AS sb FROM mh_pairs),
canon AS (
  SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b FROM lab)
SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
       split_a <> split_b AS is_leakage
FROM canon GROUP BY 1, 2 ORDER BY 1, 2
"""


def perm_test_events(B: int = 128, group: str = "purchase") -> str:
    """Randomization-test twin: cleared-denominator statistic
    |sA*nB - sB*nA| on exact BIGINTs, B hashed reallocations via the
    kmv HUGEINT chain (hash input event_id*B + j, j in 0..B-1 — the
    engine's 0-based replicate hash), one final division."""
    from geoglue_ray.functions.texthash import sql_kmv_hash

    h = sql_kmv_hash(f"e.event_id * {B} + j.range")
    return f"""
WITH e AS (
  SELECT event_id, event_type, CAST(floor(value) AS BIGINT) AS v
  FROM events),
ob AS (
  SELECT CAST(count(*) FILTER (WHERE event_type = '{group}') AS BIGINT) AS na,
         CAST(count(*) FILTER (WHERE event_type <> '{group}') AS BIGINT) AS nb,
         CAST(sum(v) FILTER (WHERE event_type = '{group}') AS BIGINT) AS sa,
         CAST(sum(v) FILTER (WHERE event_type <> '{group}') AS BIGINT) AS sb
  FROM e),
obt AS (SELECT na, nb, abs(sa * nb - sb * na) AS t0 FROM ob),
reps AS (
  SELECT j.range AS j,
         CAST(({h}) % 2::HUGEINT AS BIGINT) AS side, e.v
  FROM e, range({B}) j),
per AS (
  SELECT j,
         CAST(sum(v) FILTER (WHERE side = 0) AS BIGINT) AS sa,
         CAST(sum(v) FILTER (WHERE side = 1) AS BIGINT) AS sb,
         CAST(count(*) FILTER (WHERE side = 0) AS BIGINT) AS na,
         CAST(count(*) FILTER (WHERE side = 1) AS BIGINT) AS nb
  FROM reps GROUP BY 1),
tb AS (SELECT abs(sa * nb - sb * na) AS t FROM per),
ge AS (SELECT CAST(count(*) FILTER (WHERE tb.t >= obt.t0) AS BIGINT) AS n_ge
       FROM tb, obt GROUP BY obt.t0)
SELECT obt.na AS n_a, obt.nb AS n_b, obt.t0 AS t_obs,
       ge.n_ge AS n_perm_ge,
       CAST(1 + ge.n_ge AS DOUBLE) / CAST({B + 1} AS DOUBLE) AS p_value
FROM obt, ge
"""


def mean_subsample_ci(B: int = 64) -> str:
    """Subsampling-CI twin: kmv block assignment, exact integer block
    sums (floor before CAST — DuckDB CAST rounds), one division per
    block mean, quantile_disc selection (== the engine's ceil(q*n)-1
    rule, the winsorized parity)."""
    from geoglue_ray.functions.texthash import sql_kmv_hash

    return f"""
WITH b AS (
  SELECT CAST(({sql_kmv_hash('event_id')}) % {B}::HUGEINT AS BIGINT) AS blk,
         CAST(floor(value) AS BIGINT) AS v
  FROM events),
per AS (
  SELECT blk, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
  FROM b GROUP BY 1),
m AS (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_b FROM per),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS nb
      FROM per)
SELECT t.nn AS n_events, t.nb AS n_blocks,
       CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE) AS mean_all,
       quantile_disc(m.mean_b, 0.05) AS p05,
       quantile_disc(m.mean_b, 0.5) AS p50,
       quantile_disc(m.mean_b, 0.95) AS p95
FROM m, t GROUP BY t.nn, t.nb, t.ss
"""


def keyword_textrank(k: int = 25) -> str:
    """TextRank twin: positional bigram word graph on two's-complement
    token-hash node ids, the pagerank_parts unrolled HUGEINT fixed
    point, names re-attached by hash."""
    from geoglue_ray.functions.texthash import sql_token_hash, sql_u64_to_bigint

    h = sql_u64_to_bigint(sql_token_hash("w"))
    it = """
  SELECT e.dst AS node,
         15 * CAST(4294967296 AS HUGEINT) // 100
         + 85 * SUM({rank} // d.d) // 100 AS rank
  FROM pr_edges e JOIN deg d ON d.src = e.src{join}
  GROUP BY e.dst"""
    return (
        f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
hx AS (SELECT doc_id, i, {h} AS h, w FROM tok),
bg AS (
  SELECT a.h AS src, b.h AS dst
  FROM hx a JOIN hx b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  WHERE a.h <> b.h),
pr_edges AS (
  SELECT DISTINCT src, dst
  FROM (SELECT src, dst FROM bg UNION ALL SELECT dst, src FROM bg)),
deg AS (SELECT src, count(*) AS d FROM pr_edges GROUP BY src),
r1 AS ("""
        + it.format(rank="CAST(4294967296 AS HUGEINT)", join="")
        + "),\nr2 AS ("
        + it.format(rank="r.rank", join=" JOIN r1 r ON r.node = e.src")
        + "),\nr3 AS ("
        + it.format(rank="r.rank", join=" JOIN r2 r ON r.node = e.src")
        + f"""),
names AS (SELECT DISTINCT h, w FROM hx)
SELECT n.w AS token, CAST(r3.rank AS BIGINT) AS rank
FROM r3 JOIN names n ON n.h = r3.node
ORDER BY 2 DESC, 1 LIMIT {k}
"""
    )


def source_lang_purity() -> str:
    """Purity twin: exact (source, lang) counts, Gini = one division of
    HUGEINT-safe squares, majority by (count desc, lang) row_number."""
    return """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
s AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(n * n) AS BIGINT) AS ss
  FROM c GROUP BY 1),
m AS (
  SELECT source, lang, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
  FROM c)
SELECT s.source, s.nn AS n_docs,
       CAST(s.nn * s.nn - s.ss AS DOUBLE) / CAST(s.nn * s.nn AS DOUBLE)
         AS gini_impurity,
       m.lang AS majority_lang, m.n AS majority_n,
       CAST(m.n AS DOUBLE) / CAST(s.nn AS DOUBLE) AS majority_share
FROM s JOIN m ON m.source = s.source AND m.rn = 1
ORDER BY 1
"""


def source_ablation() -> str:
    """Ablation twin: exact integer partials, one division per mean,
    one subtraction per delta — the engine's chain verbatim."""
    return """
WITH p AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss FROM p)
SELECT p.source, p.n AS n_docs, p.s AS sum_chars,
       CAST(t.ss - p.s AS DOUBLE) / CAST(t.nn - p.n AS DOUBLE) AS mean_without,
       CAST(t.ss - p.s AS DOUBLE) / CAST(t.nn - p.n AS DOUBLE)
         - CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE) AS delta_vs_all
FROM p, t ORDER BY 1
"""


def cdc_chunks() -> str:
    """Content-defined chunking twin: rolling hash via lag windows with
    per-term mod-2^64 reduction (each multiplier < 2^62 keeps products
    HUGEINT-safe; summing the REDUCED terms matches numpy's uint64
    wraparound), gaps-and-islands chunk ids, rotate-XOR content hash
    through a generated powers-of-two table, bit_xor on the
    two's-complement view."""
    from geoglue_ray.functions.texthash import (
        C1,
        C4,
        C5,
        U64,
        sql_token_hash,
        sql_u64_to_bigint,
    )

    p2 = ", ".join(f"({r}, {1 << r}::HUGEINT)" for r in range(64))
    rot = f"((h * p2.v) % {U64}::HUGEINT + h // ({U64}::HUGEINT // p2.v))"
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, len(toks) AS n,
         list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
hx AS (SELECT doc_id, i, n, {sql_token_hash('w')} AS h FROM tok),
roll AS (
  SELECT doc_id, i, n, h,
         (h + ({C1}::HUGEINT * COALESCE(lag(h, 1) OVER win, 0::HUGEINT))
                % {U64}::HUGEINT
            + ({C4}::HUGEINT * COALESCE(lag(h, 2) OVER win, 0::HUGEINT))
                % {U64}::HUGEINT
            + ({C5}::HUGEINT * COALESCE(lag(h, 3) OVER win, 0::HUGEINT))
                % {U64}::HUGEINT) % {U64}::HUGEINT AS hh
  FROM hx WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
bnd AS (
  SELECT *, (i >= 4 AND hh % 8 = 0) OR i = n AS b FROM roll),
cid AS (
  SELECT doc_id, i, h, b,
         COALESCE(CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) OVER
           (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS chunk
  FROM bnd),
rr AS (
  SELECT doc_id, chunk, h,
         CAST((i - min(i) OVER (PARTITION BY doc_id, chunk)) % 64 AS BIGINT)
           AS r
  FROM cid),
rx AS (
  SELECT doc_id, chunk, {sql_u64_to_bigint(rot)} AS rotb
  FROM rr JOIN (VALUES {p2}) AS p2(r, v) USING (r)),
ch AS (
  SELECT doc_id, chunk, bit_xor(rotb) AS chash,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM rx GROUP BY 1, 2),
agg AS (
  SELECT chash, n_tokens, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM ch GROUP BY 1, 2)
SELECT chash, n_tokens, n_occurrences, n_docs
FROM agg WHERE n_occurrences >= 2
ORDER BY n_occurrences DESC, chash, n_tokens LIMIT 20
"""


def corpus_mix() -> str:
    """Temperature-mixing twin: per-language counts, q = one divide +
    one correctly-rounded sqrt, threshold = floor(q * 2^52) (integral
    double, exactly representable), admission on the top 52 hash bits."""
    from geoglue_ray.functions.texthash import sql_kmv_hash

    h52 = f"({sql_kmv_hash('doc_id')}) // 4096::HUGEINT"
    return f"""
WITH lc AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
mn AS (SELECT min(n) AS nmin FROM lc),
q AS (
  SELECT lang, n,
         sqrt(CAST(mn.nmin AS DOUBLE) / CAST(n AS DOUBLE)) AS q,
         CAST(floor(sqrt(CAST(mn.nmin AS DOUBLE) / CAST(n AS DOUBLE))
                    * 4503599627370496.0) AS BIGINT) AS thr
  FROM lc, mn),
adm AS (
  SELECT d.lang,
         CAST(count(*) FILTER (WHERE {h52} < q.thr::HUGEINT) AS BIGINT)
           AS n_admitted
  FROM documents d JOIN q USING (lang)
  GROUP BY 1)
SELECT q.lang, q.n AS n_docs, adm.n_admitted, q.q
FROM q JOIN adm USING (lang)
ORDER BY 1
"""


def incremental_dedup_embed() -> str:
    """Embedding admit-gate twin: the embed_neardup pair SQL (same
    bit-exact bucket/norm/dot chains, nbits=4, threshold 0.3) restricted
    to cross-split pairs, counted + max-cosined per arriving vector,
    left-joined so clean arrivals emit (0, NULL, false)."""
    from geoglue_ray.stages.similarity import rademacher_signs

    signs = rademacher_signs(_EMB_DIM, 4, seed=23)
    return f"""
WITH sig AS (
  SELECT vec_id, embedding,
         CAST({_bucket_expr('embedding', signs)} AS BIGINT) AS bucket,
         sqrt({_normsq_chain('embedding', _EMB_DIM)}) AS nrm
  FROM embeddings),
pairs AS (
  SELECT * FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ({_dot_chain('a.embedding', 'b.embedding', _EMB_DIM)})
             / (a.nrm * b.nrm) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
  WHERE cosine >= 0.3),
cr AS (
  SELECT CASE WHEN vec_a % 5 = 0 THEN vec_a ELSE vec_b END AS vec_id, cosine
  FROM pairs
  WHERE (vec_a % 5 = 0) <> (vec_b % 5 = 0)),
agg AS (
  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_embed_near,
         max(cosine) AS max_cosine
  FROM cr GROUP BY 1)
SELECT e.vec_id,
       COALESCE(agg.n_embed_near, 0) AS n_embed_near,
       agg.max_cosine AS max_cosine,
       COALESCE(agg.n_embed_near, 0) > 0 AS is_duplicate
FROM embeddings e LEFT JOIN agg USING (vec_id)
WHERE e.vec_id % 5 = 0
ORDER BY 1
"""


def embed_knn() -> str:
    return """
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       row_number() OVER (
         PARTITION BY a.vec_id
         ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
       ) AS rank
FROM embeddings a, embeddings b
WHERE a.vec_id IN (0, 1, 2, 3) AND b.vec_id != a.vec_id
QUALIFY rank <= 10
ORDER BY query_id, rank
"""


def events_zonal() -> str:
    return f"""
WITH c AS (
  SELECT event_id AS id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         floor(value) AS v,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c)
SELECT {fx.sql_admin2_name('a2')} AS admin_id,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(v) AS sum_val,
       min(v) AS min_val,
       max(v) AS max_val
FROM asg GROUP BY 1 ORDER BY 1
"""


def user_od_matrix() -> str:
    """OD-matrix twin: the events_zonal assignment CTE with user/ts
    carried through, first/last per user by two window ranks over the
    mirrored (ts, event_id) total order, integer user counts per
    (origin, destination)."""
    return f"""
WITH c AS (
  SELECT event_id, user_id, ts,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.user_id, c.ts, c.event_id,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c),
r AS (
  SELECT user_id, a2,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
  FROM asg),
od AS (
  SELECT f.a2 AS o, l.a2 AS d
  FROM r f JOIN r l ON l.user_id = f.user_id AND f.rf = 1 AND l.rl = 1)
SELECT {fx.sql_admin2_name('o')} AS origin_id,
       {fx.sql_admin2_name('d')} AS dest_id,
       count(*) AS n_users
FROM od GROUP BY 1, 2 ORDER BY 1, 2
"""


def dasymetric_events() -> str:
    """Dasymetric twin: the raster-cell admin CTE supplies both the cell
    lattice and (via its cen) the event assignment; per-admin ancillary
    mass and event totals join back to cells, with the engine's exact
    BIGINT product and single division."""
    return f"""
WITH {_raster_cells_cte()},
wc AS (
  SELECT cass.r, cass.c, cass.a2,
         CAST({fx.sql_weight('cells.lon', 'cells.lat')} AS BIGINT) AS w
  FROM cass JOIN cells ON cells.r = cass.r AND cells.c = cass.c),
ws AS (SELECT a2, SUM(w) AS wsum FROM wc GROUP BY 1),
e AS (
  SELECT event_id AS id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
asg AS (
  SELECT e.*,
         CASE WHEN e.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (e.lon-cen.gx)*(e.lon-cen.gx) + (e.lat-cen.gy)*(e.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('e.lon', 'e.lat')} END AS a2
  FROM e),
tot AS (SELECT a2, CAST(count(*) AS BIGINT) AS total FROM asg GROUP BY 1)
SELECT CAST(wc.r AS BIGINT) AS cell_row, CAST(wc.c AS BIGINT) AS cell_col,
       {fx.sql_admin2_name('wc.a2')} AS admin_id,
       CAST(wc.w AS BIGINT) AS w,
       CAST(COALESCE(tot.total, 0) * wc.w AS DOUBLE)
         / CAST(ws.wsum AS DOUBLE) AS alloc
FROM wc JOIN ws ON ws.a2 = wc.a2 LEFT JOIN tot ON tot.a2 = wc.a2
ORDER BY 1, 2
"""


def od_matrix() -> str:
    """OD twin: lag() over (ts, event_id) within user for the origin
    admin, integer trip counts and exact DISTINCT movers per pair."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT e.user_id, e.event_id, e.ts,
         CASE WHEN e.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (e.lon-cen.gx)*(e.lon-cen.gx) + (e.lat-cen.gy)*(e.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('e.lon', 'e.lat')} END AS a2
  FROM e),
p AS (
  SELECT user_id,
         lag(a2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS o,
         a2 AS d
  FROM asg)
SELECT {fx.sql_admin2_name('o')} AS o_admin,
       {fx.sql_admin2_name('d')} AS d_admin,
       CAST(count(*) AS BIGINT) AS n_trips,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM p WHERE o IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_contingency() -> str:
    """Chi-square contingency twin: the events_zonal admin assignment
    with event_type carried, window totals cast back to BIGINT (exact
    integer sums), and the exp/term float chain spelled with the same
    elementary operations in the same order as the numpy side."""
    return f"""
WITH c AS (
  SELECT event_id AS id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c),
counts AS (
  SELECT {fx.sql_admin2_name('a2')} AS admin_id, event_type,
         CAST(count(*) AS BIGINT) AS obs
  FROM asg GROUP BY 1, 2),
tots AS (
  SELECT admin_id, event_type, obs,
         CAST(SUM(obs) OVER (PARTITION BY admin_id) AS BIGINT) AS rt,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS ct,
         CAST(SUM(obs) OVER () AS BIGINT) AS tot
  FROM counts),
cells AS (
  SELECT admin_id, event_type, obs, rt, ct,
         CAST(rt AS DOUBLE) * ct / tot AS exp_cnt
  FROM tots)
SELECT admin_id, event_type, obs, rt, ct, exp_cnt,
       (obs - exp_cnt) * (obs - exp_cnt) / exp_cnt AS chi2_term
FROM cells ORDER BY 1, 2
"""


def events_lq() -> str:
    """Location-quotient twin: the contingency admin assignment on the
    admin-1 name, window totals, and the engine's two-ratio division
    chain (obs/rt) / (ct/tot)."""
    return f"""
WITH c AS (
  SELECT event_id AS id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c),
counts AS (
  SELECT {fx.sql_admin1_name('a2')} AS admin1_id, event_type,
         CAST(count(*) AS BIGINT) AS obs
  FROM asg GROUP BY 1, 2),
tots AS (
  SELECT admin1_id, event_type, obs,
         CAST(SUM(obs) OVER (PARTITION BY admin1_id) AS BIGINT) AS zone_total,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
         CAST(SUM(obs) OVER () AS BIGINT) AS tot
  FROM counts)
SELECT admin1_id, event_type, obs, zone_total, type_total,
       (CAST(obs AS DOUBLE) / CAST(zone_total AS DOUBLE))
         / (CAST(type_total AS DOUBLE) / CAST(tot AS DOUBLE)) AS lq
FROM tots ORDER BY 1, 2
"""


def events_ripley() -> str:
    """Ripley K/L twin: per-radius pair counts by prefiltered self-join,
    (area * pairs) / (n*(n-1)) in the engine's exact op order, L via
    the identical pi double literal — all deterministic single ops."""
    k = "(128.0 * CAST(p.n_pairs AS DOUBLE)) / CAST(n.n * (n.n - 1) AS DOUBLE)"
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
f AS (SELECT * FROM e
      WHERE lon >= 102.0 AND lon < 110.0 AND lat >= 8.0 AND lat < 24.0),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
rs AS (SELECT * FROM (VALUES (0.015625), (0.03125), (0.046875), (0.0625))
       t(r)),
p AS (
  SELECT rs.r, CAST(count(*) AS BIGINT) AS n_pairs
  FROM rs JOIN f a ON TRUE JOIN f b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - rs.r AND a.lon + rs.r
   AND b.lat BETWEEN a.lat - rs.r AND a.lat + rs.r
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= rs.r * rs.r
  GROUP BY 1)
SELECT p.r AS radius, p.n_pairs,
       {k} AS k_est,
       sqrt(({k}) / 3.141592653589793) AS l_est
FROM p, n ORDER BY 1
"""


def events_cross_k() -> str:
    """Cross-K twin: prefiltered A-x-B join per radius, (area * pairs) /
    (n_a * n_b) in the engine's op order, L via the identical pi
    literal."""
    k = "(128.0 * CAST(p.n_pairs AS DOUBLE)) / CAST(na.n * nb.n AS DOUBLE)"
    return f"""
WITH e AS (
  SELECT event_id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
f AS (SELECT * FROM e
      WHERE lon >= 102.0 AND lon < 110.0 AND lat >= 8.0 AND lat < 24.0),
fa AS (SELECT * FROM f WHERE event_type = 'purchase'),
fb AS (SELECT * FROM f WHERE event_type = 'view'),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fa),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fb),
rs AS (SELECT * FROM (VALUES (0.015625), (0.03125), (0.046875), (0.0625))
       t(r)),
p AS (
  SELECT rs.r, CAST(count(*) AS BIGINT) AS n_pairs
  FROM rs JOIN fa a ON TRUE JOIN fb b
    ON b.lon BETWEEN a.lon - rs.r AND a.lon + rs.r
   AND b.lat BETWEEN a.lat - rs.r AND a.lat + rs.r
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= rs.r * rs.r
  GROUP BY 1)
SELECT p.r AS radius, p.n_pairs,
       {k} AS k_ab,
       sqrt(({k}) / 3.141592653589793) AS l_ab
FROM p, na, nb ORDER BY 1
"""


def events_ripley_env() -> str:
    """CSR-envelope twin: the ripley observed pair counts, 8 simulated
    patterns regenerated from the same (sim, event_id) kmv_hash64
    HUGEINT chain (odd-numerator dyadic coordinates), per-(sim, radius)
    zero-filled pair counts, and the mirrored K / envelope / inside
    chain."""
    from geoglue_ray.functions import texthash as th
    k_obs = "(128.0 * CAST(p.n_pairs AS DOUBLE)) / CAST(n.n * (n.n - 1) AS DOUBLE)"
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
f AS (SELECT * FROM e
      WHERE lon >= 102.0 AND lon < 110.0 AND lat >= 8.0 AND lat < 24.0),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
rs AS (SELECT * FROM (VALUES (0.015625), (0.03125), (0.046875), (0.0625))
       t(r)),
p AS (
  SELECT rs.r, CAST(count(*) AS BIGINT) AS n_pairs
  FROM rs JOIN f a ON TRUE JOIN f b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - rs.r AND a.lon + rs.r
   AND b.lat BETWEEN a.lat - rs.r AND a.lat + rs.r
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= rs.r * rs.r
  GROUP BY 1),
hh AS (
  SELECT s.range AS s, f.event_id AS id,
         {th.sql_kmv_hash('s.range*4294967296 + f.event_id')} AS h
  FROM f CROSS JOIN range(8) s),
sims AS (
  SELECT s, id,
         102.0 + (2*CAST(h % 131072 AS BIGINT) + 1) * (8.0/262144.0) AS lon,
         8.0 + (2*CAST((h // 131072) % 32768 AS BIGINT) + 1)
           * (16.0/65536.0) AS lat
  FROM hh),
spd AS (
  SELECT a.s,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM sims a JOIN sims b
    ON b.s = a.s AND b.id <> a.id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
spw AS (
  SELECT spd.s,
         CAST(count(*) FILTER (WHERE d2 <= 0.015625*0.015625) AS BIGINT) AS p1,
         CAST(count(*) FILTER (WHERE d2 <= 0.03125*0.03125) AS BIGINT) AS p2,
         CAST(count(*) FILTER (WHERE d2 <= 0.046875*0.046875) AS BIGINT) AS p3,
         CAST(count(*) AS BIGINT) AS p4
  FROM spd GROUP BY 1),
spz AS (
  SELECT g.range AS s, rs.r,
         CASE rs.r WHEN 0.015625 THEN COALESCE(spw.p1, 0)
                   WHEN 0.03125 THEN COALESCE(spw.p2, 0)
                   WHEN 0.046875 THEN COALESCE(spw.p3, 0)
                   ELSE COALESCE(spw.p4, 0) END AS n_pairs
  FROM range(8) g CROSS JOIN rs LEFT JOIN spw ON spw.s = g.range),
ks AS (
  SELECT spz.r,
         (128.0 * CAST(spz.n_pairs AS DOUBLE)) / CAST(n.n * (n.n - 1) AS DOUBLE)
           AS k_sim
  FROM spz, n),
env AS (SELECT r, min(k_sim) AS k_lo, max(k_sim) AS k_hi FROM ks GROUP BY 1)
SELECT p.r AS radius, p.n_pairs,
       {k_obs} AS k_obs, env.k_lo, env.k_hi,
       env.k_lo <= {k_obs} AND {k_obs} <= env.k_hi AS inside_env
FROM p JOIN env ON env.r = p.r, n
ORDER BY 1
"""


def events_density() -> str:
    """Density-surface twin: edge-aligned floor bins, zero-filled full
    lattice by LEFT JOIN, 3x3 self-join smoothing with integer sums and
    the single-division mean."""
    return f"""
WITH e AS (
  SELECT {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
binned AS (
  SELECT CAST(floor((24.0625 - lat) / 0.25) AS BIGINT) AS r,
         CAST(floor((lon - 102.0) / 0.25) AS BIGINT) AS c
  FROM e
  WHERE floor((24.0625 - lat) / 0.25) BETWEEN 0 AND 63
    AND floor((lon - 102.0) / 0.25) BETWEEN 0 AND 32),
bc AS (SELECT r, c, count(*) AS cnt FROM binned GROUP BY 1, 2),
grid AS (
  SELECT g.r, g.c, CAST(COALESCE(bc.cnt, 0) AS DOUBLE) AS v
  FROM (SELECT rr.range AS r, cc.range AS c
        FROM range(64) rr, range(33) cc) g
  LEFT JOIN bc ON bc.r = g.r AND bc.c = g.c)
SELECT a.r AS cell_row, a.c AS cell_col,
       count(b.v) AS n_nb,
       sum(b.v) AS focal_sum,
       sum(b.v) / count(b.v) AS focal_mean
FROM grid a JOIN grid b
  ON b.r BETWEEN a.r - 1 AND a.r + 1
 AND b.c BETWEEN a.c - 1 AND a.c + 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_nn() -> str:
    """Radius-NN twin: self-join pre-filtered by the (necessary) per-axis
    radius bound, the exact d2 = dx*dx + dy*dy chain, inclusive
    d2 <= r*r (r a power of two, exact comparison), nearest by
    (d2, neighbour id) window rank, LEFT JOIN for isolated points."""
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
p AS (
  SELECT a.event_id, b.event_id AS nb,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
r AS (
  SELECT event_id, nb, sqrt(d2) AS dist,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, nb) AS rn
  FROM p)
SELECT e.event_id, r.nb AS nn_id, r.dist AS nn_dist
FROM e LEFT JOIN r ON r.event_id = e.event_id AND r.rn = 1
ORDER BY 1
"""


def events_knn() -> str:
    """k-NN-within-radius twin: the events_nn self-join construction,
    window rank over (d2, neighbour id) — matching the engine's stable
    argsort over id-sorted candidates — filtered to rank <= 3, INNER
    (isolated points emit no rows)."""
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
p AS (
  SELECT a.event_id, b.event_id AS nb,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
r AS (
  SELECT event_id, nb, sqrt(d2) AS dist,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, nb) AS rn
  FROM p)
SELECT event_id, rn AS "rank", nb AS nn_id, dist AS nn_dist
FROM r WHERE rn <= 3
ORDER BY 1, 2
"""


def events_triangles() -> str:
    """Triangle twin: oriented in-radius pair CTE (a < b), degree from
    both-endpoint counts, triangles by the triple self-join (wedge at
    the smallest node closed by the (v, w) edge), clustering as the
    single exact-int division with NULL below degree 2."""
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
p AS (
  SELECT a.event_id AS a, b.event_id AS b
  FROM e a JOIN e b
    ON b.event_id > a.event_id
   AND b.lon BETWEEN a.lon - 0.03125 AND a.lon + 0.03125
   AND b.lat BETWEEN a.lat - 0.03125 AND a.lat + 0.03125
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.03125 * 0.03125),
deg AS (
  SELECT id, count(*) AS degree
  FROM (SELECT a AS id FROM p UNION ALL SELECT b AS id FROM p)
  GROUP BY 1),
tri AS (
  SELECT p1.a AS u, p1.b AS v, p2.b AS w
  FROM p p1
  JOIN p p2 ON p2.a = p1.a AND p2.b > p1.b
  JOIN p p3 ON p3.a = p1.b AND p3.b = p2.b),
tc AS (
  SELECT id, count(*) AS n_tri
  FROM (SELECT u AS id FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri)
  GROUP BY 1)
SELECT e.event_id,
       COALESCE(deg.degree, 0) AS degree,
       COALESCE(tc.n_tri, 0) AS n_tri,
       CASE WHEN COALESCE(deg.degree, 0) >= 2
            THEN CAST(2 * COALESCE(tc.n_tri, 0) AS DOUBLE)
                 / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
            ELSE NULL END AS clustering
FROM e
LEFT JOIN deg ON deg.id = e.event_id
LEFT JOIN tc ON tc.id = e.event_id
ORDER BY 1
"""


def events_g() -> str:
    """G-function twin: the events_nn min-distance construction, then
    per-radius threshold counts on the SAME rounded sqrt values the
    engine compares (mirrored comparison, exact by construction)."""
    return f"""
WITH e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
p AS (
  SELECT a.event_id,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
mn AS (SELECT event_id, sqrt(min(d2)) AS nn_dist FROM p GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
rs AS (SELECT * FROM (VALUES (0.015625), (0.03125), (0.046875), (0.0625))
       t(r)),
c AS (
  SELECT rs.r,
         CAST(count(*) FILTER (WHERE mn.nn_dist <= rs.r) AS BIGINT) AS n_le
  FROM rs CROSS JOIN mn GROUP BY 1)
SELECT c.r AS radius, c.n_le, nn.n AS n_points,
       CAST(c.n_le AS DOUBLE) / CAST(nn.n AS DOUBLE) AS g_est
FROM c, nn ORDER BY 1
"""


def cell_nearest_event() -> str:
    """Two-table NN twin: raster cell centers joined to events inside the
    per-axis radius box, exact d2 chain, nearest by (d2, event id), LEFT
    JOIN for empty neighbourhoods."""
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE

    return f"""
WITH cells AS (
  SELECT r.range AS cr, c.range AS cc,
         {RXFIRST} + c.range*{RINC} AS lon,
         {RYFIRST} - r.range*{RINC} AS lat
  FROM range({RYSIZE}) r, range({RXSIZE}) c),
e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
p AS (
  SELECT cells.cr, cells.cc, e.event_id,
         (cells.lon-e.lon)*(cells.lon-e.lon)
           + (cells.lat-e.lat)*(cells.lat-e.lat) AS d2
  FROM cells JOIN e
    ON e.lon BETWEEN cells.lon - 0.25 AND cells.lon + 0.25
   AND e.lat BETWEEN cells.lat - 0.25 AND cells.lat + 0.25
  WHERE (cells.lon-e.lon)*(cells.lon-e.lon)
          + (cells.lat-e.lat)*(cells.lat-e.lat) <= 0.25 * 0.25),
r AS (
  SELECT cr, cc, event_id, sqrt(d2) AS dist,
         row_number() OVER (PARTITION BY cr, cc ORDER BY d2, event_id) AS rn
  FROM p)
SELECT CAST(cells.cr AS BIGINT) AS cell_row, CAST(cells.cc AS BIGINT) AS cell_col,
       r.event_id AS nn_event, r.dist AS nn_dist
FROM cells LEFT JOIN r ON r.cr = cells.cr AND r.cc = cells.cc AND r.rn = 1
ORDER BY 1, 2
"""


def events_dbscan() -> str:
    """DBSCAN twin: neighbour counts by pre-filtered self-join, core-core
    edges, recursive min-label closure (the dedup_clusters pattern),
    nearest-core border attachment by (d2, core id) window rank, noise =
    non-core with no core in range.  The dense city blob (id % 10 < 3) is
    excluded by id arithmetic: its single percolated component makes the
    recursive closure O(size^2) ~ 8M rows (244 s measured); the diffuse
    subset at eps = 1/16, min_pts = 2 yields 1108 small clusters
    (closure 7.4k pairs), 824 borders and 3602 noise points."""
    eps = 0.0625
    min_pts = 2
    box = (
        "b.lon BETWEEN a.lon - {e} AND a.lon + {e} "
        "AND b.lat BETWEEN a.lat - {e} AND a.lat + {e}"
    ).format(e=eps)
    d2 = "(a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)"
    return f"""
WITH RECURSIVE e AS (
  SELECT event_id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events
  WHERE event_id % 128 = 0 OR event_id % 10 >= 3),
nb AS (
  SELECT a.event_id, CAST(count(*) AS BIGINT) AS n
  FROM e a JOIN e b ON b.event_id <> a.event_id AND {box}
  WHERE {d2} <= {eps} * {eps}
  GROUP BY 1),
pts AS (
  SELECT e.event_id, e.lon, e.lat, COALESCE(nb.n, 0) AS n_nb
  FROM e LEFT JOIN nb ON nb.event_id = e.event_id),
cores AS (SELECT * FROM pts WHERE n_nb >= {min_pts}),
ed AS (
  SELECT a.event_id AS src, b.event_id AS dst
  FROM cores a JOIN cores b ON b.event_id <> a.event_id AND {box}
  WHERE {d2} <= {eps} * {eps}),
reach(node, lab) AS (
  SELECT event_id, event_id FROM cores
  UNION
  SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node),
cc AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY 1),
bj AS (
  SELECT a.event_id, b.event_id AS core_id,
         row_number() OVER (
             PARTITION BY a.event_id ORDER BY {d2}, b.event_id) AS rn
  FROM pts a JOIN cores b ON a.n_nb < {min_pts} AND {box}
  WHERE {d2} <= {eps} * {eps})
SELECT cc.node AS event_id, 'core' AS role, cc.cluster_id FROM cc
UNION ALL
SELECT bj.event_id, 'border', c2.cluster_id
FROM bj JOIN cc c2 ON c2.node = bj.core_id WHERE bj.rn = 1
UNION ALL
SELECT p.event_id, 'noise', CAST(NULL AS BIGINT)
FROM pts p
WHERE p.n_nb < {min_pts}
  AND p.event_id NOT IN (SELECT event_id FROM bj)
ORDER BY 1
"""


def user_stops() -> str:
    """Stay-point twin: lag() step over the (ts, event_id) order, island
    ids by cumulative break sum, centroids via the exact 2^-21 integer
    lattice (SUM of exact int64 lattice units, one rounded division, one
    exact power-of-two division)."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
s AS (
  SELECT *,
         lag(lon) OVER w AS plon,
         lag(lat) OVER w AS plat
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (
  SELECT *,
         CASE WHEN plon IS NULL
                OR (lon-plon)*(lon-plon) + (lat-plat)*(lat-plat) > 0.140625
              THEN 1 ELSE 0 END AS brk
  FROM s),
g AS (
  SELECT *,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM f)
SELECT user_id,
       CAST(sid AS BIGINT) AS stop_id,
       CAST(count(*) AS BIGINT) AS n_points,
       min(ts) AS t_start,
       max(ts) AS t_end,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell_us,
       CAST(SUM(CAST(lon * 2097152.0 AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 2097152.0 AS centroid_lon,
       CAST(SUM(CAST(lat * 2097152.0 AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 2097152.0 AS centroid_lat
FROM g
GROUP BY 1, 2
HAVING count(*) >= 3
ORDER BY 1, 2
"""


def retention_matrix() -> str:
    """Retention twin: min-day cohorts, DISTINCT (user, day) activity,
    the diagonal as cohort size, one division."""
    return """
WITH w AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 86400000000 AS day
  FROM events),
fw AS (SELECT user_id, min(day) AS cohort_day FROM w GROUP BY 1),
act AS (SELECT DISTINCT w.user_id, fw.cohort_day, w.day
        FROM w JOIN fw USING (user_id)),
m AS (SELECT cohort_day, day, CAST(count(*) AS BIGINT) AS n_users
      FROM act GROUP BY 1, 2),
cs AS (SELECT cohort_day, n_users AS cohort_size FROM m WHERE day = cohort_day)
SELECT m.cohort_day, m.day, m.n_users, cs.cohort_size,
       CAST(m.n_users AS DOUBLE) / CAST(cs.cohort_size AS DOUBLE)
         AS retention_rate
FROM m JOIN cs USING (cohort_day)
ORDER BY 1, 2
"""


def event_transitions() -> str:
    """Transition-matrix twin: lead() over the (ts, event_id) order,
    exact counts, window row totals, one division."""
    return """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
m AS (SELECT event_type AS from_type, nxt AS to_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
         AS row_total,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p
FROM m ORDER BY 1, 2
"""


def trajectory_hausdorff() -> str:
    """Hausdorff twin: point-pair d2 by join, the two directed maxima of
    per-point minima by nested GROUP BY, GREATEST for the symmetric
    distance — min/max of bit-exact d2 chains are order-free."""
    return f"""
WITH e AS (
  SELECT event_id, user_id AS u,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
qs AS (SELECT DISTINCT u FROM e ORDER BY 1 LIMIT 4),
qp AS (SELECT e.u AS qu, e.event_id AS qe, e.lon AS qlon, e.lat AS qlat
       FROM e JOIN qs ON qs.u = e.u),
pp AS (
  SELECT qp.qu, qp.qe, e.u AS cu, e.event_id AS ce,
         (qp.qlon - e.lon) * (qp.qlon - e.lon)
           + (qp.qlat - e.lat) * (qp.qlat - e.lat) AS d2
  FROM qp JOIN e ON e.u <> qp.qu),
ab AS (
  SELECT qu, cu, max(mn) AS h1
  FROM (SELECT qu, cu, qe, min(d2) AS mn FROM pp GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
ba AS (
  SELECT qu, cu, max(mn) AS h2
  FROM (SELECT qu, cu, ce, min(d2) AS mn FROM pp GROUP BY 1, 2, 3)
  GROUP BY 1, 2)
SELECT ab.qu AS query_user, ab.cu AS other_user,
       GREATEST(ab.h1, ba.h2) AS hausdorff_d2
FROM ab JOIN ba ON ba.qu = ab.qu AND ba.cu = ab.cu
ORDER BY 1, 2
"""


def events_benford() -> str:
    """Benford twin: leading digit by VARCHAR first character of the
    positive BIGINT value, the Python-computed log10 literals (same
    doubles as the engine), the mirrored expected/chi2 chain."""
    return """
WITH v AS (
  SELECT CAST(value * 100 AS BIGINT) AS v FROM events WHERE value > 0),
d AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM v),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
p AS (SELECT * FROM (VALUES (1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514)) t(digit, p))
SELECT p.digit, COALESCE(c.obs, 0) AS obs,
       CAST(n.n AS DOUBLE) * p.p AS expected,
       (COALESCE(c.obs, 0) - CAST(n.n AS DOUBLE) * p.p)
         * (COALESCE(c.obs, 0) - CAST(n.n AS DOUBLE) * p.p)
         / (CAST(n.n AS DOUBLE) * p.p) AS chi2_term
FROM p LEFT JOIN c ON c.digit = p.digit, n
ORDER BY 1
"""


def events_quadrat() -> str:
    """Quadrat-test twin: zero-filled 16x32 grid via range() cross join
    LEFT JOIN the binned counts; cleared-integer sample variance, then
    the engine's exact division chain (var/mean, (Q-1)*vmr)."""
    return f"""
WITH e AS (
  SELECT {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events),
b AS (
  SELECT CAST(floor((lat - 8.0) / 0.5) AS BIGINT) * 16
           + CAST(floor((lon - 102.0) / 0.5) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS cnt
  FROM e
  WHERE lon >= 102.0 AND lon < 110.0 AND lat >= 8.0 AND lat < 24.0
  GROUP BY 1),
g AS (SELECT range AS q FROM range(512)),
c AS (
  SELECT g.q, COALESCE(b.cnt, 0) AS cnt
  FROM g LEFT JOIN b ON b.q = g.q),
s AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS s,
         CAST(SUM(cnt*cnt) AS BIGINT) AS ss,
         CAST(MAX(cnt) AS BIGINT) AS mx
  FROM c),
p AS (
  SELECT s, ss, mx,
         CAST(s AS DOUBLE) / CAST(512 AS DOUBLE) AS mean_count,
         CAST(512 * ss - s * s AS DOUBLE)
           / CAST(512 * 511 AS DOUBLE) AS var_count
  FROM s)
SELECT s AS n_events, CAST(512 AS BIGINT) AS n_quadrats, mx AS max_count,
       mean_count, var_count, var_count / mean_count AS vmr,
       CAST(511 AS DOUBLE) * (var_count / mean_count) AS chi2
FROM p
"""


def events_knox() -> str:
    """Knox twin: exactly-once unordered pairs via b.id > a.id, the
    box-prefiltered spatial self-join and the banded temporal self-join;
    integer counts, then the engine's two single divisions (expected =
    S*T/C, ratio = st*C/(S*T)) with the int64 products cast once."""
    eps = 0.03125
    tau = 2 * 3_600_000_000
    d2 = "(a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)"
    return f"""
WITH e AS (
  SELECT event_id AS id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         epoch_us(ts) AS tu
  FROM events),
sp AS (
  SELECT CAST(count(*) AS BIGINT) AS pairs_space,
         CAST(count(*) FILTER (WHERE abs(a.tu - b.tu) <= {tau}) AS BIGINT)
           AS pairs_st
  FROM e a JOIN e b
    ON b.id > a.id
   AND b.lon BETWEEN a.lon - {eps} AND a.lon + {eps}
   AND b.lat BETWEEN a.lat - {eps} AND a.lat + {eps}
  WHERE {d2} <= {eps} * {eps}),
tm AS (
  SELECT CAST(count(*) AS BIGINT) AS pairs_time
  FROM e a JOIN e b
    ON b.id > a.id AND b.tu BETWEEN a.tu - {tau} AND a.tu + {tau}),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS total
  FROM e)
SELECT nn.n_events, sp.pairs_space, tm.pairs_time, sp.pairs_st,
       CAST(sp.pairs_space * tm.pairs_time AS DOUBLE)
         / CAST(nn.total AS DOUBLE) AS expected_st,
       CAST(sp.pairs_st * nn.total AS DOUBLE)
         / CAST(sp.pairs_space * tm.pairs_time AS DOUBLE) AS knox_ratio
FROM nn, sp, tm
"""


def events_mantel() -> str:
    """Mantel twin: box-prefiltered spatial self-join with the |dt|
    seconds sum riding it; all-pairs |dt| sum via the sorted rank
    identity sum(t*(2*rn - n - 1)) in one window pass (HUGEINT product,
    cast once); the engine's three mirrored divisions."""
    eps = 0.03125
    d2 = "(a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)"
    t0 = f"epoch_us({fx.T0_SQL})"
    return f"""
WITH e AS (
  SELECT event_id AS id,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         (epoch_us(ts) - {t0}) // 1000000 AS tsec
  FROM events),
sp AS (
  SELECT CAST(count(*) AS BIGINT) AS pairs_space,
         CAST(SUM(abs(a.tsec - b.tsec)) AS BIGINT) AS sum_dt_close
  FROM e a JOIN e b
    ON b.id > a.id
   AND b.lon BETWEEN a.lon - {eps} AND a.lon + {eps}
   AND b.lat BETWEEN a.lat - {eps} AND a.lat + {eps}
  WHERE {d2} <= {eps} * {eps}),
rk AS (
  SELECT tsec, row_number() OVER (ORDER BY tsec) AS rn,
         count(*) OVER () AS n
  FROM e),
al AS (
  SELECT CAST(SUM(CAST(tsec AS HUGEINT) * (2*rn - n - 1)) AS BIGINT)
           AS sum_dt_all,
         CAST(MAX(n) AS BIGINT) AS n_events,
         CAST(MAX(n) * (MAX(n) - 1) // 2 AS BIGINT) AS total
  FROM rk)
SELECT al.n_events, sp.pairs_space, sp.sum_dt_close, al.sum_dt_all,
       CAST(sp.sum_dt_close AS DOUBLE) / CAST(sp.pairs_space AS DOUBLE)
         AS mean_dt_close,
       CAST(al.sum_dt_all AS DOUBLE) / CAST(al.total AS DOUBLE)
         AS mean_dt_all,
       (CAST(sp.sum_dt_close AS DOUBLE) / CAST(sp.pairs_space AS DOUBLE))
         / (CAST(al.sum_dt_all AS DOUBLE) / CAST(al.total AS DOUBLE))
         AS mantel_ratio
FROM sp, al
"""


def colocation_quotient() -> str:
    """CLQ twin: the events_nn nearest-neighbour construction with types
    joined back, exact pair counts, and the engine's three-division
    chain (C/n_a) / (n_b'/(N-1))."""
    return f"""
WITH e AS (
  SELECT event_id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
p AS (
  SELECT a.event_id, b.event_id AS nb,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
r AS (
  SELECT event_id, nb,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, nb) AS rn
  FROM p),
x AS (
  SELECT ea.event_type AS type_a, eb.event_type AS type_b
  FROM r JOIN e ea ON ea.event_id = r.event_id
         JOIN e eb ON eb.event_id = r.nb
  WHERE r.rn = 1),
c AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_pairs
      FROM x GROUP BY 1, 2)
SELECT c.type_a, c.type_b, c.n_pairs,
       (CAST(c.n_pairs AS DOUBLE) / CAST(ta.n AS DOUBLE))
         / (CAST(tb.n - (CASE WHEN c.type_a = c.type_b THEN 1 ELSE 0 END)
                 AS DOUBLE)
            / CAST(tot.n - 1 AS DOUBLE)) AS clq
FROM c JOIN tc ta ON ta.event_type = c.type_a
       JOIN tc tb ON tb.event_type = c.type_b
       CROSS JOIN tot
ORDER BY 1, 2
"""


def _dispersion_sql(table: str, key: str, key_out: str) -> str:
    """Shared twin of stages/sketch.dispersion_stats: exact integer-
    scaled coordinate sums (HUGEINT, cast once), scaled means, float
    products, exact power-of-two descales — every op mirrored."""
    return f"""
WITH e AS (
  SELECT {key} AS k,
         CAST(({fx.sql_lon('event_id')} - 102.0) * 1048576.0 AS BIGINT) AS ix,
         CAST(({fx.sql_lat('event_id')} - 8.0) * 1048576.0 AS BIGINT) AS iy
  FROM {table}),
s AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(ix) AS BIGINT) AS sx, CAST(SUM(iy) AS BIGINT) AS sy,
         CAST(SUM(ix*ix) AS BIGINT) AS sxx, CAST(SUM(iy*iy) AS BIGINT) AS syy,
         CAST(SUM(ix*iy) AS BIGINT) AS sxy
  FROM e GROUP BY 1),
p AS (
  SELECT k, n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mxs,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mys,
         (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           / 1099511627776.0 AS var_x,
         (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
           / 1099511627776.0 AS var_y,
         (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
           / 1099511627776.0 AS cov_xy
  FROM s)
SELECT k AS {key_out}, n AS n_obs,
       102.0 + mxs / 1048576.0 AS mean_lon,
       8.0 + mys / 1048576.0 AS mean_lat,
       var_x, var_y, cov_xy,
       sqrt(GREATEST(var_x + var_y, 0.0)) AS rog
FROM p ORDER BY 1
"""


def user_gyration() -> str:
    """Radius-of-gyration twin — see _dispersion_sql."""
    return _dispersion_sql("events", "user_id", "user_id")


def events_sde() -> str:
    """Standard-deviational-ellipse twin — see _dispersion_sql."""
    return _dispersion_sql("events", "event_type", "event_type")


def skyline_orders() -> str:
    """Skyline twin: per-date max price, exclusive running max over
    earlier dates, dominance by window comparison (strictly-earlier
    cover >= price, or same-date strictly greater) — identical
    comparison semantics to stages/sample.skyline_2d."""
    return """
WITH o AS (
  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
g AS (
  SELECT o_orderdate AS d, max(o_totalprice) AS gm
  FROM o GROUP BY 1),
gp AS (
  SELECT d, gm,
         max(gm) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS m1
  FROM g)
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM o JOIN gp ON gp.d = o.o_orderdate
WHERE NOT (
  (gp.m1 IS NOT NULL AND gp.m1 >= o.o_totalprice)
  OR gp.gm > o.o_totalprice)
ORDER BY o.o_orderkey
"""


def user_trajectories() -> str:
    """Trajectory twin: row_number / lag windows over (ts, event_id)
    order per user; step distance via the engine's exact chain
    sqrt(dx*dx + dy*dy) on dyadic coordinates (never a scaled hypot)."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
w AS (
  SELECT user_id, event_id,
         row_number() OVER u AS seq,
         lon - lag(lon) OVER u AS dx,
         lat - lag(lat) OVER u AS dy
  FROM e WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id, seq, sqrt(dx*dx + dy*dy) AS step_dist
FROM w ORDER BY user_id, seq
"""


def embed_ivf_recall() -> str:
    """Recall claim for IVF kNN vs brute force (>= 0.6 mean)."""
    return """
SELECT i.range AS query_id, TRUE AS recall_ok FROM range(4) i ORDER BY 1
"""


def region_revenue() -> str:
    """lineitem -> supplier -> nation -> region revenue (Q5 shape); the
    floor of the single-multiply revenue makes sums order-independent."""
    return """
SELECT r.r_name,
       CAST(count(*) AS DOUBLE) AS n_items,
       sum(floor(l.l_extendedprice * (1.0 - l.l_discount))) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1 ORDER BY 1
"""


def brand_stats() -> str:
    return """
SELECT p.p_brand,
       CAST(count(*) AS DOUBLE) AS n_items,
       sum(floor(l.l_quantity)) AS sum_qty,
       sum(floor(l.l_extendedprice * (1.0 - l.l_discount))) AS revenue,
       min(floor(l.l_extendedprice)) AS min_price,
       max(floor(l.l_extendedprice)) AS max_price
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


def tile_pyramid() -> str:
    """Tile pyramid over events: re-encodes EVERY point at EVERY level
    (the engine rolls up aggregates via bit-shift parent() instead —
    two independent implementations of the pyramid invariant).  The
    cell arithmetic mirrors cells.encode exactly: f = (coord+off)/extent
    rounds once, * 2^level is an exact power-of-two scale, floor ==
    int64 truncation for non-negative values, clip after."""
    return f"""
WITH obs AS (
  SELECT {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         floor(value) AS v
  FROM events),
lv AS (SELECT 10 - i.range AS level FROM range(4) i)
SELECT lv.level,
       LEAST(GREATEST(CAST(floor((o.lon + 180.0) / 360.0 * (1::BIGINT << lv.level)) AS BIGINT), 0),
             (1::BIGINT << lv.level) - 1) AS cell_x,
       LEAST(GREATEST(CAST(floor((o.lat + 90.0) / 180.0 * (1::BIGINT << (lv.level - 1))) AS BIGINT), 0),
             (1::BIGINT << (lv.level - 1)) - 1) AS cell_y,
       CAST(count(*) AS DOUBLE) AS n_obs,
       sum(o.v) AS sum_val
FROM obs o, lv
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def split_assign() -> str:
    """Per-split doc count + char sum with the split assignment recomputed
    through the HUGEINT replica of int_hash64 (texthash contract)."""
    from geoglue_ray.functions.texthash import sql_int_hash

    return f"""
WITH h AS (
  SELECT n_chars, ({sql_int_hash('doc_id')}) % 10 AS b FROM documents)
SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS DOUBLE) AS n_docs,
       sum(floor(CAST(n_chars AS DOUBLE))) AS sum_measure
FROM h GROUP BY 1 ORDER BY 1
"""


def host_cap_docs(k: int = 25) -> str:
    """Per-host cap twin: row_number over (n_chars DESC, doc_id) per
    source — the same total order as the engine's offset sort key."""
    return f"""
SELECT source, doc_id, n_chars,
       CAST(row_number() OVER (
            PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
FROM documents
QUALIFY rank <= {k}
ORDER BY source, rank
"""


def stratified_sample(k: int = 20) -> str:
    """k-per-language hash-ordered sample; ordering on the unsigned
    HUGEINT hash matches the engine's uint64 sort, the emitted
    sample_key is the signed two's-complement view on both sides."""
    from geoglue_ray.functions.texthash import sql_int_hash, sql_u64_to_bigint

    return f"""
WITH h AS (
  SELECT lang, doc_id, ({sql_int_hash('doc_id')}) AS hh FROM documents)
SELECT lang, doc_id, {sql_u64_to_bigint('hh')} AS sample_key,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS BIGINT) AS rank
FROM h
QUALIFY rank <= {k}
ORDER BY lang, rank
"""


def copurchase_pairs(top_n: int = 50) -> str:
    """Co-occurrence twin: distinct (order, part), self-join with
    part1 < part2, exact counts, total-order cutoff (count desc, part
    pair) so the LIMIT boundary is deterministic."""
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS item1, b.l_partkey AS item2
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey)
SELECT item1, item2, CAST(count(*) AS BIGINT) AS n_baskets
FROM p GROUP BY 1, 2
ORDER BY n_baskets DESC, item1, item2
LIMIT {top_n}
"""


def weighted_sample_docs(k: int = 20) -> str:
    """Weighted-sample twin: the same ``kmv // weight`` HUGEINT priority,
    ranked per language on the unsigned value; the emitted sample_key is
    the signed two's-complement view on both sides."""
    from geoglue_ray.functions.texthash import sql_kmv_hash, sql_u64_to_bigint

    return f"""
WITH h AS (
  SELECT lang, doc_id, n_chars,
         ({sql_kmv_hash('doc_id')}) // n_chars::HUGEINT AS pri
  FROM documents)
SELECT lang, doc_id, n_chars, {sql_u64_to_bigint('pri')} AS sample_key,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS BIGINT) AS rank
FROM h
QUALIFY rank <= {k}
ORDER BY lang, rank
"""


def embed_neardup_recall() -> str:
    """Planted-pair recall claim for embedding near-dup: the engine must
    find >= 0.8 of the planted near-identical twins (and report the
    planted count = the corpus count)."""
    return """
SELECT CAST(count(*) AS BIGINT) AS n_planted, TRUE AS recall_ok FROM embeddings
"""


def quantiles_admin1() -> str:
    """Exact per-admin-1 quantiles: quantile_disc selects elements (no
    interpolation arithmetic — bit-safe), median averages the two middle
    integer-valued doubles (exact: sum < 2**17, /2 dyadic)."""
    return f"""{_assigned_cte()}
SELECT {fx.sql_admin1_name('a2')} AS admin1_id,
       CAST(count(*) AS DOUBLE) AS n_rows,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.75) AS p75,
       median(value) AS median_val
FROM asg GROUP BY 1 ORDER BY 1
"""


def gini_admin1() -> str:
    """Gini twin: row_number rank-weighted sum (tie permutations within
    an equal value leave sum(rn*v) unchanged, matching the engine's
    closed form), exact BIGINT chain, one double division."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id, CAST(value AS BIGINT) AS v FROM asg),
r AS (SELECT admin1_id, v,
             row_number() OVER (PARTITION BY admin1_id ORDER BY v) AS rn
      FROM g),
s AS (SELECT admin1_id,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(v) AS BIGINT) AS total,
             CAST(sum(rn * v) AS BIGINT) AS rsum
      FROM r GROUP BY 1)
SELECT admin1_id, n_obs, total,
       CAST(2 * rsum - (n_obs + 1) * total AS DOUBLE)
         / CAST(n_obs * total AS DOUBLE) AS gini
FROM s ORDER BY 1
"""


def majority_admin1() -> str:
    """Majority/minority/variety twin: per-(key, value) counts, two
    row_number windows with the same (count, value) total orders."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
h AS (SELECT {a1} AS admin1_id, value AS v, CAST(count(*) AS BIGINT) AS c
      FROM asg GROUP BY 1, 2),
r AS (SELECT admin1_id, v, c,
             row_number() OVER (PARTITION BY admin1_id ORDER BY c DESC, v) AS rj,
             row_number() OVER (PARTITION BY admin1_id ORDER BY c ASC, v) AS rn
      FROM h)
SELECT admin1_id,
       max(v) FILTER (rj = 1) AS majority_val,
       max(c) FILTER (rj = 1) AS majority_n,
       max(v) FILTER (rn = 1) AS minority_val,
       max(c) FILTER (rn = 1) AS minority_n,
       CAST(count(*) AS BIGINT) AS variety
FROM r GROUP BY 1 ORDER BY 1
"""


def diversity_admin1() -> str:
    """Diversity twin: per-(key,value) counts, cleared-denominator
    Simpson index, one division per statistic."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
h AS (SELECT {a1} AS admin1_id, value AS v, CAST(count(*) AS BIGINT) AS c
      FROM asg GROUP BY 1, 2),
s AS (SELECT admin1_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * c) AS BIGINT) AS sq,
             CAST(max(c) AS BIGINT) AS cmax,
             CAST(count(*) AS BIGINT) AS variety
      FROM h GROUP BY 1)
SELECT admin1_id, n AS n_obs, variety,
       CAST(n * n - sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS simpson,
       CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE) AS dominance
FROM s ORDER BY 1
"""


def trend_admin1() -> str:
    """OLS trend twin: x = observation hour (id % N_HOURS), exact BIGINT
    sums, cleared-denominator slope (one double division), intercept as
    the same fixed single-op chain the engine computes."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id,
             CAST(id % {fx.N_HOURS} AS BIGINT) AS x,
             CAST(value AS BIGINT) AS y
      FROM asg),
s AS (SELECT admin1_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM g GROUP BY 1),
t AS (SELECT admin1_id, n, sx, sy,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      FROM s)
SELECT admin1_id, n AS n_obs, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM t ORDER BY 1
"""


def covariance_admin1() -> str:
    """Comoment twin: exact BIGINT moment sums, cleared-denominator
    variance/covariance, one double division per statistic."""
    a1 = fx.sql_admin1_name("a2")
    w = fx.sql_weight("lon", "lat")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id, CAST(value AS BIGINT) AS x,
             CAST({w} AS BIGINT) AS y
      FROM asg),
s AS (SELECT admin1_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM g GROUP BY 1)
SELECT admin1_id, n AS n_obs,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
       CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_x,
       CAST(n * syy - sy * sy AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_y,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * n AS DOUBLE) AS cov_xy
FROM s ORDER BY 1
"""


def outliers_admin1() -> str:
    """Outlier twin: per-key exact moments, the denominator-cleared
    comparison in HUGEINT (an engine-side int64 overflow would redline
    here instead of passing), one division for the reported mean."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id, CAST(value AS BIGINT) AS v FROM asg),
s AS (SELECT admin1_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
      FROM g GROUP BY 1)
SELECT g.admin1_id,
       max(s.n) AS n_obs,
       CAST(max(s.sv) AS DOUBLE) / CAST(max(s.n) AS DOUBLE) AS mean_val,
       CAST(count(*) FILTER (
         (s.n::HUGEINT * g.v - s.sv) * (s.n::HUGEINT * g.v - s.sv)
           > 4::HUGEINT * (s.n::HUGEINT * s.svv - s.sv::HUGEINT * s.sv)
       ) AS BIGINT) AS n_outliers
FROM g JOIN s ON g.admin1_id = s.admin1_id
GROUP BY 1 ORDER BY 1
"""


def weighted_median_admin1() -> str:
    """Weighted-median twin: per-(admin1, value) weight histogram, window
    cumulative weights, smallest value with 2*cumw >= totw — all-integer
    comparisons."""
    w = fx.sql_weight("lon", "lat")
    return f"""{_assigned_cte()},
h AS (
  SELECT {fx.sql_admin1_name('a2')} AS admin1_id, value AS v, sum({w}) AS w
  FROM asg GROUP BY 1, 2),
cw AS (
  SELECT admin1_id, v,
         sum(w) OVER (PARTITION BY admin1_id ORDER BY v) AS cumw,
         sum(w) OVER (PARTITION BY admin1_id) AS totw
  FROM h)
SELECT admin1_id,
       CAST(max(totw) AS DOUBLE) AS total_w,
       min(v) FILTER (2 * cumw >= totw) AS wmedian
FROM cw GROUP BY 1 ORDER BY 1
"""


def curation_pipeline() -> str:
    """Replays the full curation chain serially: quality predicates ->
    minhash CTE over the filtered docs -> recursive component closure ->
    anti-join survivors -> int_hash64 split buckets."""
    from geoglue_ray.functions.texthash import sql_int_hash

    stop = ", ".join(f"'{s}'" for s in ("the", "a", "of", "and", "to"))
    return rf"""
WITH RECURSIVE q AS (
  SELECT doc_id, text, n_chars,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x IN ({stop}))) AS n_stopwords
  FROM documents),
filtered AS (
  SELECT doc_id, text, n_chars FROM q
  WHERE n_tokens >= 8 AND n_stopwords >= 1),
{_sql_minhash_cte(0.4, source="filtered")},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
  UNION ALL
  SELECT doc_b, doc_a FROM mh_pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
clus AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1),
surv AS (
  SELECT f.doc_id, f.n_chars FROM filtered f
  WHERE f.doc_id NOT IN (SELECT doc_id FROM clus WHERE cluster_id <> doc_id)),
h AS (
  SELECT n_chars, ({sql_int_hash('doc_id')}) % 10 AS b FROM surv)
SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS DOUBLE) AS n_docs,
       sum(floor(CAST(n_chars AS DOUBLE))) AS sum_measure
FROM h GROUP BY 1 ORDER BY 1
"""


def vocab_top() -> str:
    """Global top-20 (token, count): the oracle replays the explode +
    count serially; the strict total order (n DESC, token) makes the
    LIMIT deterministic on both sides."""
    return """
SELECT tok AS token, count(*) AS n
FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents)
GROUP BY 1 ORDER BY n DESC, token LIMIT 20
"""


def doc_repetition() -> str:
    """Per-doc repetition signals: distinct token hashes, top adjacent
    2-shingle multiplicity (same HUGEINT combine as the minhash CTE),
    repeated-token ratio as one exact-int division."""
    from geoglue_ray.functions.texthash import U64, sql_token_hash
    from geoglue_ray.stages.dedup import _SH_MUL1, _SH_MUL2

    m1, m2 = int(_SH_MUL1), int(_SH_MUL2)
    step1 = f"((a.h * {m1}::HUGEINT) % {U64}::HUGEINT)"
    step2 = f"((xor({step1}, b.h) * {m2}::HUGEINT) % {U64}::HUGEINT)"
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, {sql_token_hash('list_extract(toks, i.range::INTEGER)')} AS h
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
dist AS (SELECT doc_id, count(DISTINCT h) AS nd FROM tok GROUP BY 1),
bgc AS (
  SELECT a.doc_id, {step2} AS g, count(*) AS c
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS tb FROM bgc GROUP BY 1)
SELECT t.doc_id,
       len(t.toks)::BIGINT AS n_tokens,
       coalesce(d.nd, 0)::BIGINT AS n_distinct,
       coalesce(p.tb, 0)::BIGINT AS top_bigram_n,
       CAST(len(t.toks) - coalesce(d.nd, 0) AS DOUBLE) / len(t.toks) AS rep_ratio
FROM tl t LEFT JOIN dist d USING (doc_id) LEFT JOIN top p USING (doc_id)
ORDER BY 1
"""


def hopping_window() -> str:
    """2h-long / 1h-hop sliding windows: every event contributes to the
    two hour-aligned windows covering it; count + order-independent
    floored sum."""
    return """
SELECT w AS window_start, event_type,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(floor(value)) AS "sum"
FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS w,
             event_type, value
      FROM events)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def hopping_distinct_users() -> str:
    """Hopping-window distinct-count twin: the hopping_window unnest +
    COUNT(DISTINCT user_id) per window."""
    return """
SELECT w AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS w,
             user_id
      FROM events)
GROUP BY 1 ORDER BY 1
"""


def events_window_profile() -> str:
    """One-week slice profile twin: the WHERE window mirrors the
    engine's scan-level predicate pushdown; floored sums stay
    integer-valued doubles (order-independent)."""
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(floor(value)) AS sum_floor,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def winsorized_admin1() -> str:
    """Two-pass winsorized aggregate: per-admin-1 p25/p75 (quantile_disc
    — element selection, no interpolation) then the clipped sum/count.
    Clipped values stay integer-valued doubles, so the distributed sum is
    order-independent."""
    return f"""{_assigned_cte()},
base AS (SELECT {fx.sql_admin1_name('a2')} AS admin1_id, value FROM asg),
qt AS (SELECT admin1_id, quantile_disc(value, 0.25) AS lo,
              quantile_disc(value, 0.75) AS hi
       FROM base GROUP BY 1)
SELECT b.admin1_id,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(least(greatest(b.value, q.lo), q.hi)) AS "sum"
FROM base b JOIN qt q USING (admin1_id)
GROUP BY 1 ORDER BY 1
"""


def order_priority_revenue() -> str:
    """orders JOIN lineitem (big-big shuffle join in the engine, plain
    join here): per-priority line count + floored revenue sum."""
    return """
SELECT o_orderpriority,
       CAST(count(*) AS DOUBLE) AS "count",
       sum(floor(l_extendedprice * (1.0 - l_discount))) AS "sum"
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def value_rank_admin1() -> str:
    """Window-function RANK over the assigned corpus (engine computes it
    from a broadcast histogram, no row shuffle)."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()}
SELECT id AS doc_id, {a1} AS admin1_id, value,
       rank() OVER (PARTITION BY {a1} ORDER BY value) AS rank
FROM asg ORDER BY doc_id
"""


def tfidf_top_token() -> str:
    """Per-doc argmax TF-IDF token: tf * (N/df) — division before
    multiply, mirroring the engine's IEEE op order; QUALIFY replays the
    strict (score DESC, token ASC) tie-break."""
    return """
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, list_extract(toks, i.range::INTEGER) AS tok
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
s AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf AS DOUBLE) * (nn.nd / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df USING (tok), nn)
SELECT doc_id, tok AS top_token, score AS top_tfidf
FROM s
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) = 1
ORDER BY doc_id
"""


def dormant_customers() -> str:
    """Anti-join twin: customers with no order before the cutoff."""
    return """
SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS "count"
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate < TIMESTAMP '1995-03-01')
GROUP BY 1 ORDER BY 1
"""


def _sql_media_bytes_cte(kind: str) -> str:
    """Shared CTE: stub-decoded payload bytes WITH their position ``i``
    for the given span kind (same HUGEINT arithmetic as media_features)."""
    from geoglue_ray.functions.texthash import C1, C2, U64
    from geoglue_ray.stages.media import PAYLOAD_LEN

    return f"""
spans AS (
  SELECT d.doc_id,
         CAST(1 + j.range AS INTEGER) AS span_index,
         CASE WHEN (d.doc_id + 1 + j.range) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         'media/' || d.doc_id || '/' || (1 + j.range) AS media_ref
  FROM documents d, range(2) j
  WHERE 1 + j.range <= d.doc_id % 3),
seeds AS (
  SELECT s.doc_id, s.span_index,
         sum(ascii(substr(s.media_ref, c.range::INTEGER + 1, 1))) AS seed
  FROM spans s, range(40) c
  WHERE c.range < length(s.media_ref) AND s.kind = '{kind}'
  GROUP BY 1, 2),
bytes AS (
  SELECT doc_id, span_index, i.range AS i,
         ((((seed + 1)::HUGEINT * {C1}::HUGEINT
            + (i.range + 1)::HUGEINT * {C2}::HUGEINT) % {U64}::HUGEINT)
          // {1 << 56}::HUGEINT) AS byte
  FROM seeds, range({PAYLOAD_LEN}) i)
"""


def media_resize() -> str:
    """Block-mean resize replica: floor-of-integer-mean per 4-byte block
    over the recomputed stub payload."""
    from geoglue_ray.stages.media import PAYLOAD_LEN, RESIZE_FACTOR

    out_len = PAYLOAD_LEN // RESIZE_FACTOR
    return f"""
WITH {_sql_media_bytes_cte('image')},
pooled AS (
  SELECT doc_id, span_index, i // {RESIZE_FACTOR} AS j,
         sum(byte) // {RESIZE_FACTOR} AS pb
  FROM bytes GROUP BY 1, 2, 3)
SELECT doc_id, span_index,
       CAST({out_len} AS BIGINT) AS resized_len,
       CAST(sum(pb) AS BIGINT) AS resized_sum
FROM pooled GROUP BY 1, 2 ORDER BY 1, 2
"""


def media_frames() -> str:
    """Frame-sampling replica: per 8-byte frame sums, every 2nd frame."""
    from geoglue_ray.stages.media import FRAME_LEN, FRAME_STRIDE

    return f"""
WITH {_sql_media_bytes_cte('audio')},
fr AS (
  SELECT doc_id, span_index, CAST(i // {FRAME_LEN} AS INTEGER) AS frame_index,
         CAST(sum(byte) AS BIGINT) AS frame_sum
  FROM bytes GROUP BY 1, 2, 3)
SELECT doc_id, span_index, frame_index, frame_sum
FROM fr WHERE frame_index % {FRAME_STRIDE} = 0 ORDER BY 1, 2, 3
"""


def running_user_total() -> str:
    """Ordered-window running total per user (ties broken by event_id;
    floored values make the cumulative sums order-independent exact)."""
    return """
SELECT event_id, user_id, ts,
       sum(floor(value)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS running_sum
FROM events ORDER BY event_id
"""


def pivot_daily_events() -> str:
    """Wide pivot twin: conditional count per fixed category."""
    cases = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS DOUBLE) AS n_{c}"
        for c in ("click", "error", "purchase", "signup", "view")
    )
    return f"""
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       {cases}
FROM events GROUP BY 1 ORDER BY 1
"""


def heavy_hitters_check() -> str:
    """Exact top-10 user counts (strict (n desc, user) tie order) with
    the CMS bound asserted TRUE."""
    return """
SELECT user_id, CAST(n AS DOUBLE) AS n_events, TRUE AS within_bounds
FROM (SELECT user_id, count(*) AS n FROM events
      GROUP BY 1 ORDER BY n DESC, user_id LIMIT 10)
ORDER BY user_id
"""


def melt_daily_events() -> str:
    """Unpivot twin: one conditional-count SELECT per category, unioned."""
    selects = "\nUNION ALL\n".join(
        f"SELECT date_trunc('day', ts)::TIMESTAMP AS day, 'n_{c}' AS metric,\n"
        f"       CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS DOUBLE) AS n\n"
        f"FROM events GROUP BY 1"
        for c in ("click", "error", "purchase", "signup", "view")
    )
    return f"SELECT * FROM ({selects}) ORDER BY day, metric"


def zorder_events() -> str:
    """Morton interleave twin: the same magic-number spreading in BIGINT
    bit arithmetic (all intermediates < 2**63), over the tile-level-10
    cell encode the tile_pyramid oracle already replays."""
    def spread(e: str) -> str:
        s = f"({e} & 65535)"
        for sh, m in ((8, 0x00FF00FF00FF00FF), (4, 0x0F0F0F0F0F0F0F0F),
                      (2, 0x3333333333333333), (1, 0x5555555555555555)):
            s = f"((({s}) | (({s}) << {sh})) & {m})"
        return s

    lvl = 10
    return f"""
WITH pts AS (
  SELECT event_id,
         LEAST(GREATEST(CAST(floor(({fx.sql_lon('event_id')} + 180.0) / 360.0 * {1 << lvl}) AS BIGINT), 0), {(1 << lvl) - 1}) AS cell_x,
         LEAST(GREATEST(CAST(floor(({fx.sql_lat('event_id')} + 90.0) / 180.0 * {1 << (lvl - 1)}) AS BIGINT), 0), {(1 << (lvl - 1)) - 1}) AS cell_y
  FROM events)
SELECT event_id, cell_x, cell_y,
       ({spread('cell_x')}) | (({spread('cell_y')}) << 1) AS zkey
FROM pts ORDER BY event_id
"""


def hilbert_events() -> str:
    """Hilbert twin: recursive CTE replaying the iterative xy2d walk —
    per level accumulate s*s*((3*rx) XOR ry) and reflect/rotate the low
    bits (engine's ``& (s-1)`` spelled ``% s``); all intermediates are
    exact BIGINTs."""
    lvl = 10
    return f"""
WITH RECURSIVE pts AS (
  SELECT event_id,
         LEAST(GREATEST(CAST(floor(({fx.sql_lon('event_id')} + 180.0) / 360.0 * {1 << lvl}) AS BIGINT), 0), {(1 << lvl) - 1}) AS cell_x,
         LEAST(GREATEST(CAST(floor(({fx.sql_lat('event_id')} + 90.0) / 180.0 * {1 << (lvl - 1)}) AS BIGINT), 0), {(1 << (lvl - 1)) - 1}) AS cell_y
  FROM events),
h AS (
  SELECT event_id, CAST({1 << (lvl - 1)} AS BIGINT) AS s,
         cell_x AS x, cell_y AS y, CAST(0 AS BIGINT) AS d
  FROM pts
  UNION ALL
  SELECT event_id, s // 2,
         CASE WHEN (y & s) > 0 THEN x % s
              WHEN (x & s) > 0 THEN s - 1 - (y % s)
              ELSE y % s END,
         CASE WHEN (y & s) > 0 THEN y % s
              WHEN (x & s) > 0 THEN s - 1 - (x % s)
              ELSE x % s END,
         d + s * s * (CASE WHEN (x & s) > 0 AND (y & s) > 0 THEN 2
                           WHEN (x & s) > 0 THEN 3
                           WHEN (y & s) > 0 THEN 1
                           ELSE 0 END)
  FROM h WHERE s > 0)
SELECT p.event_id, p.cell_x, p.cell_y, h.d AS hkey
FROM pts p JOIN h ON h.event_id = p.event_id AND h.s = 0
ORDER BY 1
"""


def media_ref_parse() -> str:
    """regexp_extract twin over the exploded media spans."""
    return r"""
SELECT d.doc_id,
       CAST(1 + j.range AS INTEGER) AS span_index,
       CAST(regexp_extract('media/' || d.doc_id || '/' || (1 + j.range),
                           'media/(\d+)/(\d+)', 1) AS BIGINT) AS ref_doc,
       CAST(regexp_extract('media/' || d.doc_id || '/' || (1 + j.range),
                           'media/(\d+)/(\d+)', 2) AS INTEGER) AS ref_span
FROM documents d, range(2) j
WHERE 1 + j.range <= d.doc_id % 3
ORDER BY doc_id, span_index
"""


def inverted_index_docs(min_df: int = 2, max_df: int = 100) -> str:
    """Inverted-index twin: distinct (doc, token), string_agg ORDER BY
    doc_id (ascending decimal rendering matches str() exactly), df band."""
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT DISTINCT doc_id, list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks))
SELECT w AS token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY 1
HAVING count(*) BETWEEN {min_df} AND {max_df}
ORDER BY 1
"""


def bigram_stats(k: int = 100) -> str:
    """Bigram twin: positional token CTE (the decontaminate pattern),
    adjacency self-join, exact counts, one division, total-order LIMIT.
    Valid while docs have <= 127 tokens (shared with the minhash CTE)."""
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
bg AS (
  SELECT a.w AS tok1, b.w AS tok2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
c AS (SELECT tok1, tok2, CAST(count(*) AS BIGINT) AS n_pairs
      FROM bg GROUP BY 1, 2),
u AS (SELECT tok1, CAST(sum(n_pairs) AS BIGINT) AS n_first FROM c GROUP BY 1)
SELECT c.tok1, c.tok2, c.n_pairs, u.n_first,
       CAST(c.n_pairs AS DOUBLE) / CAST(u.n_first AS DOUBLE) AS cond_p
FROM c JOIN u USING (tok1)
ORDER BY n_pairs DESC, tok1, tok2 LIMIT {k}
"""


def doc_boilerplate(k: int = 500) -> str:
    """Boilerplate twin: the bigram positional CTE, the same total-order
    top-k cutoff, LEFT JOIN membership, one division per doc.  Valid
    while docs have <= 127 tokens and >= 2 (the bigram CTE caveats)."""
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
bg AS (
  SELECT a.doc_id, a.w AS tok1, b.w AS tok2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
c AS (SELECT tok1, tok2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
top AS (SELECT tok1, tok2 FROM c
        ORDER BY n DESC, tok1, tok2 LIMIT {k}),
d AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(count(top.tok1) AS BIGINT) AS n_top_hits
  FROM bg LEFT JOIN top
    ON top.tok1 = bg.tok1 AND top.tok2 = bg.tok2
  GROUP BY 1)
SELECT doc_id, n_bigrams, n_top_hits,
       CAST(n_top_hits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS boilerplate_frac
FROM d ORDER BY doc_id
"""


def decontaminate_docs() -> str:
    """Decontamination twin: the minhash CTE's 3-shingle HUGEINT combine,
    LEFT JOIN membership against the eval set's distinct-shingle set,
    one exact-integer division per doc.  Valid while every doc has >= 3
    tokens (all sf fixtures — the minhash oracle shares the caveat)."""
    from geoglue_ray.functions.texthash import U64, sql_token_hash
    from geoglue_ray.stages.dedup import _SH_MUL1, _SH_MUL2

    m1, m2 = int(_SH_MUL1), int(_SH_MUL2)
    step1 = f"((a.h * {m1}::HUGEINT) % {U64}::HUGEINT)"
    step2 = f"((xor({step1}, b.h) * {m2}::HUGEINT) % {U64}::HUGEINT)"
    step3 = f"((xor({step2}, c.h) * {m2}::HUGEINT) % {U64}::HUGEINT)"
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i,
         {sql_token_hash("list_extract(toks, i.range::INTEGER)")} AS h
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
sh AS (
  SELECT a.doc_id, {step3} AS x
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
bset AS (SELECT DISTINCT x FROM sh WHERE doc_id % 97 = 0),
m AS (
  SELECT sh.doc_id, count(*) AS n_shingles, count(bset.x) AS n_overlap
  FROM sh LEFT JOIN bset ON sh.x = bset.x GROUP BY 1)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       CAST(n_overlap AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS contam_frac,
       (CAST(n_overlap AS DOUBLE) / CAST(n_shingles AS DOUBLE)) > 0.5
         AS is_contaminated
FROM m ORDER BY doc_id
"""


def pack_documents() -> str:
    """Greedy-packing twin: the identical per-stratum recurrence as a
    recursive CTE stepping one row_number at a time."""
    return """
WITH RECURSIVE d AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents),
r AS (
  SELECT lang, doc_id, n_chars, rn,
         CAST(n_chars AS BIGINT) AS pack_fill, CAST(1 AS BIGINT) AS pack_id
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.lang, d.doc_id, d.n_chars, d.rn,
         CASE WHEN r.pack_fill + d.n_chars > 2048 THEN CAST(d.n_chars AS BIGINT)
              ELSE r.pack_fill + d.n_chars END,
         CASE WHEN r.pack_fill + d.n_chars > 2048 THEN r.pack_id + 1
              ELSE r.pack_id END
  FROM r JOIN d ON d.lang = r.lang AND d.rn = r.rn + 1)
SELECT doc_id, lang, n_chars, pack_id, pack_fill FROM r ORDER BY doc_id
"""


def time_weighted_user_value() -> str:
    """Interval-weighted mean twin: lead() over the same (ts, event_id)
    total order, whole-second dt, floored measure — exact integer sums,
    one division; single-event users yield NULL (engine NaN)."""
    return """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, CAST(floor(value) AS BIGINT) AS v,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t2
  FROM events),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum((t2 - t) // 1000000) AS BIGINT) AS den,
         CAST(sum(v * ((t2 - t) // 1000000)) AS BIGINT) AS num
  FROM e GROUP BY 1)
SELECT user_id, n_events,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS tw_mean
FROM s ORDER BY 1
"""


def user_event_paths() -> str:
    """Ordered collect-list twin: string_agg with the same TOTAL order
    (ts, event_id) the engine lexsorts by."""
    return """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


def customer_order_balance() -> str:
    """FULL OUTER join twin: every third customer vs 1996 per-customer
    order counts; COALESCE mirrors the engine's key-from-either-side."""
    return """
WITH l AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
r AS (
  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1)
SELECT COALESCE(l.c_custkey, r.o_custkey) AS c_custkey, l.c_mktsegment, r.n_orders
FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
ORDER BY 1
"""


def event_funnel() -> str:
    """Sequence-funnel twin: per-user first timestamps per stage, strict
    ordering between stages, global counts."""
    return """
WITH m AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
         min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY 1)
SELECT CAST(count(*) FILTER (tv IS NOT NULL) AS DOUBLE) AS n_view,
       CAST(count(*) FILTER (tv IS NOT NULL AND tc IS NOT NULL AND tc > tv)
            AS DOUBLE) AS n_click,
       CAST(count(*) FILTER (tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
                             AND tc > tv AND tp > tc) AS DOUBLE) AS n_purchase
FROM m
"""


def events_in_windows() -> str:
    """Two-table range-join twin: the identical o_orderkey -> window
    arithmetic in BIGINT microseconds, then a BETWEEN join and exact
    integer aggregates per priority."""
    epoch = 1704067200 * 1_000_000  # 2024-01-01T00:00:00 in us
    return f"""
WITH e AS (SELECT epoch_us(ts) AS e_ts, floor(value) AS v FROM events),
w AS (
  SELECT o_orderpriority AS pri,
         {epoch} + (o_orderkey % 720) * 3600000000 AS w_start,
         {epoch} + (o_orderkey % 720) * 3600000000
                 + (1 + o_orderkey % 48) * 3600000000 AS w_end
  FROM orders)
SELECT w.pri, CAST(count(*) AS DOUBLE) AS n_events, sum(e.v) AS sum_val
FROM e JOIN w ON e.e_ts BETWEEN w.w_start AND w.w_end
GROUP BY 1 ORDER BY 1
"""


def session_overlaps() -> str:
    """Interval self-join twin: the sessionize CTE extended with session
    ends, then the overlap predicate join restricted to distinct users,
    counted per day of the overlap start."""
    return """
WITH e AS (SELECT user_id, ts FROM events),
s AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
sess AS (
  SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
  FROM g GROUP BY user_id, sid)
SELECT date_trunc('day', greatest(a.s_start, b.s_start))::TIMESTAMP AS day,
       CAST(count(*) AS DOUBLE) AS n_overlaps
FROM sess a JOIN sess b
  ON a.user_id < b.user_id
 AND a.s_start <= b.s_end AND b.s_start <= a.s_end
GROUP BY 1 ORDER BY 1
"""


def value_share_by_type() -> str:
    """Ratio-to-report twin: one exact division of the floored value by
    its partition total."""
    return """
SELECT event_id, event_type, floor(value) AS v,
       floor(value) / sum(floor(value)) OVER (PARTITION BY event_type) AS share
FROM events ORDER BY event_id
"""


def user_growth() -> str:
    """Growth-curve twin: per-user first day, daily counts, window
    running sum."""
    return """
WITH f AS (SELECT user_id, date_trunc('day', min(ts))::TIMESTAMP AS day
           FROM events GROUP BY 1),
d AS (SELECT day, CAST(count(*) AS DOUBLE) AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_users
FROM d ORDER BY day
"""


def cohort_growth() -> str:
    """Per-type cohort twin: first day per (user, event_type), daily new
    counts, PARTITIONed window running sum — small-integer doubles, exact."""
    return """
WITH f AS (SELECT user_id, event_type, date_trunc('day', min(ts))::TIMESTAMP AS day
           FROM events GROUP BY 1, 2),
d AS (SELECT event_type, day, CAST(count(*) AS DOUBLE) AS new_users
      FROM f GROUP BY 1, 2)
SELECT event_type, day, new_users,
       sum(new_users) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum_users
FROM d ORDER BY event_type, day
"""


def raster_tri() -> str:
    """TRI twin: 8-direction neighbor join, per-cell sum/count of exact
    integer absolute differences (<=8 terms — any summation order is
    exact in doubles), one final division mirroring the engine."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, valid_time, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
dirs AS (
  SELECT * FROM (VALUES (0, 1), (1, 1), (1, 0), (1, -1),
                        (0, -1), (-1, -1), (-1, 0), (-1, 1))
    AS d(dr, dc)),
nb AS (
  SELECT a.valid_time, a.r, a.c, abs(b.value - a.value) AS ad
  FROM v a CROSS JOIN dirs d
  JOIN v b ON b.t = a.t AND b.r = a.r + d.dr AND b.c = a.c + d.dc)
SELECT valid_time, r AS cell_row, c AS cell_col,
       sum(ad) AS tri_sum,
       CAST(count(*) AS BIGINT) AS n_nb,
       sum(ad) / count(*) AS tri
FROM nb GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def raster_aspect() -> str:
    """Aspect twin: the gradient 4-join feeding the same ordered
    45-degree-sector CASE chain the engine's np.select evaluates — the
    engine's *2.0 gradient scaling cancels in every comparison."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
t2 AS (SELECT t, valid_time, r, c, value FROM rast
       WHERE variable = 't2m' AND t < 48 AND value IS NOT NULL),
g AS (
  SELECT a.valid_time, a.r, a.c,
         (e.value - w.value) AS gx,
         (n.value - s.value) AS gy
  FROM t2 a
  JOIN t2 e ON e.t = a.t AND e.r = a.r AND e.c = a.c + 1
  JOIN t2 w ON w.t = a.t AND w.r = a.r AND w.c = a.c - 1
  JOIN t2 n ON n.t = a.t AND n.r = a.r - 1 AND n.c = a.c
  JOIN t2 s ON s.t = a.t AND s.r = a.r + 1 AND s.c = a.c)
SELECT valid_time, r AS cell_row, c AS cell_col,
       CAST(CASE WHEN gx > 0 AND gy >= 0 AND gx > gy THEN 0
                 WHEN gx > 0 AND gy >= gx THEN 1
                 WHEN gx <= 0 AND gy > 0 AND gy > -gx THEN 2
                 WHEN gy > 0 AND -gx >= gy THEN 3
                 WHEN gx < 0 AND gy <= 0 AND -gx > -gy THEN 4
                 WHEN gx < 0 AND -gy >= -gx THEN 5
                 WHEN gx >= 0 AND gy < 0 AND -gy > gx THEN 6
                 WHEN gx > 0 AND gy < 0 THEN 7
                 ELSE -1 END AS BIGINT) AS aspect_oct
FROM g ORDER BY 1, 2, 3
"""


def raster_viewshed() -> str:
    """Line-of-sight twin: observer = min existing column per (t, row);
    a cell is visible iff no intervening existing cell's
    cross-multiplied sight slope reaches its own (exact integer-valued
    products; null cells transparent).  The observer cell is visible."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, valid_time, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 24),
o AS (SELECT t, r, min(c) AS obs FROM v GROUP BY 1, 2),
vo AS (
  SELECT o.t, o.r, o.obs, b.value AS v_obs
  FROM o JOIN v b ON b.t = o.t AND b.r = o.r AND b.c = o.obs)
SELECT a.valid_time, a.r AS cell_row, a.c AS cell_col,
       CAST(vo.obs AS BIGINT) AS obs_col,
       (a.c = vo.obs OR NOT EXISTS (
          SELECT 1 FROM v m
          WHERE m.t = a.t AND m.r = a.r AND m.c > vo.obs AND m.c < a.c
            AND (a.value - vo.v_obs) * (m.c - vo.obs)
                <= (m.value - vo.v_obs) * (a.c - vo.obs))) AS visible
FROM v a JOIN vo ON vo.t = a.t AND vo.r = a.r
ORDER BY 1, 2, 3
"""


def events_hull() -> str:
    """Convex-hull twin by edge witness: (a, b) is a CCW hull edge iff
    every other distinct point is strictly left of it OR collinear and
    strictly between the endpoints; vertices = edge sources.  Cross and
    dot products of dyadic coordinate differences are exact in doubles
    (<= 50 bits), mirroring the engine's chain tests."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    cross = "(b.lon - a.lon)*(c.lat - a.lat) - (b.lat - a.lat)*(c.lon - a.lon)"
    return f"""
WITH p AS (
  SELECT DISTINCT event_type, {lon} AS lon, {lat} AS lat
  FROM events WHERE event_id % 13 = 0),
e AS (
  SELECT a.event_type, a.lon AS alon, a.lat AS alat
  FROM p a JOIN p b
    ON b.event_type = a.event_type AND (b.lon != a.lon OR b.lat != a.lat)
  WHERE NOT EXISTS (
    SELECT 1 FROM p c
    WHERE c.event_type = a.event_type
      AND (c.lon != a.lon OR c.lat != a.lat)
      AND (c.lon != b.lon OR c.lat != b.lat)
      AND NOT ({cross} > 0
        OR ({cross} = 0
            AND (c.lon - a.lon)*(b.lon - a.lon)
                + (c.lat - a.lat)*(b.lat - a.lat) > 0
            AND (c.lon - b.lon)*(a.lon - b.lon)
                + (c.lat - b.lat)*(a.lat - b.lat) > 0))))
SELECT DISTINCT event_type, alon AS lon, alat AS lat FROM e
ORDER BY 1, 2, 3
"""


def traj_simplify(eps_area: int = 1 << 41) -> str:
    """Douglas-Peucker twin: recursive-CTE segment splitting at the
    interior point of largest |cross| (ties to the smallest seq) while
    it exceeds eps_area; retained vertices = every segment endpoint
    ever produced plus each user's trajectory bounds.  All arithmetic
    in BIGINT over the same integer-scaled coordinates."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")

    def cr(k: str) -> str:
        return (
            f"abs((b.x - a.x)*({k}.y - a.y) - (b.y - a.y)*({k}.x - a.x))"
        )

    return f"""
WITH RECURSIVE pts AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS seq,
         CAST({lon} * 1048576.0 AS BIGINT) AS x,
         CAST({lat} * 262144.0 AS BIGINT) AS y
  FROM events),
bounds AS (SELECT user_id, min(seq) AS mn, max(seq) AS mx
           FROM pts GROUP BY 1),
seg (user_id, i, j) AS (
  SELECT user_id, mn, mx FROM bounds WHERE mx > mn
  UNION ALL
  SELECT s.user_id,
         CASE w.side WHEN 0 THEN s.i ELSE k.seq END,
         CASE w.side WHEN 0 THEN k.seq ELSE s.j END
  FROM seg s
  JOIN pts a ON a.user_id = s.user_id AND a.seq = s.i
  JOIN pts b ON b.user_id = s.user_id AND b.seq = s.j
  JOIN pts k ON k.user_id = s.user_id AND k.seq > s.i AND k.seq < s.j
  CROSS JOIN (VALUES (0), (1)) w(side)
  WHERE {cr('k')} > {eps_area}
    AND NOT EXISTS (
      SELECT 1 FROM pts k2
      WHERE k2.user_id = s.user_id AND k2.seq > s.i AND k2.seq < s.j
        AND ({cr('k2')} > {cr('k')}
             OR ({cr('k2')} = {cr('k')} AND k2.seq < k.seq)))),
kept AS (
  -- DISTINCT over a UNION ALL: DuckDB's plain UNION fails to dedup
  -- across two references to a recursive CTE (measured: one duplicate
  -- per user), so dedup explicitly
  SELECT DISTINCT user_id, seq FROM (
    SELECT user_id, i AS seq FROM seg
    UNION ALL SELECT user_id, j FROM seg
    UNION ALL SELECT user_id, mn FROM bounds
    UNION ALL SELECT user_id, mx FROM bounds))
SELECT p.user_id, CAST(p.seq AS BIGINT) AS seq, p.event_id
FROM kept kk JOIN pts p ON p.user_id = kk.user_id AND p.seq = kk.seq
ORDER BY 1, 2
"""


def raster_focal_mode() -> str:
    """Focal mode twin: per-cell 3x3 neighbor group, value counts
    ranked (count DESC, value ASC) — the engine's exact tie rule."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
nb AS (
  SELECT a.valid_time, a.r, a.c, b.value
  FROM rast a JOIN rast b
    ON b.t = a.t AND b.variable = a.variable
   AND b.r BETWEEN a.r - 1 AND a.r + 1
   AND b.c BETWEEN a.c - 1 AND a.c + 1
   AND b.value IS NOT NULL
  WHERE a.variable = 't2m' AND a.t < 24),
cnt AS (
  SELECT valid_time, r, c, value, count(*) AS k
  FROM nb GROUP BY 1, 2, 3, 4),
tot AS (
  SELECT valid_time, r, c, CAST(sum(k) AS BIGINT) AS n_nb
  FROM cnt GROUP BY 1, 2, 3),
pick AS (
  SELECT valid_time, r, c, value,
         row_number() OVER (PARTITION BY valid_time, r, c
                            ORDER BY k DESC, value ASC) AS rn
  FROM cnt)
SELECT p.valid_time, p.r AS cell_row, p.c AS cell_col,
       t.n_nb, p.value AS focal_mode
FROM pick p JOIN tot t
  ON t.valid_time = p.valid_time AND t.r = p.r AND t.c = p.c
WHERE p.rn = 1
ORDER BY 2, 3, 1
"""


def traj_crossings() -> str:
    """Segment-crossing twin: per-user city segments by lead() window,
    all cross-user pairs, four BIGINT orientation tests with the
    strictly-opposite-signs predicate (touching/collinear excluded)."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")

    def orient(ax, ay, bx, by, px, py):
        return (
            f"(({bx}) - ({ax})) * (({py}) - ({ay}))"
            f" - (({by}) - ({ay})) * (({px}) - ({ax}))"
        )

    o1 = orient("a.x1", "a.y1", "a.x2", "a.y2", "b.x1", "b.y1")
    o2 = orient("a.x1", "a.y1", "a.x2", "a.y2", "b.x2", "b.y2")
    o3 = orient("b.x1", "b.y1", "b.x2", "b.y2", "a.x1", "a.y1")
    o4 = orient("b.x1", "b.y1", "b.x2", "b.y2", "a.x2", "a.y2")
    return f"""
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST({lon} * 1048576.0 AS BIGINT) AS x,
         CAST({lat} * 262144.0 AS BIGINT) AS y
  FROM events WHERE event_id % 128 != 0 AND event_id % 10 < 3),
s AS (
  SELECT user_id, x AS x1, y AS y1,
         lead(x) OVER w AS x2, lead(y) OVER w AS y2
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
seg AS (SELECT * FROM s WHERE x2 IS NOT NULL)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       count(*) AS n_crossings
FROM seg a JOIN seg b ON a.user_id < b.user_id
WHERE ((({o1}) > 0 AND ({o2}) < 0) OR (({o1}) < 0 AND ({o2}) > 0))
  AND ((({o3}) > 0 AND ({o4}) < 0) OR (({o3}) < 0 AND ({o4}) > 0))
GROUP BY 1, 2
ORDER BY 1, 2
"""


def raster_gapfill() -> str:
    """Row gap-fill twin: nearest existing west/east columns by two
    cumulative windows, then the identical left-associated
    interpolation chain (exact integer numerator, one division)."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
s AS (
  SELECT t, valid_time, r, c, value
  FROM rast WHERE variable = 't2m' AND t < 48),
w AS (
  SELECT t, valid_time, r, c, value,
         max(CASE WHEN value IS NOT NULL THEN c END)
           OVER (PARTITION BY t, r ORDER BY c) AS cw,
         min(CASE WHEN value IS NOT NULL THEN c END)
           OVER (PARTITION BY t, r ORDER BY c DESC) AS ce
  FROM s)
SELECT w.valid_time, w.r AS cell_row, w.c AS cell_col,
       vw.value + (ve.value - vw.value) * (w.c - w.cw) / (w.ce - w.cw)
         AS filled
FROM w
JOIN s vw ON vw.t = w.t AND vw.r = w.r AND vw.c = w.cw
JOIN s ve ON ve.t = w.t AND ve.r = w.r AND ve.c = w.ce
WHERE w.value IS NULL AND w.cw IS NOT NULL AND w.ce IS NOT NULL
ORDER BY 1, 2, 3
"""


def raster_ewma() -> str:
    """EWMA twin: recursive CTE replaying e_t = (x_t + e_{t-1}) / 2.0
    step by step — the identical correctly-rounded chain (fixture holes
    are static, so every surviving cell's series is hour-contiguous)."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH RECURSIVE rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
b AS (SELECT r, c, min(t) AS t0 FROM v GROUP BY 1, 2),
e (t, r, c, ew) AS (
  SELECT b.t0, b.r, b.c, v.value
  FROM b JOIN v ON v.t = b.t0 AND v.r = b.r AND v.c = b.c
  UNION ALL
  SELECT e.t + 1, e.r, e.c, (v.value + e.ew) / 2.0
  FROM e JOIN v ON v.r = e.r AND v.c = e.c AND v.t = e.t + 1)
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * t AS valid_time,
       r AS cell_row, c AS cell_col, ew AS ewma
FROM e ORDER BY 2, 3, 1
"""


def raster_isotonic() -> str:
    """Isotonic twin: interval means from inclusive prefix sums (one
    division of exact integers), suffix cummin window over k, group max
    over j — the max-min isotonic formula, op-for-op."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, r, c, value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 24),
p AS (
  SELECT t, r, c, value,
         sum(value) OVER (PARTITION BY r, c ORDER BY t) AS ps
  FROM v),
iv AS (
  SELECT a.r, a.c, a.t AS j, b.t AS k,
         (b.ps - a.ps + a.value) / (b.t - a.t + 1) AS m
  FROM p a JOIN p b ON b.r = a.r AND b.c = a.c AND b.t >= a.t),
mm AS (
  SELECT r, c, j, k AS i,
         min(m) OVER (PARTITION BY r, c, j ORDER BY k DESC) AS mn
  FROM iv)
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * i AS valid_time,
       r AS cell_row, c AS cell_col, max(mn) AS fitted
FROM mm GROUP BY i, r, c
ORDER BY 2, 3, 1
"""


def raster_rolling_median() -> str:
    """Rolling-median twin: DuckDB window median over the identical
    centered shrinking frame."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT valid_time, r AS cell_row, c AS cell_col,
       median(value) OVER (PARTITION BY r, c ORDER BY t
                           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
         AS roll_median
FROM rast
WHERE variable = 't2m' AND value IS NOT NULL AND t < 48
ORDER BY 2, 3, 1
"""


def user_colocation() -> str:
    """Co-location Jaccard twin: distinct (user, 1/64-degree cell)
    pairs, shared-cell counts by self-join, set sizes by group, one
    exact integer division per pair."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH uc AS (
  SELECT DISTINCT user_id,
         CAST(floor({lon} * 64.0) AS BIGINT) * 65536
           + CAST(floor({lat} * 64.0) AS BIGINT) AS cell
  FROM events),
sz AS (SELECT user_id, count(*) AS n FROM uc GROUP BY 1),
sh AS (
  SELECT a.user_id AS key_a, b.user_id AS key_b, count(*) AS n_shared
  FROM uc a JOIN uc b ON b.cell = a.cell AND b.user_id > a.user_id
  GROUP BY 1, 2)
SELECT sh.key_a, sh.key_b, sh.n_shared,
       sh.n_shared / (sa.n + sb.n - sh.n_shared) AS jaccard
FROM sh
JOIN sz sa ON sa.user_id = sh.key_a
JOIN sz sb ON sb.user_id = sh.key_b
ORDER BY 1, 2
"""


def events_funnel_chained() -> str:
    """Funnel twin: chained min-joins — stage k's reach time is the
    earliest stage-k event strictly after the stage-(k-1) reach."""
    return """
WITH t1 AS (SELECT user_id, min(ts) AS ts FROM events
            WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(e.ts) AS ts FROM events e
       JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.ts
       WHERE e.event_type = 'click' GROUP BY 1),
t3 AS (SELECT e.user_id, min(e.ts) AS ts FROM events e
       JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.ts
       WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS funnel_stage, count(*) AS n_users FROM t1
  UNION ALL SELECT 2, count(*) FROM t2
  UNION ALL SELECT 3, count(*) FROM t3)
ORDER BY 1
"""


def events_ntile(n_tiles: int = 4) -> str:
    """NTILE twin: the native window function over the identical
    (ts, id) order."""
    return f"""
SELECT user_id, event_id,
       CAST(ntile({n_tiles}) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS tile
FROM events ORDER BY 1, 2
"""


def events_dod() -> str:
    """Day-over-day twin: daily counts, lag window, exact integer delta
    and one division for the percent change."""
    return """
WITH d AS (
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, day, n AS n_events,
       n - lag(n) OVER w AS delta,
       (n - lag(n) OVER w) / lag(n) OVER w AS pct_change
FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY 1, 2
"""


def events_debounce(window_s: int = 300) -> str:
    """Debounce twin: keep an event iff NO same-(user, type) event lies
    in the preceding window (ts ties break by event_id)."""
    return f"""
SELECT user_id, event_id, ts, event_type
FROM events a
WHERE NOT EXISTS (
  SELECT 1 FROM events b
  WHERE b.user_id = a.user_id AND b.event_type = a.event_type
    AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))
    AND date_diff('microsecond', b.ts, a.ts) <= {window_s} * 1000000)
ORDER BY event_id
"""


def orders_cube() -> str:
    """CUBE twin: native GROUP BY CUBE with the 'ALL' sentinel for
    rolled key levels; measures are sums of exact floored integers."""
    return """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(count(*) AS DOUBLE) AS n_orders,
       CAST(sum(floor(o_totalprice)) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY 1, 2
"""


def raster_histeq() -> str:
    """Histogram-equalization twin: empirical CDF via a cumulative
    window over per-value counts (one division per distinct value),
    joined back to every cell."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT valid_time, r, c, CAST(value AS BIGINT) AS val
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
h AS (SELECT val, count(*) AS cnt FROM v GROUP BY 1),
cd AS (
  SELECT val,
         CAST(sum(cnt) OVER (ORDER BY val) AS DOUBLE)
           / CAST((SELECT sum(cnt) FROM h) AS DOUBLE) AS cdf
  FROM h)
SELECT v.valid_time, v.r AS cell_row, v.c AS cell_col, cd.cdf
FROM v JOIN cd ON cd.val = v.val
ORDER BY 1, 2, 3
"""


def traj_density() -> str:
    """DDA line-raster twin: lag window forms city segments, lateral
    ``generate_series(0, n)`` walks each segment's n+1 DDA steps with
    the engine's exact non-negative integer arithmetic (``//`` only on
    non-negative numerators — DuckDB truncation == numpy floor there)."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(({lon} - 105.0) * 64.0) AS BIGINT) AS cx,
         CAST(floor(({lat} - 10.0) * 64.0) AS BIGINT) AS cy
  FROM events
  WHERE event_id % 128 <> 0 AND event_id % 10 < 3),
s AS (
  SELECT lag(cx) OVER u AS ax, lag(cy) OVER u AS ay, cx AS bx, cy AS by_
  FROM e WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT ax, ay, bx, by_,
         greatest(abs(bx - ax), abs(by_ - ay)) AS n
  FROM s WHERE ax IS NOT NULL),
v AS (
  SELECT CASE WHEN n = 0 THEN ax ELSE (ax * (n - k) + bx * k) // n END AS cell_x,
         CASE WHEN n = 0 THEN ay ELSE (ay * (n - k) + by_ * k) // n END AS cell_y
  FROM g, unnest(generate_series(0, n)) AS t(k))
SELECT cell_x, cell_y, count(*) AS n_visits
FROM v GROUP BY 1, 2 ORDER BY cell_x, cell_y
"""


def cost_distance() -> str:
    """k=6 chained 3x3 min-join CTEs: entering a cell costs that cell's
    integer value, sources are value % 89 == 0, null holes excluded
    from the base — every distance is a sum of <= 6 integers < 997,
    exact in DOUBLE, mirroring the engine's fmin relaxation."""
    from geoglue_ray.sources.raster import sql_raster_cte

    step = """
d{i} AS (
  SELECT b.r, b.c, b.cost,
         min(CASE WHEN n.r = b.r AND n.c = b.c THEN n.d
                  ELSE n.d + b.cost END) AS d
  FROM d{j} b JOIN d{j} n
    ON n.r BETWEEN b.r - 1 AND b.r + 1 AND n.c BETWEEN b.c - 1 AND b.c + 1
  GROUP BY b.r, b.c, b.cost)"""
    rounds = ",".join(step.format(i=i, j=i - 1) for i in range(1, 7))
    return f"""
WITH rast AS ({sql_raster_cte()}),
base AS (
  SELECT r, c, value AS cost
  FROM rast WHERE variable = 't2m' AND t = 0 AND value IS NOT NULL),
d0 AS (
  SELECT r, c, cost,
         CASE WHEN CAST(cost AS BIGINT) % 89 = 0 THEN 0.0 END AS d
  FROM base),{rounds}
SELECT r AS cell_row, c AS cell_col, CAST(d AS DOUBLE) AS cost_dist
FROM d6 WHERE d IS NOT NULL ORDER BY cell_row, cell_col
"""


def bpe_merges(rounds: int = 4) -> str:
    """Chained BPE-round CTEs: each round counts adjacent pairs of the
    current |-delimited token strings (lateral generate_series over the
    split list), picks the (count desc, tok1, tok2) argmax, and rewrites
    via replace('|t1|t2|' -> '|t1+t2|') — measured identical
    left-to-right non-overlapping semantics to Arrow replace_substring."""
    parts = ["t0 AS (SELECT '|' || replace(text, ' ', '|') || '|' AS s FROM documents)"]
    sels = []
    for i in range(1, rounds + 1):
        j = i - 1
        parts.append(f"""
p{i} AS (
  SELECT t1, t2, count(*) AS n
  FROM (SELECT l[i] AS t1, l[i + 1] AS t2
        FROM (SELECT string_split(trim(s, '|'), '|') AS l FROM t{j}),
             unnest(generate_series(1, len(l) - 1)) AS u(i))
  GROUP BY 1, 2),
m{i} AS (SELECT t1, t2, n FROM p{i} ORDER BY n DESC, t1, t2 LIMIT 1)""")
        if i < rounds:
            parts.append(f"""
t{i} AS (
  SELECT replace(s,
                 '|' || (SELECT t1 FROM m{i}) || '|' || (SELECT t2 FROM m{i}) || '|',
                 '|' || (SELECT t1 FROM m{i}) || '+' || (SELECT t2 FROM m{i}) || '|') AS s
  FROM t{j})""")
        sels.append(
            f"SELECT {i} AS round, t1 AS tok1, t2 AS tok2, "
            f"t1 || '+' || t2 AS merged, n AS n_pairs FROM m{i}"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(sels) + "\nORDER BY round"


def returned_revenue() -> str:
    """Q10-shape twin: floored per-row revenue makes the per-customer
    sum order-independent; (revenue desc, custkey) total order."""
    return """
SELECT c.c_custkey, c.c_name, n.n_name,
       sum(floor(l.l_extendedprice * (1.0 - l.l_discount))) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


def bulk_orders() -> str:
    """Q18-shape twin: HAVING on the exact double sum of integer-valued
    quantities (order-independent), floored totalprice."""
    return """
SELECT o.o_orderkey, o.o_custkey, floor(o.o_totalprice) AS totalprice, t.sum_qty
FROM orders o
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) >= 250.0) t
  ON t.l_orderkey = o.o_orderkey
ORDER BY o.o_orderkey
"""


def huff_market_share() -> str:
    """Gravity-allocation twin: cross join events x hubs, the SAME
    integer score (A << 50) // d2 on scaled integer coordinates, winner
    by row_number (score desc, hub_id) — truncating // is identical to
    numpy's on this non-negative domain; share is one division of
    exact counts."""
    from geoglue_ray.pipelines.queries import (
        _HUFF_HUBS,
        _HUFF_NUM,
        _HUFF_XS,
        _HUFF_YS,
    )

    vals = ", ".join(
        f"({h[0]}, {int(round(h[1] * _HUFF_XS))}, {int(round(h[2] * _HUFF_YS))}, {h[3]})"
        for h in _HUFF_HUBS
    )
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH h(hub_id, hx, hy, a) AS (VALUES {vals}),
e AS (
  SELECT event_id, event_type,
         CAST({lon} * {int(_HUFF_XS)} AS BIGINT) AS x,
         CAST({lat} * {int(_HUFF_YS)} AS BIGINT) AS y
  FROM events
  WHERE event_id % 128 <> 0 AND event_id % 10 < 3),
s AS (
  SELECT e.event_id, e.event_type, h.hub_id,
         (h.a * {_HUFF_NUM}) //
           ((e.x - h.hx) * (e.x - h.hx) + (e.y - h.hy) * (e.y - h.hy)) AS score
  FROM e CROSS JOIN h),
w AS (
  SELECT event_id, event_type, hub_id,
         row_number() OVER (PARTITION BY event_id ORDER BY score DESC, hub_id) AS rn
  FROM s),
c AS (SELECT hub_id, event_type, count(*) AS n FROM w WHERE rn = 1 GROUP BY 1, 2)
SELECT hub_id, event_type, n AS n_events,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
FROM c ORDER BY hub_id, event_type
"""


def admin_contiguity() -> str:
    """Closed-form rook adjacency of the triangle tessellation: every
    lower-left triangle (even id) borders its cell's upper-right twin
    on the diagonal, the triangle below on its bottom edge, and the
    triangle to the west on its left edge — the exact pair set the
    engine recovers from WKB shared-edge detection."""
    return f"""
WITH cells AS (
  SELECT range AS cell, range % {fx.NX} AS cx, range // {fx.NX} AS cy
  FROM range({fx.NX * fx.NY})),
p AS (
  SELECT 2 * cell AS a, 2 * cell + 1 AS b FROM cells
  UNION ALL
  SELECT 2 * cell, 2 * ((cy - 1) * {fx.NX} + cx) + 1 FROM cells WHERE cy >= 1
  UNION ALL
  SELECT 2 * cell, 2 * (cy * {fx.NX} + cx - 1) + 1 FROM cells WHERE cx >= 1)
SELECT least(a, b) AS admin_a, greatest(a, b) AS admin_b,
       CAST(1 AS DOUBLE) AS n_shared_edges
FROM p ORDER BY admin_a, admin_b
"""


def admin_spatial_lag() -> str:
    """Areal Wy twin: closed-form admin-2 assignment for the inside
    events, range() universe LEFT-joined so empty units are zeros, the
    closed-form triangle adjacency in both directions, and one exact
    division per unit (DOUBLE sums of integer-valued counts)."""
    return f"""
WITH e AS (
  SELECT {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events WHERE event_id % {fx.OUT_MOD} <> 0),
asg AS (SELECT {fx.sql_admin2_inside('lon', 'lat')} AS fid FROM e),
c AS (SELECT fid, count(*) AS n FROM asg GROUP BY 1),
u AS (SELECT range AS fid FROM range({fx.N_ADMIN2})),
cnt AS (SELECT u.fid, CAST(COALESCE(c.n, 0) AS DOUBLE) AS n
        FROM u LEFT JOIN c USING (fid)),
cells AS (
  SELECT range AS cell, range % {fx.NX} AS cx, range // {fx.NX} AS cy
  FROM range({fx.NX * fx.NY})),
p AS (
  SELECT 2 * cell AS a, 2 * cell + 1 AS b FROM cells
  UNION ALL
  SELECT 2 * cell, 2 * ((cy - 1) * {fx.NX} + cx) + 1 FROM cells WHERE cy >= 1
  UNION ALL
  SELECT 2 * cell, 2 * (cy * {fx.NX} + cx - 1) + 1 FROM cells WHERE cx >= 1),
adj AS (SELECT a AS focal, b AS nb FROM p UNION ALL SELECT b, a FROM p),
l AS (
  SELECT adj.focal AS fid, sum(cn.n) AS s, count(*) AS k
  FROM adj JOIN cnt cn ON cn.fid = adj.nb GROUP BY 1)
SELECT cnt.fid AS admin_fid, cnt.n AS n_events,
       CAST(l.k AS DOUBLE) AS n_neighbors,
       l.s / CAST(l.k AS DOUBLE) AS lag_mean
FROM cnt JOIN l USING (fid) ORDER BY admin_fid
"""


def admin_geary() -> str:
    """Areal Geary twin: exact integer difference and cleared-mean sums
    over the closed-form adjacency, one fixed float chain for C."""
    return f"""
WITH e AS (
  SELECT {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events WHERE event_id % {fx.OUT_MOD} <> 0),
asg AS (SELECT {fx.sql_admin2_inside('lon', 'lat')} AS fid FROM e),
c AS (SELECT fid, CAST(count(*) AS BIGINT) AS n FROM asg GROUP BY 1),
u AS (SELECT range AS fid FROM range({fx.N_ADMIN2})),
cnt AS (SELECT u.fid, COALESCE(c.n, 0) AS n FROM u LEFT JOIN c USING (fid)),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM cnt),
zz AS (SELECT CAST(sum(({fx.N_ADMIN2} * n - tot.s) * ({fx.N_ADMIN2} * n - tot.s))
               AS BIGINT) AS ssz
       FROM cnt, tot),
cells AS (
  SELECT range AS cell, range % {fx.NX} AS cx, range // {fx.NX} AS cy
  FROM range({fx.NX * fx.NY})),
p AS (
  SELECT 2 * cell AS a, 2 * cell + 1 AS b FROM cells
  UNION ALL
  SELECT 2 * cell, 2 * ((cy - 1) * {fx.NX} + cx) + 1 FROM cells WHERE cy >= 1
  UNION ALL
  SELECT 2 * cell, 2 * (cy * {fx.NX} + cx - 1) + 1 FROM cells WHERE cx >= 1),
dd AS (
  SELECT CAST(sum((ca.n - cb.n) * (ca.n - cb.n)) AS BIGINT) AS ssd,
         CAST(count(*) AS BIGINT) AS w
  FROM p JOIN cnt ca ON ca.fid = p.a JOIN cnt cb ON cb.fid = p.b)
SELECT CAST({fx.N_ADMIN2} AS BIGINT) AS n_units, dd.w AS n_pairs,
       dd.ssd, zz.ssz,
       (CAST({fx.N_ADMIN2 - 1} AS DOUBLE) * CAST(dd.ssd AS DOUBLE)
          * CAST({fx.N_ADMIN2 * fx.N_ADMIN2} AS DOUBLE))
         / (CAST(2 * dd.w AS DOUBLE) * CAST(zz.ssz AS DOUBLE)) AS geary_c
FROM dd, zz
"""


def admin_lisa() -> str:
    """Areal LISA twin: cleared-mean integer scores (z' = N*x - S), the
    closed-form triangle adjacency, binary-W lag sums, all-BIGINT
    quadrant CASE — no float arithmetic anywhere."""
    return f"""
WITH e AS (
  SELECT {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events WHERE event_id % {fx.OUT_MOD} <> 0),
asg AS (SELECT {fx.sql_admin2_inside('lon', 'lat')} AS fid FROM e),
c AS (SELECT fid, CAST(count(*) AS BIGINT) AS n FROM asg GROUP BY 1),
u AS (SELECT range AS fid FROM range({fx.N_ADMIN2})),
cnt AS (SELECT u.fid, COALESCE(c.n, 0) AS n FROM u LEFT JOIN c USING (fid)),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS s FROM cnt),
z AS (SELECT fid, n, {fx.N_ADMIN2} * n - tot.s AS z FROM cnt, tot),
cells AS (
  SELECT range AS cell, range % {fx.NX} AS cx, range // {fx.NX} AS cy
  FROM range({fx.NX * fx.NY})),
p AS (
  SELECT 2 * cell AS a, 2 * cell + 1 AS b FROM cells
  UNION ALL
  SELECT 2 * cell, 2 * ((cy - 1) * {fx.NX} + cx) + 1 FROM cells WHERE cy >= 1
  UNION ALL
  SELECT 2 * cell, 2 * (cy * {fx.NX} + cx - 1) + 1 FROM cells WHERE cx >= 1),
adj AS (SELECT a AS focal, b AS nb FROM p UNION ALL SELECT b, a FROM p),
l AS (
  SELECT adj.focal AS fid, CAST(sum(z.z) AS BIGINT) AS lag_n
  FROM adj JOIN z ON z.fid = adj.nb GROUP BY 1)
SELECT z.fid AS admin_fid, z.n AS n_events, z.z AS z_n, l.lag_n,
       z.z * l.lag_n AS local_i_num,
       CASE WHEN z.z > 0 AND l.lag_n > 0 THEN 'HH'
            WHEN z.z > 0 THEN 'HL'
            WHEN l.lag_n > 0 THEN 'LH' ELSE 'LL' END AS quadrant
FROM z JOIN l USING (fid) ORDER BY 1
"""


def _kmeans_cte_parts(k: int, rounds: int, dim: int) -> list:
    """Shared Lloyd CTE chain (quantize, seed, ``rounds`` assign/M-step
    pairs) — reused by embed_kmeans and kmeans_silhouette."""
    OFF = 1 << 20
    parts = [
        f"""q AS (
  SELECT vec_id, i.range AS dim,
         CAST(floor(CAST(embedding[i.range + 1] AS DOUBLE) * {OFF}.0 + 0.5) AS BIGINT) AS v
  FROM embeddings, range({dim}) i),
c0 AS (SELECT vec_id AS cluster, dim, v AS cv FROM q WHERE vec_id < {k})"""
    ]
    for r in range(1, rounds + 1):
        j = r - 1
        parts.append(f"""
a{r} AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM (SELECT q.vec_id, c.cluster,
               sum((q.v - c.cv) * (q.v - c.cv)) AS d2
        FROM q JOIN c{j} c ON c.dim = q.dim GROUP BY 1, 2)),
s{r} AS (
  SELECT a.cluster, q.dim, sum(q.v) AS s, count(*) AS n
  FROM a{r} a JOIN q ON q.vec_id = a.vec_id
  WHERE a.rn = 1 GROUP BY 1, 2),
c{r} AS (
  SELECT p.cluster, p.dim,
         CASE WHEN s.n IS NULL THEN p.cv
              ELSE (2 * (s.s + s.n * {OFF}) + s.n) // (2 * s.n) - {OFF}
         END AS cv
  FROM c{j} p LEFT JOIN s{r} s
    ON s.cluster = p.cluster AND s.dim = p.dim)""")
    return parts


def embed_kmeans(k: int = 4, rounds: int = 2, dim: int = 64) -> str:
    """Lloyd twin: identical floor(x*2^20 + 0.5) quantization, argmin by
    (d2, cluster) row_number, M-step via the same non-negative floor
    division (2*(S + n*2^20) + n) // (2n) - 2^20; an emptied cluster
    keeps its previous centroid via the LEFT-join COALESCE."""
    parts = _kmeans_cte_parts(k, rounds, dim)
    parts.append(f"""
nn AS (SELECT cluster, count(*) AS n FROM a{rounds} WHERE rn = 1 GROUP BY 1)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT c.cluster AS cluster_id, c.dim, CAST(c.cv AS BIGINT) AS centroid_q,
       COALESCE(nn.n, 0) AS n_members
FROM c{rounds} c LEFT JOIN nn ON nn.cluster = c.cluster
ORDER BY cluster_id, dim
"""
    )


def corpus_budget(budget: int = 20_000) -> str:
    """Greedy-selection twin: one exclusive window sum over the
    (distinct-token count DESC, doc_id) order — DuckDB widens the BIGINT
    window sum to HUGEINT, so it is CAST back (CLAUDE.md)."""
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tok,
         len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_dist
  FROM documents),
w AS (
  SELECT doc_id, n_dist, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (
             ORDER BY n_dist DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t)
SELECT doc_id, n_dist, n_tok, start_offset
FROM w WHERE start_offset < {budget} ORDER BY doc_id
"""


def user_home() -> str:
    """Majority-unit twin: closed-form assignment, (count desc, fid)
    row_number winner per user, HUGEINT total cast back, one exact
    division."""
    return f"""
WITH e AS (
  SELECT user_id,
         {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events WHERE event_id % {fx.OUT_MOD} <> 0),
a AS (SELECT user_id, {fx.sql_admin2_inside('lon', 'lat')} AS fid FROM e),
c AS (SELECT user_id, fid, count(*) AS n FROM a GROUP BY 1, 2),
t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
w AS (
  SELECT user_id, fid, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, fid) AS rn
  FROM c)
SELECT w.user_id, w.fid AS home_fid, w.n AS n_home, t.tot AS n_total,
       CAST(w.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS home_frac
FROM w JOIN t USING (user_id) WHERE w.rn = 1 ORDER BY w.user_id
"""


def media_content_dupes() -> str:
    """Content-dedup twin: the media_features byte replay (HUGEINT
    mod-2^64 stub decode) grouped by the exact ordered payload list;
    row_number representative, n >= 2 groups only."""
    from geoglue_ray.functions.texthash import C1, C2, U64
    from geoglue_ray.stages.media import PAYLOAD_LEN

    return f"""
WITH spans AS (
  SELECT d.doc_id,
         CAST(1 + j.range AS INTEGER) AS span_index,
         CASE WHEN (d.doc_id + 1 + j.range) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         'media/' || d.doc_id || '/' || (1 + j.range) AS media_ref
  FROM documents d, range(2) j
  WHERE 1 + j.range <= d.doc_id % 3),
seeds AS (
  SELECT s.doc_id, s.span_index, s.kind,
         sum(ascii(substr(s.media_ref, c.range::INTEGER + 1, 1))) AS seed
  FROM spans s, range(40) c
  WHERE c.range < length(s.media_ref)
  GROUP BY 1, 2, 3),
bytes AS (
  SELECT doc_id, span_index, kind, i.range AS i,
         ((((seed + 1)::HUGEINT * {C1}::HUGEINT
            + (i.range + 1)::HUGEINT * {C2}::HUGEINT) % {U64}::HUGEINT)
          // {1 << 56}::HUGEINT) AS byte
  FROM seeds, range({PAYLOAD_LEN}) i),
h AS (
  SELECT doc_id, span_index, kind,
         list(byte ORDER BY i) AS pl,
         CAST(sum(byte) AS BIGINT) AS byte_sum
  FROM bytes GROUP BY 1, 2, 3),
g AS (
  SELECT kind, pl, byte_sum, doc_id, span_index,
         count(*) OVER (PARTITION BY kind, pl) AS n_items,
         row_number() OVER (PARTITION BY kind, pl
                            ORDER BY doc_id, span_index) AS rn
  FROM h)
SELECT kind, byte_sum, CAST(n_items AS BIGINT) AS n_items,
       doc_id AS first_doc_id, CAST(span_index AS BIGINT) AS first_span_index
FROM g WHERE rn = 1 AND n_items >= 2
ORDER BY kind, byte_sum, n_items, first_doc_id
"""


def raster_contours(threshold: float = 500.0) -> str:
    """Marching-squares twin: four-corner self-join, case bits by exact
    >= comparisons of integer-valued doubles, saddle cases doubled."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT r, c, value FROM rast
  WHERE variable = 't2m' AND t = 0),
blk AS (
  SELECT CAST(tl.value >= {threshold} AS INT)
         + 2 * CAST(tr.value >= {threshold} AS INT)
         + 4 * CAST(br.value >= {threshold} AS INT)
         + 8 * CAST(bl.value >= {threshold} AS INT) AS case_id
  FROM v tl
  JOIN v tr ON tr.r = tl.r AND tr.c = tl.c + 1
  JOIN v bl ON bl.r = tl.r + 1 AND bl.c = tl.c
  JOIN v br ON br.r = tl.r + 1 AND br.c = tl.c + 1
  WHERE tl.value IS NOT NULL AND tr.value IS NOT NULL
    AND bl.value IS NOT NULL AND br.value IS NOT NULL)
SELECT CAST(case_id AS BIGINT) AS case_id,
       CAST(count(*) AS DOUBLE) AS n_blocks,
       CAST(count(*) AS DOUBLE)
         * (CASE WHEN case_id IN (5, 10) THEN 2.0 ELSE 1.0 END) AS n_segments
FROM blk WHERE case_id NOT IN (0, 15)
GROUP BY case_id ORDER BY case_id
"""


def bpe_encode(rounds: int = 4) -> str:
    """Encode twin: the bpe_merges chain re-derived with doc_id carried
    through every rewrite CTE, final per-doc token counts + one exact
    division."""
    parts = [
        "t0 AS (SELECT doc_id, '|' || replace(text, ' ', '|') || '|' AS s FROM documents)"
    ]
    for i in range(1, rounds + 1):
        j = i - 1
        parts.append(f"""
p{i} AS (
  SELECT t1, t2, count(*) AS n
  FROM (SELECT l[i] AS t1, l[i + 1] AS t2
        FROM (SELECT string_split(trim(s, '|'), '|') AS l FROM t{j}),
             unnest(generate_series(1, len(l) - 1)) AS u(i))
  GROUP BY 1, 2),
m{i} AS (SELECT t1, t2, n FROM p{i} ORDER BY n DESC, t1, t2 LIMIT 1),
t{i} AS (
  SELECT doc_id, replace(s,
                 '|' || (SELECT t1 FROM m{i}) || '|' || (SELECT t2 FROM m{i}) || '|',
                 '|' || (SELECT t1 FROM m{i}) || '+' || (SELECT t2 FROM m{i}) || '|') AS s
  FROM t{j})""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT d.doc_id,
       len(string_split(d.text, ' ')) AS n_before,
       len(string_split(trim(t.s, '|'), '|')) AS n_after,
       CAST(len(string_split(trim(t.s, '|'), '|')) AS DOUBLE)
         / CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS compression
FROM documents d JOIN t{rounds} t USING (doc_id)
ORDER BY d.doc_id
"""
    )


def events_rhythm() -> str:
    """Rhythm twin: the same whole-hours-since-Monday-epoch integer
    arithmetic (never dayofweek()), window-sum total cast to DOUBLE."""
    return f"""
WITH h AS (
  SELECT CAST(date_diff('hour', {fx.T0_SQL}, ts) AS BIGINT) AS hrs
  FROM events),
c AS (
  SELECT (hrs // 24) % 7 AS dow, hrs % 24 AS hod, count(*) AS n
  FROM h GROUP BY 1, 2)
SELECT dow, hod, n AS n_events,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
FROM c ORDER BY dow, hod
"""


def user_heading_mix() -> str:
    """Heading-mix twin: lag window deltas, the aspect_octant sector
    CASE in the same evaluation order, HUGEINT total cast back, one
    exact division."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events),
s AS (
  SELECT user_id,
         lon - lag(lon) OVER u AS dx, lat - lag(lat) OVER u AS dy
  FROM e WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
o AS (
  SELECT user_id,
         CASE WHEN dx > 0 AND dy >= 0 AND dx > dy THEN 0
              WHEN dx > 0 AND dy >= dx THEN 1
              WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 2
              WHEN dy > 0 AND -dx >= dy THEN 3
              WHEN dx < 0 AND dy <= 0 AND -dx > -dy THEN 4
              WHEN dx < 0 AND -dy >= -dx THEN 5
              WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 6
              WHEN dx > 0 AND dy < 0 THEN 7
              ELSE -1 END AS octant
  FROM s WHERE dx IS NOT NULL),
c AS (SELECT user_id, octant, count(*) AS n FROM o GROUP BY 1, 2),
t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.user_id, c.octant, c.n AS n_steps,
       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS frac
FROM c JOIN t USING (user_id) ORDER BY c.user_id, c.octant
"""


def user_communities(tau: float = 0.04) -> str:
    """Community twin: the user_colocation pair join thresholded on the
    identical single-division jaccard, recursive reachability closure,
    lowest-member community ids, sizes by group."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH RECURSIVE uc AS (
  SELECT DISTINCT user_id,
         CAST(floor({lon} * 64.0) AS BIGINT) * 65536
           + CAST(floor({lat} * 64.0) AS BIGINT) AS cell
  FROM events),
sz AS (SELECT user_id, count(*) AS n FROM uc GROUP BY 1),
sh AS (
  SELECT a.user_id AS key_a, b.user_id AS key_b, count(*) AS n_shared
  FROM uc a JOIN uc b ON b.cell = a.cell AND b.user_id > a.user_id
  GROUP BY 1, 2),
j AS (
  SELECT sh.key_a, sh.key_b FROM sh
  JOIN sz sa ON sa.user_id = sh.key_a
  JOIN sz sb ON sb.user_id = sh.key_b
  WHERE sh.n_shared / (sa.n + sb.n - sh.n_shared) >= {tau}),
edges AS (
  SELECT key_a AS src, key_b AS dst FROM j
  UNION ALL SELECT key_b, key_a FROM j),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
lab AS (SELECT node AS user_id, min(lab) AS community_id FROM reach GROUP BY 1),
szc AS (SELECT community_id, CAST(count(*) AS DOUBLE) AS community_size
        FROM lab GROUP BY 1)
SELECT l.user_id, l.community_id, szc.community_size
FROM lab l JOIN szc USING (community_id)
ORDER BY l.user_id
"""


def embed_pq(n_blocks: int = 4, k: int = 4, rounds: int = 2, dim: int = 64) -> str:
    """PQ twin: the embed_kmeans chain partitioned by sub-vector block —
    identical quantization, per-(vec, block) argmin, per-block
    round-half-up M-step, emptied codewords kept via LEFT-join
    COALESCE."""
    OFF = 1 << 20
    bd = dim // n_blocks
    parts = [
        f"""q AS (
  SELECT vec_id, i.range // {bd} AS block, i.range % {bd} AS dim,
         CAST(floor(CAST(embedding[i.range + 1] AS DOUBLE) * {OFF}.0 + 0.5) AS BIGINT) AS v
  FROM embeddings, range({dim}) i),
c0 AS (SELECT vec_id AS cluster, block, dim, v AS cv FROM q WHERE vec_id < {k})"""
    ]
    for r in range(1, rounds + 1):
        j = r - 1
        parts.append(f"""
a{r} AS (
  SELECT vec_id, block, cluster,
         row_number() OVER (PARTITION BY vec_id, block ORDER BY d2, cluster) AS rn
  FROM (SELECT q.vec_id, q.block, c.cluster,
               sum((q.v - c.cv) * (q.v - c.cv)) AS d2
        FROM q JOIN c{j} c ON c.block = q.block AND c.dim = q.dim
        GROUP BY 1, 2, 3)),
s{r} AS (
  SELECT a.block, a.cluster, q.dim, sum(q.v) AS s, count(*) AS n
  FROM a{r} a JOIN q ON q.vec_id = a.vec_id AND q.block = a.block
  WHERE a.rn = 1 GROUP BY 1, 2, 3),
c{r} AS (
  SELECT p.block, p.cluster, p.dim,
         CASE WHEN s.n IS NULL THEN p.cv
              ELSE (2 * (s.s + s.n * {OFF}) + s.n) // (2 * s.n) - {OFF}
         END AS cv
  FROM c{j} p LEFT JOIN s{r} s
    ON s.block = p.block AND s.cluster = p.cluster AND s.dim = p.dim)""")
    parts.append(f"""
nn AS (SELECT block, cluster, count(*) AS n
       FROM a{rounds} WHERE rn = 1 GROUP BY 1, 2)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT c.block, c.cluster AS cluster_id, c.dim,
       CAST(c.cv AS BIGINT) AS centroid_q, COALESCE(nn.n, 0) AS n_members
FROM c{rounds} c LEFT JOIN nn ON nn.block = c.block AND nn.cluster = c.cluster
ORDER BY c.block, cluster_id, c.dim
"""
    )


def embed_pq_recall() -> str:
    """Recall claim for PQ-ADC kNN vs the exact quantized-L2 ranking
    (>= 0.3 mean; deterministic — no RNG anywhere in the chain)."""
    return """
SELECT i.range AS query_id, TRUE AS recall_ok FROM range(4) i ORDER BY 1
"""


def events_scan_stat() -> str:
    """Scan-statistic twin: cylinder counts + window marginals, the same
    cross-multiplied integer excess (no division), HUGEINT sums cast
    back to BIGINT, (excess desc, row, col, win) top 20."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH e AS (
  SELECT CAST(floor((24.0625 - {lat}) / 0.25) AS BIGINT) AS r,
         CAST(floor(({lon} - 102.0) / 0.25) AS BIGINT) AS c,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) // 72 AS w
  FROM events),
f AS (
  SELECT r, c, w FROM e
  WHERE r >= 0 AND r < 64 AND c >= 0 AND c < 33 AND w >= 0 AND w < 10),
cyl AS (SELECT r, c, w, count(*) AS n FROM f GROUP BY 1, 2, 3),
mc AS (SELECT r, c, CAST(sum(n) AS BIGINT) AS n_cell FROM cyl GROUP BY 1, 2),
mw AS (SELECT w, CAST(sum(n) AS BIGINT) AS n_win FROM cyl GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cyl)
SELECT cyl.r AS cell_row, cyl.c AS cell_col, cyl.w AS win,
       cyl.n AS n_obs,
       cyl.n * tot.nn - mc.n_cell * mw.n_win AS excess
FROM cyl
JOIN mc ON mc.r = cyl.r AND mc.c = cyl.c
JOIN mw ON mw.w = cyl.w
CROSS JOIN tot
ORDER BY excess DESC, cell_row, cell_col, win
LIMIT 20
"""


def trade_pairs() -> str:
    """Q7-shape twin: floored per-row revenue, nation names on both
    sides, |nations|^2 pair rollup."""
    return """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(count(*) AS DOUBLE) AS n_items,
       sum(floor(l.l_extendedprice * (1.0 - l.l_discount))) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def consensus_neardup() -> str:
    """Ensemble twin: the minhash pair CTE joined to the simhash pair
    set — a pair survives only when both detectors flag it."""
    from geoglue_ray.functions.texthash import sql_u64_to_bigint

    ham = (
        f"bit_count(xor({sql_u64_to_bigint('a.fp')}, {sql_u64_to_bigint('b.fp')}))"
    )
    return f"""
WITH {_sql_minhash_cte(0.4)},
{_sql_simhash_fp()},
shp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST({ham} AS BIGINT) AS hamming
  FROM fps a JOIN fps b ON a.doc_id < b.doc_id
  WHERE {ham} <= 4)
SELECT m.doc_a, m.doc_b, m.est_jaccard, shp.hamming
FROM mh_pairs m JOIN shp ON shp.doc_a = m.doc_a AND shp.doc_b = m.doc_b
ORDER BY 1, 2
"""


def source_profile() -> str:
    """Datasheet twin: per-source counts/totals, distinct langs, one
    exact division; HUGEINT sums cast back to BIGINT."""
    return r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def user_pingpong() -> str:
    """Ping-pong twin: two lag windows over the closed-form admin
    sequence, FILTERed counts, one exact division."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon, {fx.sql_lat('event_id')} AS lat
  FROM events WHERE event_id % {fx.OUT_MOD} <> 0),
a AS (
  SELECT user_id, event_id, ts,
         {fx.sql_admin2_inside('lon', 'lat')} AS fid
  FROM e),
w AS (
  SELECT user_id, fid,
         lag(fid, 1) OVER u AS f1, lag(fid, 2) OVER u AS f2
  FROM a WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (
  SELECT user_id,
         count(*) FILTER (WHERE f2 IS NOT NULL) AS n_triples,
         count(*) FILTER (WHERE f2 = fid AND f1 <> fid) AS n_pingpong
  FROM w GROUP BY 1
  HAVING count(*) FILTER (WHERE f2 IS NOT NULL) > 0)
SELECT user_id, n_pingpong, n_triples,
       CAST(n_pingpong AS DOUBLE) / CAST(n_triples AS DOUBLE) AS pingpong_rate
FROM c ORDER BY user_id
"""


def user_burstiness() -> str:
    """Burstiness twin: lag window whole-second gaps (date_diff
    truncation == numpy floor on the non-negative domain), cleared-
    denominator dispersion ratio, HUGEINT products cast to BIGINT
    before the one double division."""
    return """
WITH w AS (
  SELECT user_id,
         CAST(date_diff('second', lag(ts) OVER u, ts) AS BIGINT) AS gap
  FROM events WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (
  SELECT user_id,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS gap_sum,
         CAST(sum(gap * gap) AS BIGINT) AS s2
  FROM w WHERE gap IS NOT NULL GROUP BY 1)
SELECT user_id, n_gaps, gap_sum,
       CAST(n_gaps * s2 AS DOUBLE) / CAST(gap_sum * gap_sum AS DOUBLE) AS gap_cv2
FROM c ORDER BY user_id
"""


def incremental_dedup() -> str:
    """Incremental-dedup twin: exact-fingerprint base counts plus the
    minhash pair CTE restricted to cross-split pairs, LEFT-joined to
    the new batch."""
    from geoglue_ray.functions.texthash import U64, sql_token_hash, sql_u64_to_bigint
    from geoglue_ray.stages.text import _FP_BASE, _FP_SEED

    th_list = f"list_transform({_sql_tokens('text')}, t -> {sql_token_hash('t')})"
    fp = (
        f"list_reduce(list_prepend({int(_FP_SEED)}::HUGEINT, {th_list}), "
        f"(acc, x) -> xor((acc * {int(_FP_BASE)}::HUGEINT) % {U64}::HUGEINT, x))"
    )
    return f"""
WITH {_sql_minhash_cte(0.4)},
fps AS (
  SELECT doc_id,
         CASE WHEN length({_sql_tokens('text')}) = 0 THEN 0
              ELSE {sql_u64_to_bigint(fp)} END AS fingerprint
  FROM documents),
base AS (
  SELECT fingerprint, count(*) AS n FROM fps WHERE doc_id % 5 <> 0 GROUP BY 1),
newd AS (SELECT doc_id, fingerprint FROM fps WHERE doc_id % 5 = 0),
cross_pairs AS (
  SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id
  FROM mh_pairs
  WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)),
near AS (SELECT doc_id, count(*) AS n FROM cross_pairs GROUP BY 1)
SELECT nd.doc_id,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_exact_matches,
       CAST(COALESCE(nr.n, 0) AS BIGINT) AS n_near_neighbors,
       COALESCE(b.n, 0) > 0 OR COALESCE(nr.n, 0) > 0 AS is_duplicate
FROM newd nd
LEFT JOIN base b USING (fingerprint)
LEFT JOIN near nr ON nr.doc_id = nd.doc_id
ORDER BY nd.doc_id
"""


def exposure_bands() -> str:
    """Exposure twin: the raster value at each event's (cell, hour) is
    closed-form arithmetic; hole cells are NULL and drop; band mean is
    one exact division."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH e AS (
  SELECT CAST(floor((24.0625 - {lat}) / 0.25) AS BIGINT) AS r,
         CAST(floor(({lon} - 102.0) / 0.25) AS BIGINT) AS c,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS h
  FROM events),
f AS (
  SELECT r, c, h,
         CASE WHEN (r * 33 + c) % 11 = 0 THEN NULL
              ELSE CAST((h * 31 + r * 7 + c * 13) % 997 AS DOUBLE) END AS v
  FROM e
  WHERE r >= 0 AND r < 64 AND c >= 0 AND c < 33 AND h >= 0 AND h < 720),
b AS (SELECT CAST(v AS BIGINT) // 100 AS band, v FROM f WHERE v IS NOT NULL)
SELECT band,
       CAST(count(*) AS DOUBLE) AS n_events,
       sum(v) / CAST(count(*) AS DOUBLE) AS mean_value
FROM b GROUP BY 1 ORDER BY 1
"""


def exposure_lags(n_lags: int = 4) -> str:
    """Distributed-lag twin: lateral lag expansion, the closed-form
    raster value at the shifted hour, per-(lag, band) rollup."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH e AS (
  SELECT CAST(floor((24.0625 - {lat}) / 0.25) AS BIGINT) AS r,
         CAST(floor(({lon} - 102.0) / 0.25) AS BIGINT) AS c,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
           - 24 * lg.range AS h,
         lg.range AS lag
  FROM events, range({n_lags}) lg),
f AS (
  SELECT lag, r, c, h,
         CASE WHEN (r * 33 + c) % 11 = 0 THEN NULL
              ELSE CAST((h * 31 + r * 7 + c * 13) % 997 AS DOUBLE) END AS v
  FROM e
  WHERE r >= 0 AND r < 64 AND c >= 0 AND c < 33 AND h >= 0 AND h < 720),
b AS (SELECT lag, CAST(v AS BIGINT) // 100 AS band, v FROM f WHERE v IS NOT NULL)
SELECT lag, band,
       CAST(count(*) AS DOUBLE) AS n_events,
       sum(v) / CAST(count(*) AS DOUBLE) AS mean_value
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_gdd(base: float = 500.0) -> str:
    """GDD twin: greatest(v - base, 0) summed per cell over the month,
    above-base hour counts, HUGEINT-free (DOUBLE sums of integer-valued
    exceedances are order-independent)."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()})
SELECT r AS cell_row, c AS cell_col,
       sum(greatest(value - {base}, 0.0)) AS gdd,
       CAST(count(*) FILTER (WHERE value > {base}) AS DOUBLE) AS hours_above
FROM rast WHERE variable = 't2m' AND value IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def case_crossover(ref_lag_h: int = 168) -> str:
    """Case-crossover twin: closed-form exposure at the event hour and
    the same cell one week earlier, discordant-pair census, one exact
    division among discordant pairs."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    val = "CASE WHEN (r * 33 + c) % 11 = 0 THEN NULL ELSE CAST(({h} * 31 + r * 7 + c * 13) % 997 AS DOUBLE) END"
    return f"""
WITH e AS (
  SELECT CAST(floor((24.0625 - {lat}) / 0.25) AS BIGINT) AS r,
         CAST(floor(({lon} - 102.0) / 0.25) AS BIGINT) AS c,
         CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS h
  FROM events),
p AS (
  SELECT {val.format(h='h')} AS cv, {val.format(h='(h - ' + str(ref_lag_h) + ')')} AS rv
  FROM e
  WHERE r >= 0 AND r < 64 AND c >= 0 AND c < 33
    AND h >= 0 AND h < 720 AND h - {ref_lag_h} >= 0),
q AS (SELECT cv, rv FROM p WHERE cv IS NOT NULL AND rv IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE cv > rv) AS BIGINT) AS n_case_higher,
       CAST(count(*) FILTER (WHERE cv < rv) AS BIGINT) AS n_control_higher,
       CAST(count(*) FILTER (WHERE cv = rv) AS BIGINT) AS n_tie,
       CAST(count(*) FILTER (WHERE cv > rv) AS DOUBLE)
         / CAST(count(*) FILTER (WHERE cv <> rv) AS DOUBLE) AS case_excess_frac
FROM q
"""


def late_sole_supplier(late_days: int = 60) -> str:
    """Q21-shape twin: the EXISTS (another supplier in the order) /
    NOT EXISTS (another LATE supplier) pair expressed as the per-order
    census n_supp >= 2 AND n_late = 1; late-line credits are exact
    integer sums, numwait cast back to BIGINT (HUGEINT widening)."""
    return f"""
WITH l AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'),
per AS (SELECT ok, sk, CAST(sum(late) AS BIGINT) AS late_lines FROM l GROUP BY 1, 2),
og AS (SELECT ok, count(*) AS n_supp,
              count(*) FILTER (WHERE late_lines > 0) AS n_late,
              max(sk) FILTER (WHERE late_lines > 0) AS late_sk,
              max(late_lines) FILTER (WHERE late_lines > 0) AS credit
       FROM per GROUP BY 1),
q AS (SELECT late_sk AS sk, credit FROM og WHERE n_supp >= 2 AND n_late = 1)
SELECT s.s_suppkey, s.s_name, n.n_name, CAST(sum(q.credit) AS BIGINT) AS numwait
FROM q
JOIN supplier s ON q.sk = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2, 3
ORDER BY numwait DESC, s.s_suppkey
LIMIT 20
"""


def nation_market_share(
    region_name: str = "ASIA", nation_name: str = "NATION_19"
) -> str:
    """Q8-shape twin: floored per-row revenue makes both yearly sums
    exact integers in DOUBLE; mkt_share is the single division."""
    return f"""
WITH cust AS (
  SELECT c.c_custkey
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{region_name}'),
tn AS (SELECT n_nationkey FROM nation WHERE n_name = '{nation_name}'),
rws AS (
  SELECT year(o.o_orderdate) AS o_year,
         floor(l.l_extendedprice * (1.0 - l.l_discount)) AS rev,
         CASE WHEN s.s_nationkey IN (SELECT n_nationkey FROM tn)
              THEN 1 ELSE 0 END AS tgt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE o.o_custkey IN (SELECT c_custkey FROM cust))
SELECT CAST(o_year AS BIGINT) AS o_year,
       sum(rev * tgt) AS nation_revenue,
       sum(rev) AS total_revenue,
       sum(rev * tgt) / sum(rev) AS mkt_share
FROM rws GROUP BY 1 ORDER BY 1
"""


def small_qty_revenue(brand: str = "Brand#1") -> str:
    """Q17-shape twin: the 20%-of-average threshold cleared to the exact
    integer test 5*q*cnt < sum_qty; one division by 7.0 at the end."""
    return f"""
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = '{brand}'),
li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
              CAST(floor(l_extendedprice) AS BIGINT) AS ep
       FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM pk)),
st AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
              CAST(count(*) AS BIGINT) AS cnt
       FROM li GROUP BY 1)
SELECT CAST(CAST(sum(li.ep) AS BIGINT) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM li JOIN st USING (l_partkey)
WHERE 5 * li.q * st.cnt < st.sq
"""


def collocation_lift(k: int = 50, min_count: int = 5) -> str:
    """Lift twin: exact integer products in the single division (ln()
    never matches numpy log; the ratio does), (lift desc, tok1, tok2)
    total order.  Valid while docs have <= 127 tokens (the positional
    CTE cap shared with bigram_stats)."""
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i.range AS i, list_extract(toks, i.range::INTEGER) AS w
  FROM tl, range(1, 128) i WHERE i.range <= len(toks)),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT a.w AS tok1, b.w AS tok2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
c AS (SELECT tok1, tok2, CAST(count(*) AS BIGINT) AS n_pairs
      FROM bg GROUP BY 1, 2)
SELECT c.tok1, c.tok2, c.n_pairs, u1.c AS c1, u2.c AS c2,
       CAST(tot.n * c.n_pairs AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
FROM c
JOIN uni u1 ON c.tok1 = u1.w
JOIN uni u2 ON c.tok2 = u2.w, tot
WHERE c.n_pairs >= {min_count}
ORDER BY lift DESC, tok1, tok2 LIMIT {k}
"""


def traj_dtw() -> str:
    """Asymmetric-DTW twin: the row-only DP dependency unrolls into 16
    chained CTEs (the pagerank unrolled-fixed-point precedent), each
    computing row i from row i-1 via least(prev, lag(prev)) — the lag
    window IS the (i-1, j-1) step; unreachable cells carry the same
    1<<60 sentinel and accumulate identically, never clamped."""
    from geoglue_ray.pipelines.queries import _DTW_REF, _DTW_SEQ_N

    big = 1 << 60
    vals = ", ".join(f"({j}, {v})" for j, v in enumerate(_DTW_REF))
    ctes = [
        f"""seq AS (
  SELECT user_id, CAST(value * 100 AS BIGINT) AS qv,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
s AS (SELECT user_id, qv, i FROM seq WHERE n >= {_DTW_SEQ_N} AND i <= {_DTW_SEQ_N}),
ref(j, v) AS (VALUES {vals}),
d1 AS (
  SELECT s.user_id, r.j,
         CASE WHEN r.j = 0 THEN abs(s.qv - r.v) ELSE {big} END AS d
  FROM s CROSS JOIN ref r WHERE s.i = 1)"""
    ]
    for i in range(2, _DTW_SEQ_N + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT p.user_id, p.j,
         abs(s.qv - r.v) + least(
           p.d,
           COALESCE(lag(p.d) OVER (PARTITION BY p.user_id ORDER BY p.j), {big})
         ) AS d
  FROM d{i - 1} p
  JOIN ref r ON r.j = p.j
  JOIN s ON s.user_id = p.user_id AND s.i = {i})"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT user_id, d AS dtw
FROM d{_DTW_SEQ_N} WHERE j = {len(_DTW_REF) - 1}
ORDER BY user_id
"""


def corpus_drift(bin_w: int = 64) -> str:
    """TV-drift twin: the split recomputed through the HUGEINT int_hash64
    replica, integer cross-products inside abs(), one division."""
    from geoglue_ray.functions.texthash import sql_int_hash

    return f"""
WITH d AS (
  SELECT ({sql_int_hash('doc_id')}) % 10 AS b10, n_chars // {bin_w} AS bin
  FROM documents),
t AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE b10 <= 7) AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE b10 = 9) AS BIGINT) AS cb
  FROM d GROUP BY 1
  HAVING count(*) FILTER (WHERE b10 <= 7) > 0
      OR count(*) FILTER (WHERE b10 = 9) > 0),
n AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM t)
SELECT n.na AS n_train, n.nb AS n_test,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(CAST(sum(abs(t.ca * n.nb - t.cb * n.na)) AS BIGINT) AS DOUBLE)
         / CAST(2 * n.na * n.nb AS DOUBLE) AS tv_dist
FROM t, n GROUP BY n.na, n.nb
"""


def _eigen_ctes(rounds: int = 4, qscale: int = 1024, dim: int = 64) -> str:
    """Shared CTE body for the power-iteration twins (embed_top_eigen,
    embed_pca_project): quantized components, Gram self-join, unrolled
    matvec/renormalize rounds ending at v{rounds}."""
    ctes = [
        f"""q AS (
  SELECT vec_id, i.range AS j,
         CAST(floor(CAST(embedding[i.range + 1] AS DOUBLE) * {qscale}.0 + 0.5)
              AS BIGINT) AS q
  FROM embeddings, range({dim}) i),
g AS (
  SELECT a.j AS i, b.j AS j, CAST(sum(a.q * b.q) AS BIGINT) AS v
  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
v0 AS (SELECT i.range AS j, CAST({qscale} AS BIGINT) AS v FROM range({dim}) i)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""w{r} AS (
  SELECT g.i AS j, CAST(sum(g.v * p.v) AS BIGINT) AS w
  FROM g JOIN v{r - 1} p ON g.j = p.j GROUP BY 1),
m{r} AS (SELECT max(abs(w)) AS m FROM w{r}),
v{r} AS (SELECT j, ((w + m) * {qscale}) // m - {qscale} AS v FROM w{r}, m{r})"""
        )
    return ",\n".join(ctes)


def embed_top_eigen(rounds: int = 4, qscale: int = 1024, dim: int = 64) -> str:
    """Power-iteration twin: the Gram matrix from the quantized self
    join, each round one matvec (sum cast back to BIGINT — HUGEINT
    widening) + the offset-trick renormalization, unrolled."""
    return f"""
WITH {_eigen_ctes(rounds, qscale, dim)}
SELECT j AS dim, v AS v_q FROM v{rounds} ORDER BY j
"""


def embed_pca_project(rounds: int = 4, qscale: int = 1024, dim: int = 64) -> str:
    """Projection twin: re-derives the eigenvector chain, then one exact
    integer dot product per vector (sum cast back to BIGINT)."""
    return f"""
WITH {_eigen_ctes(rounds, qscale, dim)}
SELECT q.vec_id, CAST(sum(q.q * v{rounds}.v) AS BIGINT) AS proj
FROM q JOIN v{rounds} ON q.j = v{rounds}.j
GROUP BY 1 ORDER BY 1
"""


def kcore_parts(q: float = 0.05, rounds: int = 8) -> str:
    """k-core twin: k from the row_number rank over initial degrees
    (value at a rank is tie-order-independent), then 8 unrolled peel
    rounds — each a degree count among the previous survivors."""
    ctes = [
        """e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
d1 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
kk AS (
  SELECT d AS k FROM (
    SELECT d, row_number() OVER (ORDER BY d) AS rn, count(*) OVER () AS n
    FROM d1)
  WHERE rn = CAST(ceil(""" + str(q) + """ * n) AS BIGINT))"""
    ]
    for r in range(2, rounds + 1):
        ctes.append(
            f"""a{r - 1} AS (SELECT node FROM d{r - 1}, kk WHERE d >= kk.k),
d{r} AS (
  SELECT e.src AS node, CAST(count(*) AS BIGINT) AS d
  FROM e
  JOIN a{r - 1} x ON e.src = x.node
  JOIN a{r - 1} y ON e.dst = y.node
  GROUP BY 1)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node AS part_key, d AS core_degree, kk.k
FROM d{rounds}, kk WHERE d >= kk.k
ORDER BY node
"""


def events_autocorr(max_lag: int = 24, n_hours: int = 720) -> str:
    """ACF twin: zero-filled hourly series via range() LEFT JOIN, integer
    moment sums per lag, the num / sqrt(dx*dy) chain with the same
    double conversions (sqrt is IEEE-exact on both sides)."""
    return f"""
WITH h AS (
  SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS h
  FROM events),
c AS (
  SELECT g.range AS h, CAST(count(e.h) AS BIGINT) AS x
  FROM range({n_hours}) g LEFT JOIN h e ON e.h = g.range
  GROUP BY 1),
l AS (SELECT range + 1 AS lag FROM range({max_lag})),
p AS (
  SELECT l.lag, a.x AS x, b.x AS y
  FROM l
  JOIN c a ON a.h < {n_hours} - l.lag
  JOIN c b ON b.h = a.h + l.lag),
s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM p GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS acf
FROM s ORDER BY lag
"""


def basket_rules(min_support: int = 3, top_n: int = 50) -> str:
    """Rule twin: distinct basket membership, both rule directions via
    UNION ALL, confidence/lift as single divisions of exact counts."""
    return f"""
WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM bi),
ic AS (SELECT it, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
pr AS (
  SELECT a.it AS i1, b.it AS i2, CAST(count(*) AS BIGINT) AS cab
  FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
  GROUP BY 1, 2 HAVING count(*) >= {min_support}),
r AS (
  SELECT i1 AS antecedent, i2 AS consequent, cab FROM pr
  UNION ALL
  SELECT i2, i1, cab FROM pr)
SELECT r.antecedent, r.consequent, r.cab AS n_both,
       ia.c AS n_ante, ib.c AS n_cons,
       CAST(r.cab AS DOUBLE) / CAST(ia.c AS DOUBLE) AS confidence,
       CAST(n.n * r.cab AS DOUBLE) / CAST(ia.c * ib.c AS DOUBLE) AS lift
FROM r
JOIN ic ia ON r.antecedent = ia.it
JOIN ic ib ON r.consequent = ib.it, n
ORDER BY confidence DESC, antecedent, consequent
LIMIT {top_n}
"""


def events_contagion(cell_scale: int = 8, rounds: int = 6) -> str:
    """Temporal-reachability twin: distinct (cell, day) co-presence
    edges, seeds at day 0, and ``rounds`` unrolled min-join propagation
    CTEs — each round keeps earlier infections via the UNION ALL of the
    previous round (min never widens BIGINT)."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    ctes = [
        f"""p AS (
  SELECT DISTINCT user_id,
         CAST(floor(({lon}) * {cell_scale}) AS BIGINT) * 65536
           + CAST(floor(({lat}) * {cell_scale}) AS BIGINT) AS cell,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS d
  FROM events),
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v, a.d AS t
  FROM p a JOIN p b
    ON a.cell = b.cell AND a.d = b.d AND a.user_id <> b.user_id),
t0 AS (
  SELECT DISTINCT user_id, CAST(0 AS BIGINT) AS t
  FROM events WHERE user_id < 3)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""t{r} AS (
  SELECT user_id, min(t) AS t FROM (
    SELECT e.v AS user_id, e.t
    FROM e JOIN t{r - 1} s ON e.u = s.user_id AND e.t >= s.t
    UNION ALL
    SELECT user_id, t FROM t{r - 1})
  GROUP BY 1)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT user_id, t AS t_infect FROM t{rounds} ORDER BY user_id
"""


def raster_curvature() -> str:
    """Curvature twin: 8-direction pivot (HAVING count(*) = 8), the
    same cleared-denominator integer polynomial, one division."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
v AS (
  SELECT t, valid_time, r, c, CAST(value AS BIGINT) AS value
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < 48),
dirs AS (
  SELECT * FROM (VALUES (0, 1), (1, 1), (1, 0), (1, -1),
                        (0, -1), (-1, -1), (-1, 0), (-1, 1))
    AS d(dr, dc)),
w AS (
  SELECT a.valid_time, a.r, a.c, a.value AS vc,
         max(CASE WHEN d.dr = 0  AND d.dc = 1  THEN b.value END) AS e,
         max(CASE WHEN d.dr = 0  AND d.dc = -1 THEN b.value END) AS w_,
         max(CASE WHEN d.dr = 1  AND d.dc = 0  THEN b.value END) AS s,
         max(CASE WHEN d.dr = -1 AND d.dc = 0  THEN b.value END) AS n,
         max(CASE WHEN d.dr = 1  AND d.dc = 1  THEN b.value END) AS se,
         max(CASE WHEN d.dr = 1  AND d.dc = -1 THEN b.value END) AS sw,
         max(CASE WHEN d.dr = -1 AND d.dc = 1  THEN b.value END) AS ne,
         max(CASE WHEN d.dr = -1 AND d.dc = -1 THEN b.value END) AS nw
  FROM v a CROSS JOIN dirs d
  JOIN v b ON b.t = a.t AND b.r = a.r + d.dr AND b.c = a.c + d.dc
  GROUP BY 1, 2, 3, 4
  HAVING count(*) = 8),
z AS (
  SELECT valid_time, r, c,
         e - w_ AS zx, s - n AS zy,
         e - 2 * vc + w_ AS zxx, s - 2 * vc + n AS zyy,
         se - sw - ne + nw AS zxy
  FROM w)
SELECT valid_time, r AS cell_row, c AS cell_col,
       2 * zxx * zy * zy - zxy * zx * zy + 2 * zyy * zx * zx AS curv_num,
       2 * (zx * zx + zy * zy) AS curv_den,
       CAST(2 * zxx * zy * zy - zxy * zx * zy + 2 * zyy * zx * zx AS DOUBLE)
         / CAST(2 * (zx * zx + zy * zy) AS DOUBLE) AS plan_curv
FROM z
WHERE zx * zx + zy * zy > 0
ORDER BY 1, 2, 3
"""


def kanon_audit(k: int = 5, cell_scale: int = 8) -> str:
    """k-anonymity twin: the same quasi-identifier tuple in closed form,
    class census via one grouped count, one exact division."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH q AS (
  SELECT CAST(floor(({lon}) * {cell_scale}) AS BIGINT) * 65536
           + CAST(floor(({lat}) * {cell_scale}) AS BIGINT) AS cell,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS d,
         event_type
  FROM events),
c AS (
  SELECT cell, d, event_type, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2, 3)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (WHERE n < {k}) AS BIGINT) AS n_violating,
       CAST(COALESCE(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT) AS rows_at_risk,
       CAST(sum(n) AS BIGINT) AS n_rows,
       min(n) AS min_class,
       CAST(CAST(COALESCE(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS risk_frac
FROM c
"""


def raster_jacobi(rounds: int = 6, qshift: int = 20, n_hours: int = 24) -> str:
    """Jacobi twin: six unrolled window-function rounds (lag/lead along
    each axis with an exact-adjacency guard — a join-free 4-neighbor
    stencil; MATERIALIZED stops DuckDB inlining each round 4x); // on
    non-negative scaled BIGINTs is the engine's floor; fixed cells pass
    the previous round's value through the ELSE branch."""
    from geoglue_ray.sources.raster import sql_raster_cte

    scale = 1 << qshift
    ctes = [
        f"""rast AS ({sql_raster_cte()}),
g0 AS MATERIALIZED (
  SELECT t, r, c, CAST(value AS BIGINT) * {scale} AS x
  FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < {n_hours})"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""g{i} AS MATERIALIZED (
  SELECT t, r, c,
         CASE WHEN nx IS NOT NULL AND sx IS NOT NULL
                   AND wx IS NOT NULL AND ex IS NOT NULL
              THEN (nx + sx + wx + ex) // 4
              ELSE x END AS x
  FROM (
    SELECT t, r, c, x,
           CASE WHEN lag(r) OVER wc = r - 1 THEN lag(x) OVER wc END AS nx,
           CASE WHEN lead(r) OVER wc = r + 1 THEN lead(x) OVER wc END AS sx,
           CASE WHEN lag(c) OVER wr = c - 1 THEN lag(x) OVER wr END AS wx,
           CASE WHEN lead(c) OVER wr = c + 1 THEN lead(x) OVER wr END AS ex
    FROM g{i - 1}
    WINDOW wc AS (PARTITION BY t, c ORDER BY r),
           wr AS (PARTITION BY t, r ORDER BY c)))"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * t AS valid_time,
       r AS cell_row, c AS cell_col,
       x AS jacobi_q,
       CAST(x AS DOUBLE) / {scale}.0 AS relaxed
FROM g{rounds}
ORDER BY 1, 2, 3
"""


def q15_top_supplier(
    date_from: str = "1996-01-01", date_to: str = "1996-07-01"
) -> str:
    """Q15-shape twin: floored per-row revenue (order-independent sum),
    max-with-ties via the scalar subquery, (s_suppkey) total order."""
    return f"""
WITH rev AS (
  SELECT l_suppkey, sum(floor(l_extendedprice * (1.0 - l_discount))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '{date_from}' AND l_shipdate < DATE '{date_to}'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def ldiv_audit(l_min: int = 3, cell_scale: int = 8) -> str:
    """l-diversity twin: the kanon quasi-identifier minus the sensitive
    attribute, per-class distinct sensitive count, one exact division."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    return f"""
WITH q AS (
  SELECT CAST(floor(({lon}) * {cell_scale}) AS BIGINT) * 65536
           + CAST(floor(({lat}) * {cell_scale}) AS BIGINT) AS cell,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS d,
         event_type
  FROM events),
c AS (
  SELECT cell, d,
         CAST(count(DISTINCT event_type) AS BIGINT) AS l,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (WHERE l < {l_min}) AS BIGINT) AS n_below,
       CAST(COALESCE(sum(n) FILTER (WHERE l < {l_min}), 0) AS BIGINT) AS rows_at_risk,
       CAST(sum(n) AS BIGINT) AS n_rows,
       min(l) AS min_l,
       CAST(CAST(COALESCE(sum(n) FILTER (WHERE l < {l_min}), 0) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS risk_frac
FROM c
"""


def fd_profile() -> str:
    """FD-profiling twin: one grouped distinct-count census per candidate
    dependency, UNION ALL, (fd) total order; one exact division each."""
    def one(lhs: str, rhs: str) -> str:
        return f"""
SELECT '{lhs}->{rhs}' AS fd,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT) AS n_violating,
       CAST(COALESCE(sum(n) FILTER (WHERE d > 1), 0) AS BIGINT) AS rows_in_violating,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(CAST(COALESCE(sum(n) FILTER (WHERE d > 1), 0) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS violation_frac
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS d, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1)"""

    bodies = [
        one("l_partkey", "l_suppkey"),
        one("l_orderkey", "l_linestatus"),
        one("l_suppkey", "l_returnflag"),
    ]
    return " UNION ALL ".join(bodies) + " ORDER BY fd"


def events_segregation(type_a: str = "click", type_b: str = "purchase") -> str:
    """Dissimilarity twin: the events_lq admin assignment restricted to
    the two types, per-admin2 counts, the cleared-denominator exact
    integer sum |a_i*B - b_i*A| and one division by (2.0 * A * B)."""
    return f"""
WITH c AS (
  SELECT event_id AS id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events
  WHERE event_type IN ('{type_a}', '{type_b}')),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c),
counts AS (
  SELECT {fx.sql_admin1_name('a2')} AS admin1_id, a2,
         CAST(count(*) FILTER (WHERE event_type = '{type_a}') AS BIGINT) AS na,
         CAST(count(*) FILTER (WHERE event_type = '{type_b}') AS BIGINT) AS nb
  FROM asg GROUP BY 1, 2),
tot AS (
  SELECT admin1_id, a2, na, nb,
         CAST(SUM(na) OVER (PARTITION BY admin1_id) AS BIGINT) AS a_tot,
         CAST(SUM(nb) OVER (PARTITION BY admin1_id) AS BIGINT) AS b_tot
  FROM counts)
SELECT admin1_id,
       CAST(min(a_tot) AS BIGINT) AS n_a,
       CAST(min(b_tot) AS BIGINT) AS n_b,
       CAST(count(*) AS BIGINT) AS n_units,
       CASE WHEN min(a_tot) > 0 AND min(b_tot) > 0
            THEN CAST(CAST(sum(abs(na * b_tot - nb * a_tot)) AS BIGINT) AS DOUBLE)
                 / (2.0 * CAST(min(a_tot) AS DOUBLE) * CAST(min(b_tot) AS DOUBLE))
            ELSE CAST('nan' AS DOUBLE) END AS dissimilarity
FROM tot GROUP BY 1 ORDER BY 1
"""


def graph_assortativity() -> str:
    """Assortativity twin: distinct directed co-purchase edges, endpoint
    degrees by join, exact BIGINT moments (sums cast back from the
    HUGEINT widening), and the engine's num / sqrt(dx * dy) chain —
    sqrt is IEEE-correctly-rounded in both engines (CLAUDE.md)."""
    return """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(ds.deg) AS BIGINT) AS sx,
         CAST(sum(dd.deg) AS BIGINT) AS sy,
         CAST(sum(ds.deg * dd.deg) AS BIGINT) AS sxy,
         CAST(sum(ds.deg * ds.deg) AS BIGINT) AS sxx,
         CAST(sum(dd.deg * dd.deg) AS BIGINT) AS syy
  FROM e JOIN deg ds ON ds.node = e.src
         JOIN deg dd ON dd.node = e.dst)
SELECT m AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                * CAST(m * syy - sy * sy AS DOUBLE)) AS assortativity
FROM m
"""


def embed_knn_purity(stride: int = 8, dim: int = 64) -> str:
    """1-NN purity twin: identical floor(x*2^20 + 0.5) quantization,
    exact integer d2 by the unnested self-join, (d2, neighbor) winner
    per sampled query, label joins."""
    OFF = 1 << 20
    return f"""
WITH q AS (
  SELECT vec_id, i.range AS j,
         CAST(floor(CAST(embedding[i.range + 1] AS DOUBLE) * {OFF}.0 + 0.5) AS BIGINT) AS v
  FROM embeddings, range({dim}) i),
d AS (
  SELECT a.vec_id AS query_id, b.vec_id AS nn,
         CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.j = b.j AND b.vec_id <> a.vec_id
  WHERE a.vec_id % {stride} = 0
  GROUP BY 1, 2),
w AS (
  SELECT query_id, nn,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, nn) AS rn
  FROM d)
SELECT w.query_id,
       CAST(la.label AS BIGINT) AS label,
       w.nn AS nn_id,
       CAST(lb.label AS BIGINT) AS nn_label,
       la.label = lb.label AS agree
FROM w
JOIN embeddings la ON la.vec_id = w.query_id
JOIN embeddings lb ON lb.vec_id = w.nn
WHERE w.rn = 1
ORDER BY w.query_id
"""


def score_auc(pos_type: str = "purchase") -> str:
    """AUC twin: identical cents quantization, per-score histogram, the
    doubled-midrank sum (window cumsum cast back from HUGEINT), one
    division."""
    return f"""
WITH v AS (
  SELECT CAST(value * 100 AS BIGINT) AS c,
         CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS pos
  FROM events),
h AS (SELECT c, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
      FROM v GROUP BY 1),
w AS (
  SELECT c, n, p,
         CAST(COALESCE(sum(n) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS k
  FROM h),
s AS (SELECT CAST(sum(p * (2 * k + n + 1)) AS BIGINT) AS sd,
             CAST(sum(p) AS BIGINT) AS np,
             CAST(sum(n) - sum(p) AS BIGINT) AS nn
      FROM w)
SELECT np AS n_pos, nn AS n_neg,
       CAST(sd - np * (np + 1) AS DOUBLE)
         / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
FROM s
"""


def hits_scores(rounds: int = 3, qscale: int = 1024) -> str:
    """HITS twin: materialized distinct bipartite edges, per round one
    grouped sum-join per side (HUGEINT sums cast back) and the exact
    offset renormalization ((w+m)*Q)//m - Q; // == floor on the
    non-negative operands."""
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
h0 AS (SELECT DISTINCT c, CAST({q} AS BIGINT) AS h FROM e)""".format(q=qscale)
    ]
    for r in range(1, rounds + 1):
        j = r - 1
        ctes.append(
            f"""aw{r} AS MATERIALIZED (
  SELECT e.p, CAST(sum(h.h) AS BIGINT) AS w
  FROM e JOIN h{j} h USING (c) GROUP BY 1),
am{r} AS (SELECT max(w) AS m FROM aw{r}),
a{r} AS (SELECT p, ((w + m) * {qscale}) // m - {qscale} AS a FROM aw{r}, am{r}),
hw{r} AS MATERIALIZED (
  SELECT e.c, CAST(sum(a.a) AS BIGINT) AS w
  FROM e JOIN a{r} a USING (p) GROUP BY 1),
hm{r} AS (SELECT max(w) AS m FROM hw{r}),
h{r} AS (SELECT c, ((w + m) * {qscale}) // m - {qscale} AS h FROM hw{r}, hm{r})"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT 'cust' AS kind, c AS node_id, h AS score_q FROM h{rounds}
UNION ALL
SELECT 'part' AS kind, p AS node_id, a AS score_q FROM a{rounds}
ORDER BY kind, node_id
"""


def q13_custdist(excl_priority: str = "1-URGENT") -> str:
    """Q13 twin: LEFT JOIN with the priority filter in the join clause so
    no-order customers survive into the zero bucket."""
    return f"""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '{excl_priority}'
  GROUP BY 1)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1 ORDER BY 1
"""


def q22_idle_rich(
    nations: tuple = (2, 7, 12, 17, 22), cutoff: str = "2000-09-01"
) -> str:
    """Q22 twin: cents via CAST(x*100 AS BIGINT) (round-to-nearest), one
    scalar average division, NOT EXISTS anti join on recent orders,
    exact int sums."""
    nlist = ", ".join(str(int(n)) for n in nations)
    return f"""
WITH cand AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(c_acctbal * 100 AS BIGINT) AS bal_cents
  FROM customer WHERE c_nationkey IN ({nlist})),
avgpos AS (
  SELECT CAST(sum(bal_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS a
  FROM cand WHERE bal_cents > 0)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM cand, avgpos
WHERE CAST(bal_cents AS DOUBLE) > avgpos.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cand.c_custkey
                    AND o.o_orderdate >= DATE '{cutoff}')
GROUP BY 1 ORDER BY 1
"""


def q2_min_cost_supplier(p_type: str = "ECONOMY", min_size: int = 20) -> str:
    """Q2 twin: unit cost is the same single IEEE division; argmin via
    row_number ordered (unit_cost, suppkey)."""
    return f"""
WITH sl AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = '{p_type}' AND p_size >= {min_size}),
r AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_cost
  FROM lineitem JOIN sl ON sl.p_partkey = l_partkey),
m AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rn
  FROM r)
SELECT m.l_partkey AS p_partkey, sl.p_name, m.unit_cost,
       m.l_suppkey AS s_suppkey, s.s_name, n.n_name
FROM m
JOIN sl ON sl.p_partkey = m.l_partkey
JOIN supplier s ON s.s_suppkey = m.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE m.rn = 1
ORDER BY 1
"""


def q16_supplier_variety(excl_brand: str = "Brand#13") -> str:
    """Q16 twin: distinct-supplier count per (brand, type, size) with the
    deterministic suppkey % 7 blacklist."""
    return f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{excl_brand}' AND l_suppkey % 7 <> 0
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q11_important_parts() -> str:
    """Q11 twin: exact cents sums; the data-relative gate is the pure
    integer comparison value * n_parts * 4 > total * 5 (HUGEINT-safe)."""
    return """
WITH v AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * 100 AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem GROUP BY 1),
t AS (SELECT sum(value_cents) AS total, count(*) AS n_parts FROM v)
SELECT l_partkey, value_cents FROM v, t
WHERE value_cents * t.n_parts * 4 > t.total * 5
ORDER BY 1
"""


def _events_day_cte(type_filter: str = "") -> str:
    """Events -> (event_type, d, a2) assignment CTE: the events_lq admin
    machinery plus the day index (ts's own 2024-01-01 epoch; midnight
    epoch makes date_diff's boundary count == floor)."""
    return f"""
WITH c AS (
  SELECT event_id AS id, event_type,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS d
  FROM events {type_filter}),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT c.*,
         CASE WHEN c.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (c.lon-cen.gx)*(c.lon-cen.gx) + (c.lat-cen.gy)*(c.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('c.lon', 'c.lat')} END AS a2
  FROM c)
"""


def kendall_admin1(type_a: str = "click", type_b: str = "purchase") -> str:
    """Kendall tau-b twin: all-pairs day self-join per admin1 for exact
    concordant/discordant counts, integer tie corrections, and the
    mirrored num / sqrt(dx * dy) chain (sqrt is correctly rounded)."""
    base = _events_day_cte(f"WHERE event_type IN ('{type_a}', '{type_b}')")
    return f"""{base},
counts AS (
  SELECT {fx.sql_admin1_name('a2')} AS admin1_id, d,
         CAST(count(*) FILTER (WHERE event_type = '{type_a}') AS BIGINT) AS na,
         CAST(count(*) FILTER (WHERE event_type = '{type_b}') AS BIGINT) AS nb
  FROM asg GROUP BY 1, 2),
pairs AS (
  SELECT p.admin1_id,
         CAST(sum(CASE WHEN (p.na < q.na AND p.nb < q.nb)
                         OR (p.na > q.na AND p.nb > q.nb) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN (p.na < q.na AND p.nb > q.nb)
                         OR (p.na > q.na AND p.nb < q.nb) THEN 1 ELSE 0 END) AS BIGINT) AS nd
  FROM counts p JOIN counts q ON p.admin1_id = q.admin1_id AND p.d < q.d
  GROUP BY 1),
nn AS (SELECT admin1_id, CAST(count(*) AS BIGINT) AS n FROM counts GROUP BY 1),
tx AS (SELECT admin1_id, CAST(sum((c*(c-1))//2) AS BIGINT) AS n1
       FROM (SELECT admin1_id, na, CAST(count(*) AS BIGINT) AS c
             FROM counts GROUP BY 1, 2) GROUP BY 1),
ty AS (SELECT admin1_id, CAST(sum((c*(c-1))//2) AS BIGINT) AS n2
       FROM (SELECT admin1_id, nb, CAST(count(*) AS BIGINT) AS c
             FROM counts GROUP BY 1, 2) GROUP BY 1)
SELECT nn.admin1_id, nn.n AS n_days,
       COALESCE(pairs.nc, 0) AS concordant,
       COALESCE(pairs.nd, 0) AS discordant,
       CASE WHEN ((nn.n*(nn.n-1))//2 - tx.n1) > 0 AND ((nn.n*(nn.n-1))//2 - ty.n2) > 0
            THEN CAST(COALESCE(pairs.nc, 0) - COALESCE(pairs.nd, 0) AS DOUBLE)
                 / sqrt(CAST((nn.n*(nn.n-1))//2 - tx.n1 AS DOUBLE)
                        * CAST((nn.n*(nn.n-1))//2 - ty.n2 AS DOUBLE))
            ELSE CAST('nan' AS DOUBLE) END AS tau_b
FROM nn
JOIN tx ON tx.admin1_id = nn.admin1_id
JOIN ty ON ty.admin1_id = nn.admin1_id
LEFT JOIN pairs ON pairs.admin1_id = nn.admin1_id
ORDER BY 1
"""


def changepoint_admin1(kmin: int = 3) -> str:
    """Changepoint twin: ordered integer prefix sums via windows (cast
    back from HUGEINT), the two SSE terms each a single division added in
    the engine's order, argmin via ORDER BY cost, k."""
    base = _events_day_cte()
    return f"""{base},
counts AS (
  SELECT {fx.sql_admin1_name('a2')} AS admin1_id, d,
         CAST(count(*) AS BIGINT) AS n
  FROM asg GROUP BY 1, 2),
w AS (
  SELECT admin1_id, d, n,
         CAST(sum(n) OVER (PARTITION BY admin1_id ORDER BY d) AS BIGINT) AS sl,
         CAST(sum(n*n) OVER (PARTITION BY admin1_id ORDER BY d) AS BIGINT) AS s2l,
         CAST(row_number() OVER (PARTITION BY admin1_id ORDER BY d) AS BIGINT) AS k,
         CAST(sum(n) OVER (PARTITION BY admin1_id) AS BIGINT) AS st,
         CAST(sum(n*n) OVER (PARTITION BY admin1_id) AS BIGINT) AS s2t,
         CAST(count(*) OVER (PARTITION BY admin1_id) AS BIGINT) AS nt
  FROM counts),
cost AS (
  SELECT admin1_id, nt, k, d,
         (CAST(s2l AS DOUBLE) - CAST(sl AS DOUBLE)*CAST(sl AS DOUBLE)/CAST(k AS DOUBLE))
         + (CAST(s2t - s2l AS DOUBLE)
            - CAST(st - sl AS DOUBLE)*CAST(st - sl AS DOUBLE)/CAST(nt - k AS DOUBLE)) AS cost
  FROM w WHERE k >= {int(kmin)} AND k <= nt - {int(kmin)}),
best AS (
  SELECT admin1_id, nt, k, d, cost,
         row_number() OVER (PARTITION BY admin1_id ORDER BY cost, k) AS rn
  FROM cost)
SELECT admin1_id, nt AS n_days, k AS split_k, d AS split_day, cost
FROM best WHERE rn = 1 ORDER BY 1
"""


def classifier_kappa(t1: int = 300, t2: int = 240) -> str:
    """Cohen's kappa twin: the 2x2 confusion counts and the ONE exact
    integer division (N*diag - rowcol) / (N*N - rowcol)."""
    return f"""
WITH r AS (
  SELECT n_chars >= {int(t1)} AS r1,
         length(replace(text, ' ', '')) >= {int(t2)} AS r2
  FROM documents),
c AS (
  SELECT CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(sum(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN NOT r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN NOT r1 AND NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM r)
SELECT n11 + n10 + n01 + n00 AS n_docs, n11, n10, n01, n00,
       CAST((n11+n10+n01+n00)*(n11+n00)
            - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE)
       / CAST((n11+n10+n01+n00)*(n11+n10+n01+n00)
            - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE) AS kappa
FROM c
"""


def bm25_term_top(
    terms: tuple = ("scan", "column", "window"), k: int = 10
) -> str:
    """BM25-lite twin (b = 1, k1 = 1): score = 2*tf*L / (tf*L + dl*N) —
    one division of exact BIGINTs; top-k total order (score DESC, doc_id)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
st AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS L,
              CAST(count(*) AS BIGINT) AS N FROM tl),
tf AS (
  SELECT doc_id, t.term,
         CAST(len(list_filter(toks, x -> x = t.term)) AS BIGINT) AS tf,
         CAST(len(toks) AS BIGINT) AS dl
  FROM tl, (VALUES {vals}) t(term)),
sc AS (
  SELECT term, doc_id, tf, dl,
         CAST(2*tf*L AS DOUBLE) / CAST(tf*L + dl*N AS DOUBLE) AS score
  FROM tf, st WHERE tf > 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rn
  FROM sc)
SELECT term, doc_id, tf, dl, score FROM r WHERE rn <= {int(k)}
ORDER BY term, doc_id
"""


def sorted_neighborhood_dupes(window: int = 3, prefix_len: int = 24) -> str:
    """SNM twin: per-lang rank window self-join; prefix equality via
    char-based substr (the corpus is ASCII; mirrors utf8_slice)."""
    return f"""
WITH r AS (
  SELECT doc_id, lang, n_chars, text,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk
  FROM documents)
SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rk - a.rk AS BIGINT) AS rank_dist,
       CAST(abs(a.n_chars - b.n_chars) AS BIGINT) AS char_diff,
       substr(a.text, 1, {int(prefix_len)}) = substr(b.text, 1, {int(prefix_len)}) AS prefix_match
FROM r a JOIN r b
  ON a.lang = b.lang AND b.rk - a.rk BETWEEN 1 AND {int(window)}
ORDER BY 1, 2, 3
"""


def target_encode(m: int = 20) -> str:
    """Target-encoding twin: cents via CAST(x*100 AS BIGINT); the
    cleared-denominator single division (S*Ntot + m*T)/(Ntot*(n+m))."""
    return f"""
WITH e AS (SELECT event_type, CAST(value * 100 AS BIGINT) AS cents FROM events),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM e GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS tt FROM g)
SELECT event_type, n, s AS sum_cents,
       CAST(s * nt + {int(m)} * tt AS DOUBLE)
       / CAST(nt * (n + {int(m)}) AS DOUBLE) AS enc_cents
FROM g, t ORDER BY 1
"""


def pr_curve(
    pos_type: str = "purchase",
    thresholds: tuple = tuple(range(0, 40000, 5000)),
) -> str:
    """PR-curve twin: one score histogram replayed as threshold tail
    sums; every metric a single division of exact BIGINTs."""
    vals = ", ".join(f"({int(t)})" for t in thresholds)
    return f"""
WITH e AS (
  SELECT CAST(value * 100 AS BIGINT) AS c,
         CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS pos
  FROM events),
tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_all FROM e),
t(th) AS (VALUES {vals}),
m AS (
  SELECT CAST(t.th AS BIGINT) AS threshold_cents,
         CAST(sum(CASE WHEN e.c >= t.th THEN e.pos ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN e.c >= t.th THEN 1 - e.pos ELSE 0 END) AS BIGINT) AS fp
  FROM t, e GROUP BY 1)
SELECT threshold_cents, tp, fp, p_all - tp AS fn,
       CASE WHEN tp + fp > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
            ELSE CAST('nan' AS DOUBLE) END AS "precision",
       CASE WHEN p_all > 0
            THEN CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE)
            ELSE CAST('nan' AS DOUBLE) END AS recall,
       CASE WHEN 2*tp + fp + (p_all - tp) > 0
            THEN CAST(2*tp AS DOUBLE) / CAST(2*tp + fp + (p_all - tp) AS DOUBLE)
            ELSE CAST('nan' AS DOUBLE) END AS f1
FROM m, tot ORDER BY 1
"""


def feature_hashing(n_buckets: int = 16) -> str:
    """Hashing-trick twin: the shared token-hash chain in HUGEINT, mod
    n_buckets, exact counts."""
    from geoglue_ray.functions.texthash import sql_token_hash

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents),
h AS (SELECT doc_id, CAST({sql_token_hash('t')} % {int(n_buckets)} AS BIGINT) AS bucket
      FROM tok)
SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM h GROUP BY 1, 2 ORDER BY 1, 2
"""


def hub_closeness(n_hubs: int = 8, max_hops: int = 3) -> str:
    """Hub-closeness twin: the bfs_parts recursive closure from the
    top-degree hubs; harmonic = n1 + n2/2 + n3/3 with the engine's exact
    left-to-right float chain."""
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY 1),
hubs AS (SELECT src, degree FROM deg ORDER BY degree DESC, src LIMIT {int(n_hubs)}),
reach(s, node, d) AS (
  SELECT src, src, 0 FROM hubs
  UNION
  SELECT r.s, e.dst, r.d + 1
  FROM reach r JOIN e ON e.src = r.node
  WHERE r.d < {int(max_hops)}),
md AS (SELECT s, node, min(d) AS d FROM reach GROUP BY 1, 2),
cnt AS (
  SELECT s AS hub,
         CAST(count(*) FILTER (WHERE d = 1) AS BIGINT) AS n1,
         CAST(count(*) FILTER (WHERE d = 2) AS BIGINT) AS n2,
         CAST(count(*) FILTER (WHERE d = 3) AS BIGINT) AS n3
  FROM md GROUP BY 1)
SELECT cnt.hub, hubs.degree, cnt.n1, cnt.n2, cnt.n3,
       CAST(cnt.n1 AS DOUBLE) + CAST(cnt.n2 AS DOUBLE)/2.0
         + CAST(cnt.n3 AS DOUBLE)/3.0 AS harmonic
FROM cnt JOIN hubs ON hubs.src = cnt.hub
ORDER BY 1
"""


def raster_voronoi(n_seeds: int = 32, seed_type: str = "purchase") -> str:
    """Voronoi twin: first-hour grid x seed argmin via row_number over
    the identical squared-distance chain, event-id tie-break."""
    from geoglue_ray.sources.raster import sql_raster_cte

    return f"""
WITH rast AS ({sql_raster_cte()}),
grid AS (SELECT lon, lat FROM rast WHERE t = 0 AND variable = 't2m'),
seeds AS (
  SELECT event_id, {fx.sql_lon('event_id')} AS sx, {fx.sql_lat('event_id')} AS sy
  FROM events WHERE event_type = '{seed_type}'
  ORDER BY event_id LIMIT {int(n_seeds)}),
d AS (
  SELECT g.lon, g.lat, s.event_id,
         (g.lon - s.sx)*(g.lon - s.sx) + (g.lat - s.sy)*(g.lat - s.sy) AS d2,
         row_number() OVER (PARTITION BY g.lon, g.lat
                            ORDER BY (g.lon - s.sx)*(g.lon - s.sx)
                                   + (g.lat - s.sy)*(g.lat - s.sy),
                                     s.event_id) AS rn
  FROM grid g, seeds s)
SELECT lon, lat, event_id AS seed_event, d2
FROM d WHERE rn = 1 ORDER BY lat, lon
"""


def calibration_bins(pos_type: str = "purchase", n_bins: int = 10) -> str:
    """Calibration twin: integer bin = (cents%1000)*n_bins//1000; the
    two per-bin single divisions."""
    return f"""
WITH e AS (
  SELECT CAST(value * 100 AS BIGINT) % 1000 AS frac,
         CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS pos
  FROM events),
g AS (
  SELECT (frac * {int(n_bins)}) // 1000 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(frac) AS BIGINT) AS s_frac
  FROM e GROUP BY 1)
SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
       CAST(s_frac AS DOUBLE) / (1000.0 * CAST(n AS DOUBLE)) AS mean_pred,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
FROM g ORDER BY 1
"""


def od_ipf(rounds: int = 4) -> str:
    """Integer-IPF twin: the od_matrix assignment CTE, inflow targets,
    and ``rounds`` unrolled row/column scalings — each a MATERIALIZED
    window-sum CTE (inlined CTEs re-evaluate exponentially; round-4
    lesson) with the exact ``(x*t)//s`` floor division."""
    base = f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat,
         event_id % {fx.OUT_MOD} = 0 AS is_outside
  FROM events),
cen AS ({fx.SQL_CENTROIDS}),
asg AS (
  SELECT e.user_id, e.event_id, e.ts,
         CASE WHEN e.is_outside
              THEN (SELECT cen.a2 FROM cen
                    ORDER BY (e.lon-cen.gx)*(e.lon-cen.gx) + (e.lat-cen.gy)*(e.lat-cen.gy), cen.a2
                    LIMIT 1)
              ELSE {fx.sql_admin2_inside('e.lon', 'e.lat')} END AS a2
  FROM e),
p AS (
  SELECT user_id,
         lag(a2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS o,
         a2 AS d
  FROM asg),
x0 AS MATERIALIZED (
  SELECT {fx.sql_admin2_name('o')} AS o, {fx.sql_admin2_name('d')} AS d,
         CAST(count(*) AS BIGINT) AS x
  FROM p WHERE o IS NOT NULL GROUP BY 1, 2),
tgt AS MATERIALIZED (
  SELECT d AS z, CAST(sum(x) AS BIGINT) AS t FROM x0 GROUP BY 1)"""
    prev = "x0"
    steps = []
    for r in range(1, int(rounds) + 1):
        x0col = "x AS x_orig," if r == 1 else "x_orig,"
        steps.append(f"""
r{r} AS MATERIALIZED (
  SELECT {prev}.o, {prev}.d, {prev}.{x0col.rstrip(',')},
         CASE WHEN rs.s > 0
              THEN ({prev}.x * COALESCE(tgt.t, 0)) // rs.s ELSE 0 END AS x
  FROM {prev}
  JOIN (SELECT o, CAST(sum(x) AS BIGINT) AS s FROM {prev} GROUP BY 1) rs
    ON rs.o = {prev}.o
  LEFT JOIN tgt ON tgt.z = {prev}.o)""")
        steps.append(f"""
c{r} AS MATERIALIZED (
  SELECT r{r}.o, r{r}.d, r{r}.x_orig,
         CASE WHEN cs.s > 0
              THEN (r{r}.x * COALESCE(tgt.t, 0)) // cs.s ELSE 0 END AS x
  FROM r{r}
  JOIN (SELECT d, CAST(sum(x) AS BIGINT) AS s FROM r{r} GROUP BY 1) cs
    ON cs.d = r{r}.d
  LEFT JOIN tgt ON tgt.z = r{r}.d)""")
        prev = f"c{r}"
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
SELECT o AS o_admin, d AS d_admin, x_orig AS n_trips, CAST(x AS BIGINT) AS balanced
FROM {prev} ORDER BY 1, 2
"""
    )


def late_events() -> str:
    """Watermark twin: running max over strictly-earlier arrivals via the
    ROWS ... 1 PRECEDING frame; lateness in exact epoch microseconds."""
    return """
WITH w AS (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN ts < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COALESCE(max(CASE WHEN ts < wm THEN epoch_us(wm) - epoch_us(ts) END), 0) AS BIGINT) AS max_late_us
FROM w GROUP BY 1 ORDER BY 1
"""


def langid_confusion() -> str:
    """Confusion-matrix twin of the lang_id heuristic: same marker
    scoring and argmax order, aggregated to (lang, pred_lang) counts."""
    from geoglue_ray.stages.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)

    def hits(lg: str) -> str:
        vals = ", ".join(f"'{m}'" for m in LANG_MARKERS[lg])
        return f"sum(CASE WHEN t IN ({vals}) THEN 1 ELSE 0 END)"

    score_cols = ", ".join(f"{hits(lg)} AS s_{lg}" for lg in langs)
    m = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{lg} = {m} THEN '{lg}'" for lg in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_tokens('lower(text)')}) AS t FROM documents),
sc AS (
  SELECT doc_id, {score_cols}, count(*) AS n_tok FROM toks GROUP BY doc_id)
SELECT d.lang, {pred} AS pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN sc ON d.doc_id = sc.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def audience_segments(seg_type: str = "purchase") -> str:
    """Segment twin: per-user weekly purchase-presence bit OR via bit_or
    of 1 << min(week, 4), then the bitmask histogram."""
    return f"""
WITH m AS (
  SELECT user_id,
         CAST(bit_or(1 << CAST(least(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) // 7, 4) AS INTEGER)) AS BIGINT) AS mask
  FROM events WHERE event_type = '{seg_type}' GROUP BY 1)
SELECT mask AS segment_mask, CAST(count(*) AS BIGINT) AS n_users
FROM m GROUP BY 1 ORDER BY 1
"""


def item_cosine_top(top_n: int = 20) -> str:
    """Item-cosine twin: distinct incidence, exact pair/degree counts,
    one division against the correctly-rounded sqrt, total-ordered
    top-k."""
    return f"""
WITH dp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
deg AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM dp GROUP BY 1),
pr AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM dp a JOIN dp b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
sc AS (
  SELECT pr.part_a, pr.part_b, pr.n_ab, da.n AS n_a, db.n AS n_b,
         CAST(pr.n_ab AS DOUBLE)
           / sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)) AS cosine
  FROM pr
  JOIN deg da ON da.p = pr.part_a
  JOIN deg db ON db.p = pr.part_b),
r AS (
  SELECT *, row_number() OVER (ORDER BY cosine DESC, part_a, part_b) AS rn
  FROM sc)
SELECT part_a, part_b, n_ab, n_a, n_b, cosine
FROM r WHERE rn <= {int(top_n)} ORDER BY part_a, part_b
"""


def kmeans_silhouette(k: int = 4, rounds: int = 2, dim: int = 64) -> str:
    """Silhouette twin: the shared Lloyd CTE chain plus one final assign
    pass; own/other distances stay exact integers so better/tied are
    pure comparisons."""
    parts = _kmeans_cte_parts(k, rounds, dim)
    parts.append(f"""
af AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM (SELECT q.vec_id, c.cluster,
               sum((q.v - c.cv) * (q.v - c.cv)) AS d2
        FROM q JOIN c{rounds} c ON c.dim = q.dim GROUP BY 1, 2)),
own AS (SELECT vec_id, cluster, d2 FROM af WHERE rn = 1),
oth AS (
  SELECT af.vec_id, min(af.d2) AS b
  FROM af JOIN own ON own.vec_id = af.vec_id AND af.cluster <> own.cluster
  GROUP BY 1)""")
    return (
        "WITH "
        + ",".join(parts)
        + """
SELECT own.cluster AS cluster_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN oth.b > own.d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_better,
       CAST(sum(CASE WHEN oth.b = own.d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
FROM own JOIN oth ON oth.vec_id = own.vec_id
GROUP BY 1 ORDER BY 1
"""
    )


def ab_cuped() -> str:
    """CUPED twin: per-user exact pre/post cents, pooled integer moments,
    theta and the adjusted-mean float chain spelled with the engine's
    operation order."""
    pre = "date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) // 7 < 2"
    return f"""
WITH pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN {pre} THEN CAST(value*100 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN {pre} THEN 0 ELSE CAST(value*100 AS BIGINT) END) AS BIGINT) AS y
  FROM events GROUP BY 1),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
         CAST(sum(x*x) AS BIGINT) AS sxx
  FROM pu),
th AS (
  SELECT CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
  FROM mo),
arm AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS sum_pre, CAST(sum(y) AS BIGINT) AS sum_post
  FROM pu GROUP BY 1)
SELECT arm, n_users, sum_pre, sum_post,
       CAST(sum_post AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
       (CAST(sum_post AS DOUBLE)
        - th.theta * (CAST(sum_pre AS DOUBLE) - CAST(n_users AS DOUBLE) * th.xbar))
       / CAST(n_users AS DOUBLE) AS mean_adj,
       th.theta AS theta
FROM arm, th ORDER BY 1
"""


def text_readability() -> str:
    """Readability twin: RE2 run counts via regexp_extract_all lengths,
    the engine's exact float chain (two single divisions, left-assoc
    subtract) with NULL for word-less docs."""
    return r"""
WITH d AS (
  SELECT doc_id,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sent,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syll
  FROM documents)
SELECT doc_id, n_sent, n_words, n_syll,
       CASE WHEN n_words > 0
            THEN 206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
                 - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
            ELSE NULL END AS flesch
FROM d ORDER BY doc_id
"""


def ks_drift() -> str:
    """KS twin: grouped (cents, side) histogram, window cumulative counts
    (cast back from HUGEINT), the engine's exact division/abs/max/sqrt
    chain, min-c argmax by float equality on identical doubles."""
    return """
WITH v AS (
  SELECT CAST(value * 100 AS BIGINT) AS c, CAST(user_id % 2 AS BIGINT) AS side
  FROM events),
h AS (
  SELECT c,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM v GROUP BY 1),
t AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM h),
cum AS (
  SELECT c,
         CAST(sum(a) OVER (ORDER BY c) AS BIGINT) AS ca,
         CAST(sum(b) OVER (ORDER BY c) AS BIGINT) AS cb
  FROM h),
d AS (
  SELECT c,
         abs(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) AS dd
  FROM cum, t),
m AS (SELECT max(dd) AS d_stat FROM d)
SELECT t.na, t.nb, m.d_stat,
       (SELECT min(c) FROM d WHERE dd = m.d_stat) AS at_cents,
       m.d_stat * sqrt(CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                       / CAST(t.na + t.nb AS DOUBLE)) AS ks_stat
FROM t, m
"""


def mad_admin1() -> str:
    """Median/MAD twin: DuckDB median of even counts == np.median
    (measured, CLAUDE.md round-4); med2/mad4 recovered as exact ints by
    doubling before the BIGINT cast, the all-integer outlier filter and
    the two power-of-two divisions mirrored from the engine."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id, CAST(value AS BIGINT) AS v FROM asg),
med AS (
  SELECT admin1_id, CAST(count(*) AS BIGINT) AS n,
         CAST(2 * median(v) AS BIGINT) AS med2
  FROM g GROUP BY 1),
dev AS (
  SELECT g.admin1_id, abs(4 * g.v - 2 * m.med2) AS dev4
  FROM g JOIN med m USING (admin1_id)),
mad AS (
  SELECT admin1_id, CAST(2 * median(dev4) AS BIGINT) AS mad4
  FROM dev GROUP BY 1),
outl AS (
  SELECT d.admin1_id,
         CAST(count(*) FILTER (2 * d.dev4 > 3 * m.mad4) AS BIGINT) AS n_outliers
  FROM dev d JOIN mad m USING (admin1_id) GROUP BY 1)
SELECT med.admin1_id, med.n AS n_obs,
       CAST(med.med2 AS DOUBLE) / 2 AS med_val,
       CAST(mad.mad4 AS DOUBLE) / 8 AS mad_val,
       outl.n_outliers
FROM med JOIN mad USING (admin1_id) JOIN outl USING (admin1_id)
ORDER BY 1
"""


def user_survival() -> str:
    """KM twin: sessionize windows, raw-microsecond floor-divided
    durations, MATERIALIZED life-table CTE (inlining lesson), and the
    ordered product replayed by a recursive CTE — one division + one
    multiply per step in the engine's exact order."""
    return """
WITH RECURSIVE e AS (SELECT user_id, ts FROM events),
s AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
ses AS MATERIALIZED (
  SELECT epoch_us(min(ts)) AS a, epoch_us(max(ts)) AS b
  FROM g GROUP BY user_id, sid),
hor AS (SELECT epoch_us(max(ts)) AS h FROM events),
d AS MATERIALIZED (
  SELECT CASE WHEN (b - a) // 60000000 < 30 THEN (b - a) // 60000000
              ELSE 30 END AS t_obs,
         CASE WHEN (b - a) // 60000000 <= 29 AND b <= h - 7200000000
              THEN 1 ELSE 0 END AS ev
  FROM ses, hor),
cnt AS MATERIALIZED (
  SELECT t_obs, CAST(count(*) AS BIGINT) AS m, CAST(sum(ev) AS BIGINT) AS dd
  FROM d GROUP BY 1),
grid AS MATERIALIZED (
  SELECT gs.t,
         COALESCE((SELECT CAST(sum(m) AS BIGINT) FROM cnt WHERE t_obs >= gs.t), 0)
           AS n_risk,
         COALESCE((SELECT dd FROM cnt WHERE t_obs = gs.t), 0) AS deaths
  FROM (SELECT unnest(range(0, 30)) AS t) gs),
km AS (
  SELECT g0.t, g0.n_risk, g0.deaths,
         CASE WHEN g0.n_risk > 0
              THEN CAST(g0.n_risk - g0.deaths AS DOUBLE) / CAST(g0.n_risk AS DOUBLE)
              ELSE 1.0 END AS s
  FROM grid g0 WHERE g0.t = 0
  UNION ALL
  SELECT g1.t, g1.n_risk, g1.deaths,
         CASE WHEN g1.n_risk > 0
              THEN km.s * (CAST(g1.n_risk - g1.deaths AS DOUBLE)
                           / CAST(g1.n_risk AS DOUBLE))
              ELSE km.s END AS s
  FROM km JOIN grid g1 ON g1.t = km.t + 1)
SELECT t, n_risk, deaths, s AS survival FROM km ORDER BY t
"""


def events_jacquez() -> str:
    """Jacquez twin: the events_knn box-join window-rank construction for
    the space side, the planted local-solar-time axis (dyadic hour from
    lon + kmv HUGEINT jitter) with an interval self-join + (|dt|, nb)
    window rank for the time side, the pair intersection by inner join,
    the engine's exact expected/ratio float chain."""
    from geoglue_ray.functions.texthash import sql_kmv_hash

    jit = f"CAST({sql_kmv_hash('event_id')} % 3600000000::HUGEINT AS BIGINT)"
    return f"""
WITH e AS (
  SELECT event_id,
         CAST(floor(({fx.sql_lon('event_id')} - 100.0) * 16.0) AS BIGINT)
           * 3600000000 + {jit} AS t,
         {fx.sql_lon('event_id')} AS lon,
         {fx.sql_lat('event_id')} AS lat
  FROM events),
sp AS (
  SELECT a.event_id, b.event_id AS nb,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.lon BETWEEN a.lon - 0.0625 AND a.lon + 0.0625
   AND b.lat BETWEEN a.lat - 0.0625 AND a.lat + 0.0625
  WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
        <= 0.0625 * 0.0625),
sk AS MATERIALIZED (
  SELECT event_id, nb FROM (
    SELECT event_id, nb,
           row_number() OVER (PARTITION BY event_id ORDER BY d2, nb) AS rn
    FROM sp) WHERE rn <= 5),
tp AS (
  SELECT a.event_id, b.event_id AS nb, abs(b.t - a.t) AS dt
  FROM e a JOIN e b
    ON b.event_id <> a.event_id
   AND b.t BETWEEN a.t - 7200000000 AND a.t + 7200000000),
tk AS MATERIALIZED (
  SELECT event_id, nb FROM (
    SELECT event_id, nb,
           row_number() OVER (PARTITION BY event_id ORDER BY dt, nb) AS rn
    FROM tp) WHERE rn <= 5),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM sk) AS ns,
         (SELECT CAST(count(*) AS BIGINT) FROM tk) AS nt,
         (SELECT CAST(count(*) AS BIGINT)
          FROM sk JOIN tk USING (event_id, nb)) AS j)
SELECT n AS n_points, ns AS n_space_pairs, nt AS n_time_pairs, j AS j_stat,
       CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
         / CAST(n * (n - 1) AS DOUBLE) AS expected,
       CAST(j AS DOUBLE)
         / (CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
            / CAST(n * (n - 1) AS DOUBLE)) AS jacquez_ratio
FROM c
"""


def welch_ab() -> str:
    """Welch twin: per-user cent totals, per-arm exact moments, the
    engine's division/sqrt chain spelled step for step (se2 terms
    factored identically so every intermediate double matches)."""
    return """
WITH pu AS (
  SELECT user_id, CAST(sum(CAST(value * 100 AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1),
a AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
  FROM pu GROUP BY 1),
m AS (
  SELECT arm, n, s,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v
  FROM a),
p AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 0 THEN mean END) AS mean0,
         max(CASE WHEN arm = 1 THEN mean END) AS mean1,
         max(CASE WHEN arm = 0 THEN v END) / max(CASE WHEN arm = 0 THEN CAST(n AS DOUBLE) END) AS se0,
         max(CASE WHEN arm = 1 THEN v END) / max(CASE WHEN arm = 1 THEN CAST(n AS DOUBLE) END) AS se1
  FROM m)
SELECT n0, n1, mean0, mean1,
       (mean0 - mean1) / sqrt(se0 + se1) AS t_stat,
       (se0 + se1) * (se0 + se1)
         / (se0 * se0 / CAST(n0 - 1 AS DOUBLE)
            + se1 * se1 / CAST(n1 - 1 AS DOUBLE)) AS df
FROM p
"""


def hoover_admin1() -> str:
    """Hoover twin: per-admin exact (n, S), the all-integer |n*v - S|
    inner sum over raw rows, the engine's single float chain."""
    a1 = fx.sql_admin1_name("a2")
    return f"""{_assigned_cte()},
g AS (SELECT {a1} AS admin1_id, CAST(value AS BIGINT) AS v FROM asg),
s AS (
  SELECT admin1_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
  FROM g GROUP BY 1),
num AS (
  SELECT g.admin1_id, CAST(sum(abs(s.n * g.v - s.sv)) AS BIGINT) AS num
  FROM g JOIN s USING (admin1_id) GROUP BY 1)
SELECT s.admin1_id, s.n AS n_obs, s.sv AS sum_val,
       CAST(num.num AS DOUBLE)
         / (2.0 * CAST(s.n AS DOUBLE) * CAST(s.sv AS DOUBLE)) AS hoover
FROM s JOIN num USING (admin1_id) ORDER BY 1
"""


def scd2_user_segments() -> str:
    """SCD2 twin: change-detection window, run ids by running sum, lead
    over sid for valid_to with the engine's -1 open-run sentinel."""
    return """
WITH s AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM s),
runs AS (
  SELECT user_id, sid, min(t) AS valid_from_us, max(event_type) AS event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM g GROUP BY 1, 2)
SELECT user_id, event_type, valid_from_us,
       COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY sid), -1)
         AS valid_to_us,
       n_events
FROM runs ORDER BY user_id, valid_from_us
"""


def raster_fill_sinks(rounds: int = 28, n_hours: int = 6) -> str:
    """Sink-filling twin: the raster_jacobi unrolled window-stencil
    construction with greatest/least instead of the averaging step;
    the kmv HUGEINT noise DEM, interior cells start at the 2^40
    sentinel, drains pass through the ELSE branch every round."""
    from geoglue_ray.functions.texthash import sql_kmv_hash
    from geoglue_ray.sources.raster import RXSIZE, sql_raster_cte

    big = 1 << 40
    zexpr = (
        f"CAST({sql_kmv_hash(f't * 4096 + r * {RXSIZE} + c')} % 1024::HUGEINT"
        " AS BIGINT)"
    )
    ctes = [
        f"""rast AS ({sql_raster_cte()}),
g0 AS MATERIALIZED (
  SELECT t, r, c, z,
         CASE WHEN nn AND ss AND ww AND ee THEN {big}::BIGINT
              ELSE z END AS w
  FROM (
    SELECT t, r, c, {zexpr} AS z,
           lag(r) OVER wc = r - 1 AS nn,
           lead(r) OVER wc = r + 1 AS ss,
           lag(c) OVER wr = c - 1 AS ww,
           lead(c) OVER wr = c + 1 AS ee
    FROM rast WHERE variable = 't2m' AND value IS NOT NULL AND t < {n_hours}
    WINDOW wc AS (PARTITION BY t, c ORDER BY r),
           wr AS (PARTITION BY t, r ORDER BY c)))"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""g{i} AS MATERIALIZED (
  SELECT t, r, c, z,
         CASE WHEN nw IS NOT NULL AND sw IS NOT NULL
                   AND ww IS NOT NULL AND ew IS NOT NULL
              THEN greatest(z, least(nw, sw, ww, ew))
              ELSE w END AS w
  FROM (
    SELECT t, r, c, z, w,
           CASE WHEN lag(r) OVER wc = r - 1 THEN lag(w) OVER wc END AS nw,
           CASE WHEN lead(r) OVER wc = r + 1 THEN lead(w) OVER wc END AS sw,
           CASE WHEN lag(c) OVER wr = c - 1 THEN lag(w) OVER wr END AS ww,
           CASE WHEN lead(c) OVER wr = c + 1 THEN lead(w) OVER wr END AS ew
    FROM g{i - 1}
    WINDOW wc AS (PARTITION BY t, c ORDER BY r),
           wr AS (PARTITION BY t, r ORDER BY c)))"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT {fx.T0_SQL} + INTERVAL 1 HOUR * t AS valid_time,
       r AS cell_row, c AS cell_col,
       z AS dem, w AS filled, w - z AS raised
FROM g{rounds}
ORDER BY 1, 2, 3
"""


def cdc_snapshot() -> str:
    """CDC twin: last-write-wins by (ts, event_id) window rank plus the
    per-user exact cent totals."""
    return """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
         CAST(value * 100 AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY t DESC, event_id DESC) AS rn
  FROM e),
agg AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1)
SELECT r.user_id, r.event_type AS last_type, r.t AS last_ts_us,
       r.event_id AS last_event_id, agg.total_cents, agg.n_events
FROM r JOIN agg USING (user_id)
WHERE r.rn = 1 ORDER BY r.user_id
"""


def doc_rarity() -> str:
    """Rarity twin: exploded tokens, strict (n DESC, token) vocabulary
    rank, per-doc doubled median (DuckDB median of even counts ==
    np.median — measured) and max rank."""
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
vc AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
vr AS MATERIALIZED (
  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk
  FROM vc)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(2 * median(v.rnk) AS BIGINT) AS med2_rank,
       CAST(2 * median(v.rnk) AS BIGINT) / 2.0 AS rarity,
       CAST(max(v.rnk) AS BIGINT) AS max_rank
FROM tok t JOIN vr v USING (tok)
GROUP BY 1 ORDER BY 1
"""


def events_2sfca() -> str:
    """2SFCA twin: the 16-site VALUES grid, in-range exact d2 counts,
    integer floor-division ratios, per-event ratio sums."""
    lon = fx.sql_lon("event_id")
    lat = fx.sql_lat("event_id")
    cap = 1 << 30
    return f"""
WITH fac AS (
  SELECT k, 102.5 + CAST(k % 4 AS DOUBLE) * 2.0 AS flon,
         9.0 + CAST(k // 4 AS DOUBLE) * 3.5 AS flat
  FROM (SELECT unnest(range(0, 16)) AS k)),
e AS MATERIALIZED (
  SELECT event_id, {lon} AS lon, {lat} AS lat FROM events),
pairs AS MATERIALIZED (
  SELECT e.event_id, f.k
  FROM e, fac f
  WHERE (e.lon - f.flon) * (e.lon - f.flon)
          + (e.lat - f.flat) * (e.lat - f.flat) <= 4.0),
dem AS MATERIALIZED (
  SELECT k, CAST(count(*) AS BIGINT) AS demand FROM pairs GROUP BY 1),
rat AS (
  SELECT k, CASE WHEN demand > 0 THEN {cap}::BIGINT // demand
                 ELSE 0 END AS ratio
  FROM dem)
SELECT e.event_id,
       CAST(COALESCE(count(p.k), 0) AS BIGINT) AS n_fac,
       CAST(COALESCE(sum(r.ratio), 0) AS BIGINT) AS access_q
FROM e
LEFT JOIN pairs p ON p.event_id = e.event_id
LEFT JOIN rat r ON r.k = p.k
GROUP BY 1 ORDER BY 1
"""


def gdpr_erasure_audit() -> str:
    """Erasure twin: predicate sets, one semi join for lineitems, exact
    counts with single-division fractions."""
    return """
WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_custkey % 97 = 0),
ct AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
o AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders WHERE o_custkey % 97 = 0),
ot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
l AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey % 97 = 0)),
lt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
e AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events WHERE user_id % 97 = 0),
et AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
SELECT c.n AS customers_erased, o.n AS orders_erased,
       l.n AS lineitems_erased, e.n AS events_erased,
       CAST(c.n AS DOUBLE) / CAST(ct.n AS DOUBLE) AS frac_customers,
       CAST(o.n AS DOUBLE) / CAST(ot.n AS DOUBLE) AS frac_orders,
       CAST(l.n AS DOUBLE) / CAST(lt.n AS DOUBLE) AS frac_lineitems,
       CAST(e.n AS DOUBLE) / CAST(et.n AS DOUBLE) AS frac_events
FROM c, ct, o, ot, l, lt, e, et
"""


def quantile_normalize() -> str:
    """Quantile-normalization twin: per-source strict window ranks, the
    ceil-division pooled position, pooled order statistic by row_number
    index join."""
    return """
WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
r AS (
  SELECT doc_id, source, v,
         CAST(row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
              AS BIGINT) AS rnk,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM d),
pool AS MATERIALIZED (
  SELECT v, CAST(row_number() OVER (ORDER BY v, doc_id) AS BIGINT) AS idx
  FROM d),
p2 AS (
  SELECT r.doc_id, r.source, r.v, (r.rnk * t.n + r.ns - 1) // r.ns AS pos
  FROM r, t)
SELECT p2.doc_id, p2.source, p2.v AS n_chars, pool.v AS normalized
FROM p2 JOIN pool ON pool.idx = p2.pos
ORDER BY 1
"""


def doc_stitch() -> str:
    """Stitch twin: two-token prefix/suffix keys by list indexing, the
    equality self-join with a != b."""
    return """
WITH k AS (
  SELECT doc_id,
         t[1] || ' ' || t[2] AS pfx,
         t[-2] || ' ' || t[-1] AS sfx
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents)
  WHERE len(t) >= 2)
SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, a.sfx AS stitch_key
FROM k a JOIN k b ON a.sfx = b.pfx AND a.doc_id <> b.doc_id
ORDER BY 1, 2
"""


def raster_trend_surface() -> str:
    """Trend-surface twin: centered integer moments, Cramer determinants
    spelled with the engine's exact product/sum order (all < 2^63), the
    three coefficient divisions and the per-cell double chain."""
    from geoglue_ray.functions.texthash import sql_kmv_hash
    from geoglue_ray.sources.raster import RXSIZE, sql_raster_cte

    noise = f"CAST({sql_kmv_hash(f'r * {RXSIZE} + c')} % 64::HUGEINT AS BIGINT)"
    return f"""
WITH rast AS ({sql_raster_cte()}),
g AS MATERIALIZED (
  SELECT r - 32 AS r, c - 16 AS c, v
  FROM (SELECT r, c, CAST(value AS BIGINT) + {noise} AS v
        FROM rast
        WHERE variable = 't2m' AND value IS NOT NULL AND t = 0)),
m AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS sr, CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(r * r) AS BIGINT) AS srr, CAST(sum(r * c) AS BIGINT) AS src,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(r * v) AS BIGINT) AS srv, CAST(sum(c * v) AS BIGINT) AS scv
  FROM g),
d AS (
  SELECT n * (srr * scc - src * src) - sr * (sr * scc - src * sc)
           + sc * (sr * src - srr * sc) AS det,
         sv * (srr * scc - src * src) - sr * (srv * scc - src * scv)
           + sc * (srv * src - srr * scv) AS det_a,
         n * (srv * scc - src * scv) - sv * (sr * scc - src * sc)
           + sc * (sr * scv - srv * sc) AS det_b,
         n * (srr * scv - srv * src) - sr * (sr * scv - srv * sc)
           + sv * (sr * src - srr * sc) AS det_c
  FROM m),
co AS (
  SELECT CAST(det_a AS DOUBLE) / CAST(det AS DOUBLE) AS a,
         CAST(det_b AS DOUBLE) / CAST(det AS DOUBLE) AS b,
         CAST(det_c AS DOUBLE) / CAST(det AS DOUBLE) AS c2
  FROM d)
SELECT cell_row, cell_col, v, fitted,
       CAST(v AS DOUBLE) - fitted AS residual
FROM (
  SELECT g.r + 32 AS cell_row, g.c + 16 AS cell_col, g.v,
         co.a + co.b * CAST(g.r AS DOUBLE) + co.c2 * CAST(g.c AS DOUBLE) AS fitted
  FROM g, co)
ORDER BY 1, 2
"""


def events_forecast_mase(season: int = 24, train_hours: int = 48) -> str:
    """MASE twin: dense zero-filled hour series via range LEFT JOIN, the
    lag-24 forecast and lag-1 train differences by window lag, the
    engine's single cleared division."""
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
           // 3600000000 AS h
  FROM events),
hmax AS (SELECT CAST(max(h) AS BIGINT) + 1 AS n FROM e),
c AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
dense AS MATERIALIZED (
  SELECT gs.h, COALESCE(c.cnt, 0) AS y
  FROM (SELECT unnest(range(0, (SELECT n FROM hmax))) AS h) gs
  LEFT JOIN c USING (h)),
lagd AS (
  SELECT h, y,
         lag(y, 1) OVER (ORDER BY h) AS y1,
         lag(y, {season}) OVER (ORDER BY h) AS ys
  FROM dense),
agg AS (
  SELECT CAST(sum(abs(y - y1)) FILTER (WHERE h < {train_hours} AND h >= 1)
              AS BIGINT) AS denom,
         CAST(sum(abs(y - ys)) FILTER (WHERE h >= {train_hours})
              AS BIGINT) AS err
  FROM lagd)
SELECT hmax.n AS n_hours,
       hmax.n - {train_hours} AS n_test,
       agg.denom AS train_denom,
       agg.err AS test_err,
       CAST(agg.err * {train_hours - 1} AS DOUBLE)
         / CAST(agg.denom * (hmax.n - {train_hours}) AS DOUBLE) AS mase
FROM agg, hmax
"""


def events_bursts() -> str:
    """Burst twin: dense series, doubled-median threshold, window
    gaps-and-islands runs."""
    return """
WITH e AS (
  SELECT (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
           // 3600000000 AS h
  FROM events),
hmax AS (SELECT CAST(max(h) AS BIGINT) + 1 AS n FROM e),
c AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
dense AS MATERIALIZED (
  SELECT gs.h, COALESCE(c.cnt, 0) AS y
  FROM (SELECT unnest(range(0, (SELECT n FROM hmax))) AS h) gs
  LEFT JOIN c USING (h)),
m AS (SELECT CAST(2 * median(y) AS BIGINT) AS med2 FROM dense),
hot AS (SELECT h, y FROM dense, m WHERE y >= m.med2),
brk AS (
  SELECT h, y,
         CASE WHEN h - 1 = lag(h) OVER (ORDER BY h) THEN 0 ELSE 1 END AS b
  FROM hot),
runs AS (
  SELECT h, y,
         CAST(sum(b) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rid
  FROM brk)
SELECT CAST(min(h) AS BIGINT) AS start_h,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(max(y) AS BIGINT) AS peak,
       CAST(sum(y) AS BIGINT) AS total,
       (SELECT med2 FROM m) AS med2
FROM runs GROUP BY rid ORDER BY 1
"""
