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
