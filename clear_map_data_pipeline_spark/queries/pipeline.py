"""End-to-end pipeline queries: the ENTIRE reference ``parse()`` DAG
(clean -> 4-case reconcile -> censored rebase -> dim join -> stats ->
window export), hash-checked against a DuckDB CTE chain that mirrors
every stage.  One registered query per export window.
"""

from __future__ import annotations

from ..plans import clearmap
from ..registry import register
from ..session import Tables

_PREFIX_CTES = f"""
users AS (SELECT DISTINCT user_id AS u FROM events),
daily AS (
  SELECT user_id AS u, CAST(ts AS DATE) AS d,
         sum(value) AS raw,
         coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0.0) AS vraw,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS nc,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS nv,
         count(*) AS nt
  FROM events GROUP BY 1, 2
),
dirty AS (
  SELECT
    CAST(CASE WHEN u % 4 = 0 THEN 1001 + 4 * u
              WHEN u % 4 = 1 THEN 1002 + 4 * (u // 8)
              WHEN u % 4 = 2 THEN 1003 + 4 * u
              ELSE CASE WHEN u % 8 = 3 THEN NULL ELSE 0 END END AS VARCHAR) AS city,
    CAST(CASE WHEN u % 4 = 0 THEN 1 + u % 3
              WHEN u % 4 = 1 THEN CASE WHEN (u // 4) % 2 = 0 THEN 0 ELSE 1 + u % 3 END
              WHEN u % 4 = 2 THEN 0
              ELSE NULL END AS VARCHAR) AS area,
    CAST(d AS VARCHAR) AS date,
    CASE WHEN raw < {clearmap.CENSOR} THEN '<15'
         ELSE CAST(CAST(round(raw) AS BIGINT) AS VARCHAR) END AS cases,
    CASE WHEN nc = 1 THEN 'TRUE' ELSE 'FALSE' END AS new_case,
    CASE WHEN nt < 3 THEN '<15' ELSE CAST(nt AS VARCHAR) END AS tests,
    CASE WHEN vraw < {clearmap.CENSOR} THEN '<15'
         ELSE CAST(CAST(round(vraw) AS BIGINT) AS VARCHAR) END AS vaccine,
    CASE WHEN nv = 1 THEN 'TRUE' ELSE 'FALSE' END AS new_vaccine
  FROM daily
),
clean AS (
  SELECT coalesce(CAST(city AS BIGINT), 0) AS city,
         coalesce(CAST(area AS BIGINT), 0) AS area,
         CAST(date AS DATE) AS date,
         CAST(CASE WHEN cases = '<15' THEN '0' ELSE cases END AS BIGINT) AS cases,
         CAST(CASE WHEN new_case = 'TRUE' THEN 1 WHEN new_case = 'FALSE' THEN 0 END AS BIGINT) AS new_case,
         CAST(CASE WHEN tests = '<15' THEN '0' ELSE tests END AS DOUBLE) AS tests,
         CAST(CASE WHEN vaccine = '<15' THEN '0' ELSE vaccine END AS DOUBLE) AS vaccine,
         CAST(CASE WHEN new_vaccine = 'TRUE' THEN 1 WHEN new_vaccine = 'FALSE' THEN 0 END AS BIGINT) AS new_vaccine
  FROM dirty
  WHERE NOT (coalesce(CAST(city AS BIGINT), 0) = 0
             AND coalesce(CAST(area AS BIGINT), 0) = 0)
),
cleanid AS (SELECT *, city * 10000 + area AS id FROM clean),
shape0 AS (
  SELECT 1001 + 4 * u AS city, 1 + u % 3 AS area FROM users WHERE u % 4 = 0
  UNION ALL
  SELECT 1002 + 4 * (u // 8), 1 + u % 3 FROM users WHERE u % 4 = 1 AND (u // 4) % 2 = 1
  UNION ALL
  SELECT 1003 + 4 * u, 1 FROM users WHERE u % 4 = 2 AND (u // 4) % 2 = 0
  UNION ALL
  SELECT 1003 + 4 * u, a FROM users, (SELECT unnest([1, 2]) AS a)
  WHERE u % 4 = 2 AND (u // 4) % 2 = 1
  UNION ALL
  SELECT 9000 + 4 * u, 1 FROM users WHERE u % 10 = 0
),
shape AS (
  SELECT CAST(city AS BIGINT) AS city, CAST(area AS BIGINT) AS area,
         CASE WHEN (city + area) % 17 = 0 THEN NULL
              ELSE city * 10000 + area END AS id,
         'city_' || city AS name,
         'area_' || city || '_' || area AS areas_name,
         CAST(100 + (city * 7 + area * 13) % 900 AS DOUBLE) AS pop,
         CASE WHEN (city + area) % 10 = 0 THEN NULL
              ELSE CAST((city + area) % 10 AS DOUBLE) END AS rank
  FROM shape0
),
dflags AS (
  SELECT city,
         sum(CASE WHEN area = 0 THEN 1 ELSE 0 END) AS n_area0,
         sum(CASE WHEN area <> 0 THEN 1 ELSE 0 END) AS n_other
  FROM cleanid GROUP BY city
),
sflags AS (SELECT city, count(DISTINCT area) AS n_shape_areas FROM shape GROUP BY city),
flags AS (
  SELECT d.city,
         CASE WHEN d.n_area0 = 0 THEN 1
              WHEN d.n_other > 0 THEN 2
              WHEN coalesce(s.n_shape_areas, 0) > 1 THEN 3
              ELSE 4 END AS cs
  FROM dflags d LEFT JOIN sflags s USING (city)
),
recdata AS (
  SELECT c.date, c.cases, c.new_case, c.tests, c.vaccine, c.new_vaccine,
         CASE WHEN f.cs IN (3, 4) THEN c.city * 10000 + 1 ELSE c.id END AS id
  FROM cleanid c LEFT JOIN flags f USING (city)
  WHERE NOT (f.cs = 2 AND c.area = 0)
),
recshape AS (
  SELECT s.city, s.area, s.id, s.name, s.areas_name, s.pop, s.rank
  FROM shape s LEFT JOIN flags f USING (city) WHERE coalesce(f.cs, 1) <> 3
  UNION ALL
  SELECT s.city, CAST(1 AS BIGINT), s.city * 10000 + 1,
         min(s.name), min(s.name), sum(s.pop), median(s.rank)
  FROM shape s JOIN flags f USING (city) WHERE f.cs = 3 GROUP BY s.city
),
recshape2 AS (SELECT * FROM recshape WHERE id IS NOT NULL),
rebased AS (
  SELECT id, date, tests,
         CAST(cases + CASE WHEN sum(cases) OVER w = 0
                           THEN sum(new_case) OVER w ELSE 0 END AS BIGINT) AS cases,
         CAST(vaccine + CASE WHEN sum(vaccine) OVER w = 0
                             THEN sum(new_vaccine) OVER w ELSE 0 END AS DOUBLE) AS vaccine
  FROM recdata
  WINDOW w AS (PARTITION BY id ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
joined AS (
  SELECT r.id, r.date, r.cases, r.tests, r.vaccine, s.areas_name, s.pop, s.rank
  FROM rebased r JOIN recshape2 s USING (id)
),
lasts AS (
  SELECT id, arg_max(cases, date) AS last_cases,
         arg_max(vaccine, date) AS last_vax,
         arg_max(pop, date) AS last_pop
  FROM joined GROUP BY id
),
statsf AS (
  SELECT j.*, round(l.last_cases / l.last_pop * 100) AS percent,
         least(round(l.last_vax / l.last_pop * 100), 100.0) AS p_vaccine
  FROM joined j JOIN lasts l USING (id)
)"""

_SUFFIX = """
reb2 AS (
  SELECT w.*, f.c0, f.t0
  FROM win w JOIN (SELECT id, arg_min(cases, date) AS c0,
                          arg_min(tests, date) AS t0
                   FROM win GROUP BY id) f USING (id)
),
final AS (
  SELECT id, date, cases - c0 AS cases, tests - t0 AS tests,
         areas_name, pop, rank, percent, p_vaccine
  FROM reb2
),
withdelta AS (
  SELECT *, CAST(coalesce(cases - lag(cases) OVER (PARTITION BY id ORDER BY date),
                          cases) AS BIGINT) AS delta
  FROM final
)
SELECT date, CAST(cases AS BIGINT) AS num_cases, tests, id,
       rank AS socio_economic_rank, areas_name AS area_name,
       percent, p_vaccine, delta,
       CAST(round(cases / pop * 100000) AS BIGINT) AS normalized
FROM withdelta
"""


def _window_sql(window: str) -> str:
    days = clearmap.WINDOWS[window]
    if days is None:
        win = """
win AS (
  SELECT id, date, cases, tests, vaccine, areas_name, pop, rank, percent, p_vaccine
  FROM (SELECT s.*, row_number() OVER (PARTITION BY id ORDER BY date DESC) AS rn
        FROM statsf s)
  WHERE (rn - 1) % 7 = 0
)"""
    else:
        win = f"""
win AS (
  SELECT * FROM statsf
  WHERE date >= (SELECT max(date) FROM statsf) - {days}
)"""
    return f"WITH {_PREFIX_CTES},{win},{_SUFFIX}"


def _make(window: str):
    def builder(spark, sf_dir):
        t = Tables(spark, sf_dir)
        return clearmap.window_export(t, window)

    builder.__name__ = f"pipeline_export_{window}"
    builder.__doc__ = (
        f"Full reference pipeline (il_analysis_git.py:33-175), window "
        f"'{window}': clean -> reconcile -> rebase -> join -> stats -> "
        f"export frame.  Every stage oracle-mirrored."
    )
    return builder


for _w in clearmap.WINDOWS:
    register(f"pipeline_export_{_w}", sql=_window_sql(_w))(_make(_w))
