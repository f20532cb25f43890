"""DuckDB oracle SQL twins for :mod:`datapump_spark.queries`.

Each string is ANSI-ish SQL runnable by DuckDB with the testdata tables
pre-registered as views. Column aliases match the Spark queries exactly
(the driver sorts columns by name before value-hashing). Float policy
mirrors queries.py: decimal-exact sums, round(…,6) statistics.
"""

from __future__ import annotations

from datapump_spark.queries import IOT_GLOB
from datapump_spark.sources.csv_ingest import DUCKDB_DATE_FORMATS


def _dd_ts(col: str) -> str:
    tries = ", ".join(f"try_strptime({col}, '{f}')" for f in DUCKDB_DATE_FORMATS)
    return f"coalesce({tries})"


_IOT_CLEAN = f"""
  SELECT nullif(ltrim("DateTime"), '') AS dt,
         nullif(ltrim("Sensor_id"), '') AS "Sensor_id",
         nullif(ltrim("PM25"), '') AS "PM25",
         nullif(ltrim("PM10"), '') AS "PM10",
         nullif(ltrim("AQI"), '') AS "AQI",
         nullif(ltrim("LAT"), '') AS "LAT",
         nullif(ltrim("LONG"), '') AS "LONG",
         nullif(ltrim("Remarks"), '') AS "Remarks"
  FROM read_csv('{IOT_GLOB}', header=true, all_varchar=true)
"""

_DEC_SUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def _dec_sum(expr: str, alias: str) -> str:
    return _DEC_SUM.format(expr=expr) + f" AS {alias}"


ORACLES: dict[str, str] = {}

ORACLES["q_csv_scan"] = f"""
WITH clean AS ({_IOT_CLEAN})
SELECT {_dd_ts('dt')} AS "DateTime",
       "Sensor_id",
       CAST("PM25" AS DOUBLE) AS "PM25",
       CAST("PM10" AS DOUBLE) AS "PM10",
       CAST("AQI" AS BIGINT) AS "AQI",
       CAST("LAT" AS DOUBLE) AS "LAT",
       CAST("LONG" AS DOUBLE) AS "LONG",
       "Remarks"
FROM clean
"""

ORACLES["q_multiformat_ts"] = f"""
WITH clean AS ({_IOT_CLEAN})
SELECT dt AS raw_ts, {_dd_ts('dt')} AS parsed_ts FROM clean
"""

ORACLES["q_type_infer"] = """
SELECT * FROM (VALUES
  ('DateTime', 'timestamp'),
  ('Sensor_id', 'text'),
  ('PM25', 'float'),
  ('PM10', 'float'),
  ('AQI', 'int'),
  ('LAT', 'float'),
  ('LONG', 'float'),
  ('Remarks', 'text')
) AS t(col_name, ckan_type)
"""

ORACLES["q_drop_columns"] = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""

ORACLES["q_dupe_count"] = """
SELECT CAST((SELECT count(*) FROM events)
     - (SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM events))
     AS BIGINT) AS dupe_count
"""

_DEDUPE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT e.*, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY event_id {dir}) AS rn
  FROM events e
) WHERE rn = 1
"""
ORACLES["q_dedupe_first"] = _DEDUPE.format(dir="ASC")
ORACLES["q_dedupe_last"] = _DEDUPE.format(dir="DESC")

ORACLES["q_resample_hourly"] = """
SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

ORACLES["q_resample_daily"] = """
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_ts,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

ORACLES["q_resample_15min"] = """
SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS bucket_ts,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

ORACLES["q_describe_numeric"] = """
SELECT 'value' AS "column", s.stat, round(s.v, 6) AS value FROM (
            SELECT 'count' AS stat, CAST(count(value) AS DOUBLE) AS v FROM events
  UNION ALL SELECT 'mean', avg(value) FROM events
  UNION ALL SELECT 'std', stddev_samp(value) FROM events
  UNION ALL SELECT 'min', CAST(min(value) AS DOUBLE) FROM events
  UNION ALL SELECT '25%', quantile_cont(value, 0.25) FROM events
  UNION ALL SELECT '50%', quantile_cont(value, 0.5) FROM events
  UNION ALL SELECT '75%', quantile_cont(value, 0.75) FROM events
  UNION ALL SELECT 'max', CAST(max(value) AS DOUBLE) FROM events
) s
"""

ORACLES["q_describe_string"] = """
WITH counts AS (
  SELECT event_type AS v, count(*) AS cnt FROM events
  WHERE event_type IS NOT NULL GROUP BY 1
)
SELECT 'event_type' AS "column", s.stat, s.value FROM (
            SELECT 'count' AS stat, CAST(sum(cnt) AS VARCHAR) AS value FROM counts
  UNION ALL SELECT 'unique', CAST(count(*) AS VARCHAR) FROM counts
  UNION ALL SELECT 'top', (SELECT v FROM counts ORDER BY cnt DESC, v ASC LIMIT 1)
  UNION ALL SELECT 'freq', CAST(max(cnt) AS VARCHAR) FROM counts
) s
"""

ORACLES["q_mode"] = """
WITH c1 AS (SELECT event_type AS v, count(*) AS cnt FROM events
            WHERE event_type IS NOT NULL GROUP BY 1),
r1 AS (SELECT CAST(row_number() OVER (ORDER BY v ASC) - 1 AS BIGINT) AS stat,
              v AS event_type
       FROM c1 WHERE cnt = (SELECT max(cnt) FROM c1)),
c2 AS (SELECT user_id AS v, count(*) AS cnt FROM events
       WHERE user_id IS NOT NULL GROUP BY 1),
r2 AS (SELECT CAST(row_number() OVER (ORDER BY v ASC) - 1 AS BIGINT) AS stat,
              v AS user_id
       FROM c2 WHERE cnt = (SELECT max(cnt) FROM c2))
SELECT stat, event_type, user_id FROM r1 FULL JOIN r2 USING (stat)
"""

ORACLES["q_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dec_sum('l_quantity', 'sum_qty')},
       {_dec_sum('l_extendedprice', 'sum_base_price')},
       {_dec_sum('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q_star_revenue"] = f"""
SELECT r_name, n_name,
       {_dec_sum('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

ORACLES["q_top_customers"] = f"""
SELECT c_custkey, c_name,
       {_dec_sum('o_totalprice', 'revenue')},
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""

ORACLES["q_json_extract"] = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""
